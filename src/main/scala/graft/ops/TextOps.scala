package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text analysis for LLM-training-data pipelines (north-star mandate,
  * BASELINE.json): tokenization, quality scoring, language stats, document
  * fingerprinting, heuristic language-ID. Everything here is built from
  * codegen'd built-ins + higher-order array functions — no UDFs — so at
  * 100 TB each query is a single scan + (at most) one group-by shuffle.
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame

  private val StopWords = Seq("the", "a", "of", "and", "to")

  def tokens(text: Column): Column = split(text, " ")

  /** Exact deduplication: hash-groupBy on content. At 100 TB, group on
    * md5(text) (or a 128-bit xxhash) instead of the raw text to shrink the
    * shuffle payload — here text is the group key so the oracle can express
    * the same query. */
  val dedupExact: Q = (s, d) =>
    Tables(s, d, "documents")
      .groupBy("text")
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_cnt"))
      .select("doc_id", "text", "dup_cnt")
      .orderBy("doc_id")

  /** Token counting: whitespace tokens + a BPE-ish regex token count. */
  val textStats: Q = (s, d) =>
    Tables(s, d, "documents")
      .select(
        col("doc_id"),
        size(tokens(col("text"))).as("tokens"),
        size(regexp_extract_all(col("text"), lit("\\w+|[^\\w\\s]"), lit(0))).as("bpe_tokens"),
        col("n_chars"),
        (col("n_chars").cast("double") / size(tokens(col("text")))).as("chars_per_token"))
      .orderBy("doc_id")

  /** Quality scoring: stopword ratio + lexical diversity (distinct-token
    * ratio). Low-diversity / stopword-heavy docs are the classic filter
    * targets in a pretraining pipeline. */
  val textQuality: Q = (s, d) => {
    val toks = tokens(col("text"))
    val stops = filter(toks, t => t.isin(StopWords: _*))
    Tables(s, d, "documents")
      .select(
        col("doc_id"),
        size(toks).as("tokens"),
        size(stops).as("stop_cnt"),
        (size(stops).cast("double") / size(toks)).as("stop_ratio"),
        (size(array_distinct(toks)).cast("double") / size(toks)).as("distinct_ratio"))
      .orderBy("doc_id")
  }

  /** Per-language corpus stats. */
  val langStats: Q = (s, d) =>
    Tables(s, d, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("total_chars"))
      .orderBy("lang")

  /** Content fingerprint (md5) — the join key for cross-corpus exact dedup. */
  val fingerprint: Q = (s, d) =>
    Tables(s, d, "documents")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
      .orderBy("doc_id")

  /** Winnowing-style document fingerprints: rolling word-3-gram hashes,
    * 0-mod-p sampled — two documents sharing content share fingerprints, so
    * a join on (fp) finds copied passages across a 100 TB corpus with a
    * shuffle proportional to the sampled fingerprint count (~1/8 of
    * shingles), not the text. (Schleimer et al., "Winnowing: Local
    * Algorithms for Document Fingerprinting" — the mod-p sampling variant.)
    * Hashes with [[Dedup.portableHash]] so the whole pipeline is
    * DuckDB-oracle-checked. */
  val winnowFingerprints: Q = (s, d) =>
    Tables(s, d, "documents")
      .select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("sh"))
      .select(col("doc_id"), Dedup.portableHash(col("sh")).as("h"))
      .filter(pmod(col("h"), lit(8)) === 0)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fps"),
        min(col("h")).as("min_fp"), max(col("h")).as("max_fp"))
      .orderBy("doc_id")

  /** Heuristic language-ID: CJK char-class detection + per-language stopword
    * voting. Pure Column expression (codegen'd); accuracy is asserted on real
    * multilingual sentences in LangIdSpec, and the full decision function is
    * mirrored in the DuckDB oracle (same stopword sets, same vote ordering). */
  def detectLang(text: Column): Column = {
    val toks = transform(tokens(lower(text)), t => t)
    def hits(words: Seq[String]): Column =
      size(filter(toks, t => t.isin(words: _*)))
    val en = hits(Seq("the", "and", "of", "is", "a", "to", "in"))
    val es = hits(Seq("el", "la", "los", "las", "que", "de", "y", "es"))
    val fr = hits(Seq("le", "les", "des", "est", "et", "une", "dans"))
    val de = hits(Seq("der", "die", "das", "und", "ist", "nicht", "ein"))
    when(text.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(es > en && es >= fr && es >= de, "es")
      .when(fr > en && fr >= de, "fr")
      .when(de > en, "de")
      .otherwise("en")
  }

  val langId: Q = (s, d) =>
    Tables(s, d, "documents")
      .select(col("doc_id"), col("lang"), detectLang(col("text")).as("predicted_lang"))
      .orderBy("doc_id")

  /** Corpus word count (explode → group → top-k): the canonical shuffle
    * benchmark; map-side partial counts mean the shuffle carries one row per
    * (task, token), not per occurrence. */
  val wordcount: Q = (s, d) =>
    Tables(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(20)

  /** Quality scoring batch 2: punctuation ratio, uppercase ratio, mean word
    * length — the length/punct side of the classic pretraining quality
    * filters (ASCII character classes so Spark's Java regex and the oracle's
    * RE2 agree exactly). Pure per-row arithmetic → bit-exact vs the oracle. */
  val punctQuality: Q = (s, d) =>
    Tables(s, d, "documents")
      .select(
        col("doc_id"),
        (length(regexp_replace(col("text"), "[^!-/:-@\\[-`{-~]", "")).cast("double")
          / length(col("text"))).as("punct_ratio"),
        (length(regexp_replace(col("text"), "[^A-Z]", "")).cast("double")
          / length(col("text"))).as("upper_ratio"),
        (length(regexp_replace(col("text"), " ", "")).cast("double")
          / size(tokens(col("text")))).as("mean_word_len"))
      .orderBy("doc_id")

  /** Per-document n-gram familiarity score: the average corpus frequency of
    * a document's word bigrams. Documents full of rare bigrams are the
    * noisy/outlier candidates a pretraining quality filter flags — the
    * count-based cousin of an LM perplexity score, kept integer-exact
    * (sum of counts / count) so it is bit-stable across engines. The corpus
    * frequency is a window count over the bigram key — ONE shuffle on bg and
    * no self-join (a freq-table join would recompute the exploded-bigram
    * subtree for the probe side and shuffle it twice: measured 5.2s vs ~1s
    * at sf0.1). */
  val bigramQuality: Q = (s, d) => {
    val bigrams = Tables(s, d, "documents")
      .select(col("doc_id"), Dedup.shingles(col("text"), n = 2).as("bgs"))
      .select(col("doc_id"), explode(col("bgs")).as("bg"))
    bigrams
      .withColumn("cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("bg")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("cnt")).cast("double") / count(lit(1))).as("avg_bigram_freq"))
      .orderBy("doc_id")
  }

  /** Reproducible systematic sampling: a 10% corpus sample selected by hash
    * range, not `rand()` — the same rows come back on every run, on every
    * engine, at any parallelism. At 100 TB this is THE way to cut
    * dev/eval corpora: no shuffle, no state, composes with pushdown. */
  val sample: Q = (s, d) =>
    Tables(s, d, "documents")
      .filter(pmod(Dedup.portableHash(col("doc_id").cast("string")), lit(100L)) < 10)
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")

  /** Hash-based train/val/test split (80/10/10): assignment is a pure
    * function of the stable document id, so it never changes as the corpus
    * grows or repartitions — the reproducibility property a training
    * pipeline needs from its split step. */
  val trainSplit: Q = (s, d) => {
    val h = pmod(Dedup.portableHash(col("doc_id").cast("string")), lit(100L))
    Tables(s, d, "documents")
      .withColumn("split", when(h < 80, "train").when(h < 90, "val").otherwise("test"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("total_chars"))
      .orderBy("split", "lang")
  }

  val queries: Map[String, Q] = Map(
    "q_bigram_q" -> bigramQuality,
    "q_sample" -> sample,
    "q_split" -> trainSplit,
    "q_punct" -> punctQuality,
    "q_wordcount" -> wordcount,
    "q_dedup_exact" -> dedupExact,
    "q_text_stats" -> textStats,
    "q_text_quality" -> textQuality,
    "q_lang_stats" -> langStats,
    "q_fingerprint" -> fingerprint,
    "q_winnow_fps" -> winnowFingerprints,
    "q_langid" -> langId,
  )

  val oracle: Map[String, String] = Map(
    "q_bigram_q" ->
      s"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks, text FROM documents), bg AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2 THEN list_transform(range(0, len(toks) - 1), i -> concat_ws(' ', toks[i+1], toks[i+2])) ELSE [text] END) AS bg FROM t), freq AS MATERIALIZED (SELECT bg, count(*) AS cnt FROM bg GROUP BY bg) SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, CAST(sum(cnt) AS DOUBLE) / count(*) AS avg_bigram_freq FROM bg JOIN freq USING (bg) GROUP BY doc_id ORDER BY doc_id""",
    "q_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 10 ORDER BY doc_id""",
    "q_split" ->
      """SELECT CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split, lang, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(n_chars) AS BIGINT) AS total_chars FROM (SELECT lang, n_chars, ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS h FROM documents) t GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_winnow_fps" ->
      s"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks, text FROM documents), sh AS (SELECT doc_id, unnest(${Dedup.ShinglesSql}) AS sh FROM t), h AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h FROM sh) SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps, min(h) AS min_fp, max(h) AS max_fp FROM h WHERE h % 8 = 0 GROUP BY doc_id ORDER BY doc_id""",
    "q_punct" ->
      """SELECT doc_id, CAST(length(regexp_replace(text, '[^!-/:-@[-`{-~]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio, CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE) / length(text) AS upper_ratio, CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(str_split(text, ' ')) AS mean_word_len FROM documents ORDER BY doc_id""",
    "q_wordcount" ->
      """SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM (SELECT unnest(str_split(text, ' ')) AS tok FROM documents) t GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20""",
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, text, CAST(count(*) AS BIGINT) AS dup_cnt FROM documents GROUP BY text ORDER BY doc_id""",
    "q_text_stats" ->
      """SELECT doc_id, CAST(len(str_split(text, ' ')) AS INTEGER) AS tokens, CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS INTEGER) AS bpe_tokens, n_chars, CAST(n_chars AS DOUBLE) / len(str_split(text, ' ')) AS chars_per_token FROM documents ORDER BY doc_id""",
    "q_text_quality" ->
      """SELECT doc_id, CAST(len(str_split(text, ' ')) AS INTEGER) AS tokens, CAST(len(list_filter(str_split(text, ' '), t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS INTEGER) AS stop_cnt, CAST(len(list_filter(str_split(text, ' '), t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE) / len(str_split(text, ' ')) AS stop_ratio, CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE) / len(str_split(text, ' ')) AS distinct_ratio FROM documents ORDER BY doc_id""",
    "q_lang_stats" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(n_chars) AS BIGINT) AS total_chars FROM documents GROUP BY lang ORDER BY lang""",
    "q_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id""",
    "q_langid" ->
      """WITH t AS (SELECT doc_id, lang, text, str_split(lower(text), ' ') AS toks FROM documents), v AS (SELECT doc_id, lang, text, len(list_filter(toks, x -> x IN ('the','and','of','is','a','to','in'))) AS en, len(list_filter(toks, x -> x IN ('el','la','los','las','que','de','y','es'))) AS es, len(list_filter(toks, x -> x IN ('le','les','des','est','et','une','dans'))) AS fr, len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein'))) AS de FROM t) SELECT doc_id, lang, CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh' WHEN es > en AND es >= fr AND es >= de THEN 'es' WHEN fr > en AND fr >= de THEN 'fr' WHEN de > en THEN 'de' ELSE 'en' END AS predicted_lang FROM v ORDER BY doc_id""",
  )
}
