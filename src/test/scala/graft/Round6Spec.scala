package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the round-6 additions: incremental dedup, the IVF
  * k-means training step, the CSV source round-trip, the bounded top-k
  * Aggregator rewrite, and the q_quality_filter fixture invariant. The
  * DuckDB oracle proves cross-engine equality; these prove the SEMANTICS
  * are the intended ones on the small fixture. */
class Round6Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q_dedup_incremental: survivors + canonical set partition the corpus content") {
    // The incremental run must lose nothing and duplicate nothing: the
    // canonical (existing-corpus) fingerprints and the batch survivors are
    // disjoint, and their union is exactly the full-corpus distinct content
    // that one-shot q_dedup_exact sees.
    val fps = Tables(spark, sf, "documents")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"),
        pmod(ops.Dedup.portableHash(col("doc_id").cast("string")), lit(2L)).as("b"))
    val canon = fps.filter(col("b") === 0).select("fp").distinct()
      .collect().map(_.getString(0)).toSet
    val survivors = ops.TextOps.dedupIncremental(spark, sf)
      .select("fp").collect().map(_.getString(0)).toSet
    val all = ops.TextOps.dedupExact(spark, sf)
      .select(md5(col("text").cast("binary")).as("fp"))
      .collect().map(_.getString(0)).toSet
    assert((canon & survivors).isEmpty, "a surviving batch doc duplicates canonical content")
    assert((canon | survivors) == all,
      s"incremental union misses ${(all -- canon -- survivors).size} fingerprints / " +
        s"invents ${((canon | survivors) -- all).size}")
  }

  test("kmeansStep: one Lloyd round pulls a centroid onto a planted cluster and IVF recalls it") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val dim = 16
    val q = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    // Planted cluster: tiny perturbations of q. Seed centroids are NOISE
    // vectors only — before training no centroid represents the cluster;
    // after one Lloyd step the seed nearest the cluster has absorbed its
    // members and moved to (roughly) their mean, so probing the trained
    // cells recalls every planted neighbor.
    val planted = (1L to 5L).map(i => (i, q.map(x => x + math.signum(x) * 0.01f * i)))
    val noise = (100L until 200L).map(i => (i, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val emb = (planted ++ noise).toDF("vec_id", "embedding")
    val seed = noise.take(8).map { case (i, v) => (i, v) }.toDF("cent_id", "cemb")
    val trained = ops.Similarity.kmeansStep(emb, seed).localCheckpoint()
    // Structural sanity: centroids keep the dimension, never multiply.
    val tc = trained.select(col("cent_id"), size(col("cemb")).as("d")).collect()
    assert(tc.length <= 8 && tc.forall(_.getAs[Int]("d") == dim))
    val qdf = Seq(Tuple1(q)).toDF("qemb")
    val top5 = ops.Similarity.ivfSearch(emb, trained, qdf, nProbe = 2, k = 5)
      .collect().map(_.getLong(0)).toSet
    assert(top5 == Set(1L, 2L, 3L, 4L, 5L),
      s"trained IVF should recall the planted cluster, got $top5")
  }

  test("q_quality_filter fixture invariant: n_chars equals the text length") {
    // mean_wlen is derived as (n_chars - (n_words - 1)) / n_words, which is
    // only the true mean word length if n_chars == length(text) and tokens
    // are single-space separated. The oracle mirrors the formula, so a
    // violating fixture would pass the cross-engine check while being
    // silently wrong — this pins the invariant the formula rests on.
    val bad = Tables(spark, sf, "documents")
      .filter(length(col("text")) =!= col("n_chars") ||
        col("text").contains("  ") || col("text").startsWith(" ") || col("text").endsWith(" "))
      .count()
    assert(bad == 0L, s"$bad documents violate the n_chars/single-space invariant")
  }

  test("q_udaf_topk (bounded insertion) still equals its window-query twin") {
    val agg = ops.Custom.udafTopK(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3), r.getInt(4)))
    val win = spark.sql(
      s"""SELECT l_returnflag, CAST(rnk AS INT) AS rnk, l_extendedprice, l_orderkey, l_linenumber
         |FROM (SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
         |             row_number() OVER (PARTITION BY l_returnflag
         |               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rnk
         |      FROM parquet.`$sf/lineitem.parquet`) t
         |WHERE rnk <= 3 ORDER BY l_returnflag, rnk""".stripMargin).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3), r.getInt(4)))
    assert(agg.toSeq == win.toSeq)
  }

  test("q_csv_scan round-trips nation through the CSV source bit-exactly") {
    val viaCsv = ops.Extended.csvScan(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
    val direct = Tables(spark, sf, "nation")
      .select("n_nationkey", "n_name", "n_regionkey").orderBy("n_nationkey").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
    assert(viaCsv.toSeq == direct.toSeq)
  }
}
