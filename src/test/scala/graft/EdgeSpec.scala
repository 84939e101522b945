package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** Edge cases: empty inputs, tiny documents, degenerate graphs. */
class EdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("join → offset/limit over an empty filter result yields zero rows, no errors") {
    val a = spark.range(0, 100).toDF("id").filter(col("id") < 0)
    val b = spark.range(0, 100).toDF("id2")
    val out = a.join(b, col("id") === col("id2"))
      .orderBy("id").offset(10).limit(5)
    assert(out.count() == 0)
  }

  test("offset past the end of the data yields zero rows") {
    val out = spark.range(0, 7).toDF("id").orderBy("id").offset(100).limit(10)
    assert(out.count() == 0)
  }

  test("minhash handles sub-shingle-size documents via the whole-text fallback") {
    import spark.implicits._
    val docs = Seq((1L, "one two"), (2L, "one two"), (3L, "different words here entirely"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs)
    assert(sigs.count() == 3)
    val pairs = Dedup.candidatePairs(Dedup.minhashBands(sigs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical 2-token docs share every band; the unrelated doc joins none
    assert(pairs == Set((1L, 2L)))
  }

  test("gap fill zero-fills missing hours on sparse data") {
    import spark.implicits._
    import java.sql.Timestamp
    val sparse = Seq(
      Timestamp.valueOf("2024-01-01 00:10:00"),
      Timestamp.valueOf("2024-01-01 03:20:00"), // hours 01 and 02 are empty
      Timestamp.valueOf("2024-01-01 03:40:00"),
    ).toDF("ts")
    val hourly = sparse.groupBy(org.apache.spark.sql.functions.date_trunc("hour", col("ts")).as("hour"))
      .count()
    val spine = sparse
      .agg(org.apache.spark.sql.functions.min(org.apache.spark.sql.functions.date_trunc("hour", col("ts"))).as("mn"),
        org.apache.spark.sql.functions.max(org.apache.spark.sql.functions.date_trunc("hour", col("ts"))).as("mx"))
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.expr("sequence(mn, mx, interval 1 hour)")).as("hour"))
    val filled = spine.join(hourly, Seq("hour"), "left")
      .select(col("hour"), org.apache.spark.sql.functions.coalesce(col("count"), org.apache.spark.sql.functions.lit(0L)).as("cnt"))
      .orderBy("hour")
      .collect().map(r => r.getTimestamp(0).toString.substring(11, 13) -> r.getLong(1))
    assert(filled.toSeq == Seq("00" -> 1L, "01" -> 0L, "02" -> 0L, "03" -> 2L))
  }

  test("connected components of an empty pair set is empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(empty).count() == 0)
  }

  test("portableHash pins the cross-engine value (md5-prefix contract with DuckDB)") {
    import spark.implicits._
    // DuckDB: SELECT ('0x' || substr(md5('hello'), 1, 15))::BIGINT
    //      => 419982666956583591. Every portable-hash oracle (minhash,
    // simhash, winnowing) depends on this exact agreement — if this test
    // breaks, every one of those oracles breaks with it.
    val got = Seq("hello").toDF("s")
      .select(Dedup.portableHash(col("s")).as("h"))
      .collect().head.getLong(0)
    assert(got == 419982666956583591L)
  }

  test("portableHash agrees cross-engine on multibyte UTF-8 (non-ASCII pins)") {
    import spark.implicits._
    // The md5-prefix contract holds only if both engines hash the SAME
    // bytes; these pins (computed in DuckDB) would catch any drift in UTF-8
    // encoding on either side — e.g. a latin-1 cast or UTF-16 code-unit
    // hashing would change every value here while leaving ASCII untouched.
    val pinned = Seq(
      "héllo wörld" -> 1067566609160269281L,
      "你好世界" -> 455873937493789519L,
      "naïve café — ☃" -> 628777064927874774L,
    )
    val got = pinned.map(_._1).toDF("s")
      .select(col("s"), Dedup.portableHash(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    pinned.foreach { case (s, v) =>
      assert(got(s) == v, s"portableHash('$s') = ${got(s)}, DuckDB pin = $v")
    }
  }

  test("incremental near-dup screen: empty existing corpus makes every batch doc novel") {
    import spark.implicits._
    val existing = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val batch = Seq((1L, "some words here today"), (2L, "other words there tomorrow"))
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.incrementalNearDupScreen(existing, batch).collect()
    assert(out.length == 2 && out.forall(r => r.getBoolean(3) && r.getLong(1) == 0L))
  }

  test("incremental near-dup screen: empty batch yields zero rows, no errors") {
    import spark.implicits._
    val existing = Seq((1L, "some words here today")).toDF("doc_id", "text")
    val batch = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.ops.Dedup.incrementalNearDupScreen(existing, batch).count() == 0)
  }

  test("IVF search over empty vectors / empty centroids yields zero rows") {
    import spark.implicits._
    val emptyEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val cent = Seq((0L, Array(1.0f, 0.0f))).toDF("cent_id", "cemb")
    val q = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("qemb")
    assert(graft.ops.Similarity.ivfSearch(emptyEmb, cent, q, nProbe = 2, k = 5).count() == 0)
    val emb = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val emptyCent = Seq.empty[(Long, Array[Float])].toDF("cent_id", "cemb")
    assert(graft.ops.Similarity.ivfSearch(emb, emptyCent, q, nProbe = 2, k = 5).count() == 0)
  }
}
