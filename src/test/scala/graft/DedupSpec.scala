package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** MinHash+LSH and SimHash near-dup detection on planted duplicates. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val base =
    "spark query engine shuffles data between stages using hash partitioning " +
      "while the optimizer pushes filters below joins and prunes unused columns"
  // One token changed → very high shingle overlap.
  private val nearDup = base.replace("prunes", "drops")
  private val unrelated =
    "completely different text about cooking pasta with tomato sauce and basil " +
      "leaves while the water boils slowly on the old kitchen stove tonight"

  private def docs = {
    import spark.implicits._
    Seq((0L, base), (1L, nearDup), (2L, unrelated))
      .toDF("doc_id", "text")
  }

  test("minhash LSH surfaces the planted near-dup pair and not the unrelated one") {
    val cands = Dedup.candidatePairs(Dedup.minhashBands(Dedup.minhashSignatures(docs)))
    val verified = Dedup.exactJaccard(cands, docs)
      .filter(col("jaccard") >= 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified == Set((0L, 1L)))
  }

  test("exact jaccard values are sensible") {
    import spark.implicits._
    val pairs = Seq((0L, 1L), (0L, 2L)).toDF("doc_a", "doc_b")
    val j = Dedup.exactJaccard(pairs, docs)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((0L, 1L)) > 0.85)
    assert(j((0L, 2L)) < 0.15)
  }

  test("simhash hamming distance separates near-dups from unrelated docs") {
    val sig = Dedup.simhashSignatures(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sig(0L), sig(1L)) <= 8)
    assert(hamming(sig(0L), sig(2L)) >= 16)
  }

  test("a 100-document duplicate family resolves to one canonical cluster") {
    import spark.implicits._
    // 100 copies of one text (a hub bucket — the worst case for LSH bucket
    // pair generation) + 20 distinct docs.
    val family = (0L until 100L).map(i => (i, base))
    // genuinely disjoint token sets (a shared template would itself be a
    // near-dup at jaccard ~0.8 — the engine correctly clustered that)
    val others = (1000L until 1020L).map(i =>
      (i, (0 until 12).map(j => s"w${i}x$j").mkString(" ")))
    val docs = (family ++ others).toDF("doc_id", "text")
    val cands = Dedup.candidatePairs(Dedup.minhashBands(Dedup.minhashSignatures(docs)))
    val verified = Dedup.exactJaccard(cands, docs).filter(col("jaccard") >= 0.6)
    val comps = Dedup.connectedComponents(verified.select("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.size == 100, s"expected all 100 family members clustered, got ${comps.size}")
    assert(comps.values.toSet == Set(0L), "every family member must resolve to canonical doc 0")
    assert(comps.keySet == (0L until 100L).toSet)
  }

  test("winnowing fingerprints overlap for near-dups, not for unrelated docs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{explode, pmod, lit, xxhash64}
    val fps = docs
      .select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("h"))
      .filter(pmod(col("h"), lit(4)) === 0)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val overlap01 = fps(0L).intersect(fps(1L)).size.toDouble / fps(0L).union(fps(1L)).size
    val overlap02 = fps.get(2L).map(f2 => fps(0L).intersect(f2).size).getOrElse(0)
    assert(overlap01 > 0.5, s"near-dup fingerprint jaccard $overlap01")
    assert(overlap02 == 0)
  }

  test("connected components transitively close pair chains") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("shingles produce n-2 word 3-grams") {
    import spark.implicits._
    val sh = Seq(Tuple1("a b c d e")).toDF("text")
      .select(Dedup.shingles(col("text")).as("sh"))
      .collect().head.getSeq[String](0)
    assert(sh == Seq("a b c", "b c d", "c d e"))
  }
}
