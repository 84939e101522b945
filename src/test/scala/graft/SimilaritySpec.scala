package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** Vector math correctness + ANN recall on planted neighbors. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("dot / norm / cosine against hand-computed values") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(2.0f, 3.0f, 0.0f, 0.0f), Array(2.0f, 3.0f, 0.0f, 0.0f)),
    ).toDF("id", "a", "b")
      .select(col("id"),
        Similarity.dot(Similarity.toDouble(col("a")), Similarity.toDouble(col("b"))).as("dot"),
        Similarity.cosine(Similarity.toDouble(col("a")), Similarity.toDouble(col("b"))).as("cos"))
    val m = df.collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(m(1L)._1 == 0.0 && m(1L)._2 == 0.0)
    assert(m(2L)._1 == 1.0 && math.abs(m(2L)._2 - 1.0 / math.sqrt(2)) < 1e-12)
    assert(m(3L)._1 == 13.0 && math.abs(m(3L)._2 - 1.0) < 1e-12)
  }

  test("embedding near-dup pairs finds planted duplicates within buckets") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val dim = 16
    val base = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    val emb = (Seq(
      (0L, base),
      (1L, base.map(x => x + math.signum(x) * 0.01f)), // near-dup of 0
    ) ++ (10L until 60L).map(i => (i, Array.fill(dim)(rnd.nextFloat() * 2 - 1))))
      .toDF("vec_id", "embedding")
    val pairs = graft.ops.Similarity.embedNearDupPairs(emb, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    // random 16-dim gaussians essentially never reach cosine 0.95
    assert(pairs.size <= 2)
  }

  test("sign-LSH ANN recalls planted same-bucket neighbors perfectly") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 16
    val q = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    // 5 planted neighbors: tiny perturbation, sign pattern preserved.
    val planted = (1L to 5L).map { i =>
      (i, q.map(x => x + math.signum(x) * 0.01f * i))
    }
    val noise = (100L until 200L).map(i => (i, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val emb = ((0L, q) +: (planted ++ noise)).toDF("vec_id", "embedding")

    val qv = emb.filter(col("vec_id") === 0)
      .select(Similarity.toDouble(col("embedding")).as("qv"))
      .withColumn("qbucket", Similarity.signBucket(col("qv")))
    val top5 = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .withColumn("bucket", Similarity.signBucket(col("v")))
      .crossJoin(broadcast(qv))
      .filter(bit_count(col("bucket").bitwiseXOR(col("qbucket"))) <= 1)
      .select(col("vec_id"), Similarity.cosine(col("v"), col("qv")).as("cos"))
      .orderBy(col("cos").desc)
      .limit(5)
      .collect().map(_.getLong(0)).toSet
    assert(top5 == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("IVF search recalls planted neighbors when their cell is probed") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 16
    val q = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    // Planted neighbors: tiny perturbations of the query vector.
    val planted = (1L to 5L).map(i => (i, q.map(x => x + math.signum(x) * 0.01f * i)))
    val noise = (100L until 200L).map(i => (i, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val emb = (planted ++ noise).toDF("vec_id", "embedding")
    // Centroids: the query itself + 7 noise vectors — the query's cell is
    // guaranteed probed first, so all planted neighbors must be recalled.
    val cent = ((0L, q) +: noise.take(7))
      .toDF("cent_id", "cemb")
    val qdf = Seq(Tuple1(q)).toDF("qemb")
    val top5 = Similarity.ivfSearch(emb, cent, qdf, nProbe = 2, k = 5)
      .collect().map(_.getLong(0)).toSet
    assert(top5 == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("OR-amplified bands recall a near-dup pair the single-bucket join misses") {
    import spark.implicits._
    // Planted pair: signs differ in TWO of the first 8 dims (both
    // small-magnitude, so cosine stays ~0.999) and agree everywhere else.
    // The single-projection join (bucket = signs of dims 1-8) puts them in
    // buckets at hamming distance 2 -> missed; bands 1-3 (dims 9-32) match
    // exactly -> the OR-amplified join must surface the pair. This is the
    // recall amplification 1-(1-p^bits)^bands buys over p^bits.
    val dim = 32
    val base = Array.tabulate(dim)(i => if (i == 0 || i == 4) 0.05f else 0.5f)
    val near = Array.tabulate(dim)(i => if (i == 0 || i == 4) -0.05f else 0.5f)
    val rnd = new scala.util.Random(17)
    val noise = (10L until 60L).map(i => (i, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val emb = (Seq((0L, base), (1L, near)) ++ noise).toDF("vec_id", "embedding")
    val single = Similarity.embedNearDupPairs(emb, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Similarity.embedNearDupBanded(emb, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!single.contains((0L, 1L)),
      "test premise broken: the single-bucket join should miss a hamming-2 pair")
    assert(banded.contains((0L, 1L)),
      "banded OR-amplification must recall the pair via its matching later bands")
    // Band 0 IS the single projection, so banded candidates are a superset:
    // anything the single-bucket join verified must also survive the bands.
    assert(single.subsetOf(banded))
  }

  test("ivfAnn (on-the-fly assignment) ≡ q_ivf_pruned (cell-partitioned store)") {
    // The demoted ivfAnn is ivfPruned's semantic twin: same centroids, same
    // probe rule, same top-k — one recomputes the assignment per query, the
    // other reads the staged cell directories. Row-identical output is the
    // contract that let q_ivf_pruned inherit the oracle when q_ivf_ann left
    // the registered surface (VERDICT r09 "what's wrong" #1).
    val d = "/root/testdata/sf0.001"
    val fly = Similarity.ivfAnn(spark, d).collect().toSeq
    val pruned = SparkEntry.queries("q_ivf_pruned")(spark, d).collect().toSeq
    assert(fly == pruned)
  }
}
