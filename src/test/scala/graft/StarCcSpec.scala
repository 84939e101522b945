package graft

import org.scalatest.funsuite.AnyFunSuite

/** Star-contraction connected components ([[ops.Dedup.connectedComponentsStar]]):
  * label agreement with the min-label propagation twin on random graphs,
  * and the O(log depth) round bound that is its reason to exist. */
class StarCcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    pairs.toDF("doc_a", "doc_b")
  }

  private def labelsOf(d: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star contraction equals min-label propagation on seeded random graphs") {
    for (seed <- Seq(1, 7, 42); n <- Seq(40, 120)) {
      val rnd = new scala.util.Random(seed)
      // ~0.8 edges per node: sparse enough for many components, dense
      // enough for multi-node ones; plus a few self-pairs (singletons).
      val pairs = Seq.fill((n * 0.8).toInt)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)) ++
        Seq.fill(3)({ val x = rnd.nextInt(n).toLong; (x, x) })
      val star = labelsOf(ops.Dedup.connectedComponentsStar(df(pairs)))
      val minl = labelsOf(ops.Dedup.connectedComponents(df(pairs)))
      assert(star == minl, s"seed=$seed n=$n: star and min-label disagree")
    }
  }

  test("a 33-node path converges in O(log depth) alternations, all labeled to the minimum") {
    // Min-label propagation needs 32 rounds here (one hop per round); star
    // contraction at least halves every tree's height per LS+SS pair.
    val chain = (0L until 32L).map(i => (i, i + 1))
    val (labels, rounds) = ops.Dedup.starContraction(df(chain))
    assert(labelsOf(labels) == (0L to 32L).map(_ -> 0L).toMap)
    assert(rounds <= 8, s"expected logarithmic convergence, took $rounds alternations")
  }

  test("auto strategy: shallow graphs converge on the min-label probe") {
    val shallow = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 20L))
    val (labels, strategy) = ops.Dedup.ccAutoWithStrategy(df(shallow))
    assert(strategy == "min-label", "a 2-hop graph must not pay for star contraction")
    assert(labelsOf(labels) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("auto strategy: an adversarially deep chain switches to star and still labels correctly") {
    // 9 hops of label distance > the 8-round probe cap: exactly the shape
    // that used to reach the iteration bail. The REGISTERED cluster queries
    // (q_dedup_clusters, q_cluster_keep, q_embed_clusters, the curation
    // pipeline) all enter through connectedComponentsAuto, so this planted
    // chain exercises their strategy switch, not a test-only variant.
    // (r21 re-adjudication: star IS the right fallback — on the sf100 embed
    // graph it beats min-label-to-convergence outright, and a pointer-
    // jumping continuation prototype measured 1.6× WORSE than probe+star;
    // see connectedComponentsAuto's scaladoc.)
    val chain = (0L until 9L).map(i => (i, i + 1))
    val (labels, strategy) = ops.Dedup.ccAutoWithStrategy(df(chain))
    assert(strategy == "star", "past the probe cap the auto entry point must switch")
    assert(labelsOf(labels) == (0L to 9L).map(_ -> 0L).toMap)
  }

  test("auto strategy: a 120-hop chain still labels exactly through the star fallback") {
    val chain = (0L until 120L).map(i => (i, i + 1))
    val (labels, strategy) = ops.Dedup.ccAutoWithStrategy(df(chain))
    assert(strategy == "star")
    assert(labelsOf(labels) == (0L to 120L).map(_ -> 0L).toMap)
  }

  test("non-convergence is a thrown error, not a stderr note") {
    val chain = (0L until 9L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] {
      ops.Dedup.connectedComponents(df(chain), maxIterations = 3)
    }
    assert(e.getMessage.contains("NOT converged"))
  }

  test("components, singletons, and an empty graph label correctly") {
    val pairs = Seq((10L, 20L), (20L, 30L), (5L, 6L), (99L, 99L))
    val got = labelsOf(ops.Dedup.connectedComponentsStar(df(pairs)))
    assert(got == Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 5L -> 5L, 6L -> 5L, 99L -> 99L))
    assert(ops.Dedup.connectedComponentsStar(df(Seq.empty[(Long, Long)])).isEmpty)
  }
}
