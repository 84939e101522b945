package graft

import org.scalatest.funsuite.AnyFunSuite

/** Accuracy bounds for the two sketch-based queries — the only registered
  * queries without a DuckDB oracle (approximate by construction), so their
  * correctness check lives here: each sketch must land within its rated
  * error of the exact answer on the real fixtures.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.01"

  test("approx_count_distinct (HLL++, rsd=0.02) is within 5% of exact per group") {
    val approx = ops.Aggregates.aggApprox(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ops.Aggregates.aggDistinct(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((flag, ex) <- exact) {
      val ap = approx(flag).toDouble
      assert(math.abs(ap - ex) / ex <= 0.05,
        s"HLL++ estimate $ap for $flag deviates >5% from exact $ex")
    }
  }

  test("KMV distinct sketch is within 25% of exact and invariant to partial-merge layout") {
    val exact = ops.Aggregates.aggDistinct(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def run() = ops.Custom.udafKmv(spark, d).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val est = run()
    assert(est.keySet == exact.keySet)
    for ((flag, ex) <- exact)
      assert(math.abs(est(flag) - ex) / ex <= 0.25,
        s"KMV(k=64) estimate ${est(flag)} for $flag deviates >25% from exact $ex")
    // Partial-merge invariance: the sketch must be a pure function of the
    // input SET, not of how partitions grouped it.
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val est2 = run()
      assert(est2 == est, "sketch changed under a different partition layout")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("approx_percentile brackets the exact p50/p95 per group") {
    // approx_percentile(accuracy=1000) returns an actual data value whose
    // rank error is bounded by n/1000 — compare against the exact
    // interpolated percentile with a tolerance scaled to the group's spread.
    val approx = ops.Aggregates.percentileApprox(spark, d).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = ops.Aggregates.percentile(spark, d).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    for ((st, (p50e, p95e)) <- exact) {
      val (p50a, p95a) = approx(st)
      assert(math.abs(p50a - p50e) / p50e <= 0.02,
        s"p50 approx $p50a vs exact $p50e for $st")
      assert(math.abs(p95a - p95e) / p95e <= 0.02,
        s"p95 approx $p95a vs exact $p95e for $st")
    }
  }
}
