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
