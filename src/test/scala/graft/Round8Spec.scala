package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 additions: native as-of left-outer + tolerance semantics, and
  * the persisted bucketed canonical dedup store's zero-exchange probe.
  * (The skew-safe corpus-frequency rewrites are pinned in PlanSpec; their
  * VALUES are unchanged and stay covered by the per-round DuckDB oracle.) */
class Round8Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // ---- native as-of: left-outer ----

  test("outer as-of: matched rows equal the inner join; unmatched lefts null-extend") {
    val inner = ops.AsOf.purchaseAsofSignupNative(spark, sf).collect().toSeq
    val outer = ops.AsOf.purchaseAsofSignupOuter(spark, sf).collect().toSeq
    val purchases = Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(outer.size == purchases, "left outer must emit every purchase")
    val (matched, unmatched) = outer.partition(r => !r.isNullAt(r.fieldIndex("signup_ts")))
    assert(matched == inner, "outer's matched subset must equal the inner join")
    assert(unmatched.forall(r => r.isNullAt(r.fieldIndex("signup_ts"))))
  }

  test("outer as-of edges: null-keyed lefts emit null-extended; stale candidates never leak") {
    import spark.implicits._
    val left = Seq(
      (Some(1L), Some(9L), "match"),     // matches r1@7
      (Some(2L), Some(1L), "tooEarly"),  // before any key-2 right row
      (Some(3L), Some(9L), "noKey"),     // key 3 absent on the right
      (None, Some(9L), "nullKey"),       // null key never matches
      (Some(1L), None, "nullTime")       // null time never matches
    ).toDF("k", "t", "tag")
    val right = Seq((1L, 7L, "r1@7"), (2L, 6L, "r2@6")).toDF("rk", "rt", "rtag")
    val out = ops.AsOf.asofJoinNative(left, right, "k", "rk", "t", "rt", outer = true)
      .select("tag", "rtag").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out == Map(
      "match" -> Some("r1@7"),
      "tooEarly" -> None, "noKey" -> None, "nullKey" -> None, "nullTime" -> None))
  }

  // ---- native as-of: tolerance ----

  test("tolerance as-of: the bound is inclusive, rejects only stale candidates, and outer null-extends them") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "exact"),   // candidate at t=5, gap 5 == tol -> keeps
      (1L, 20L, "stale"),   // candidate at t=5, gap 15 > tol -> drops
      (2L, 6L, "fresh")     // candidate at t=4, gap 2 -> keeps
    ).toDF("k", "t", "tag")
    val right = Seq((1L, 5L, "r1@5"), (2L, 4L, "r2@4")).toDF("rk", "rt", "rtag")
    val inner = ops.AsOf.asofJoinNative(left, right, "k", "rk", "t", "rt",
        tolerance = Some(5L))
      .select("tag", "rtag").as[(String, String)].collect().toMap
    assert(inner == Map("exact" -> "r1@5", "fresh" -> "r2@4"))
    val outer = ops.AsOf.asofJoinNative(left, right, "k", "rk", "t", "rt",
        outer = true, tolerance = Some(5L))
      .select("tag", "rtag").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(outer == Map("exact" -> Some("r1@5"), "stale" -> None, "fresh" -> Some("r2@4")))
  }

  test("tolerance as-of on timestamps: subset of the untolerenced join, gap-bounded") {
    val bounded = ops.AsOf.purchaseAsofTolerance(spark, sf).collect().toSeq
    val all = ops.AsOf.purchaseAsofSignupNative(spark, sf).collect().toSeq
    assert(bounded.toSet.subsetOf(all.toSet), "tolerance can only remove matches")
    assert(bounded.nonEmpty, "fixture must contain within-tolerance matches")
    assert(bounded.forall { r =>
      val gap = r.getTimestamp(r.fieldIndex("p_ts")).getTime -
        r.getTimestamp(r.fieldIndex("signup_ts")).getTime
      gap >= 0 && gap <= ops.AsOf.ToleranceMicros / 1000
    }, "every surviving match must sit inside the tolerance window")
    assert(all.exists { r =>
      val gap = r.getTimestamp(r.fieldIndex("p_ts")).getTime -
        r.getTimestamp(r.fieldIndex("signup_ts")).getTime
      gap > ops.AsOf.ToleranceMicros / 1000
    }, "fixture must also contain beyond-tolerance matches, or the bound tests nothing")
  }

  // ---- persisted canonical dedup store ----

  test("dedup store: day-2 probe output is exactly the recompute-everything incremental dedup") {
    val store = ops.TextOps.dedupStore(spark, sf).collect().toSeq
    val incremental = ops.TextOps.dedupIncremental(spark, sf).collect().toSeq
    assert(store == incremental)
  }

  test("dedup store: the probe plan has ZERO exchange above the bucketed store scan") {
    // Force the sort-merge anti-join (at test scale the store would
    // broadcast, which proves nothing about the bucketed layout), then walk
    // the join's store-side subtree: the bucketed files must feed the merge
    // with no Exchange — each bucket IS a ready-made join partition, so the
    // daily probe never re-shuffles the accumulated corpus. (A store-side
    // SortExec remains: Spark does not trust write-time sortBy order on
    // read — a bucket may span several writer files — so the per-bucket
    // merge sort is the one residual cost; it is partition-local, spillable,
    // and carries no network.)
    val confs = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val plan = ops.TextOps.dedupStore(spark, sf).queryExecution.executedPlan
      val joins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
      assert(joins.size == 1, s"expected one sort-merge anti-join, got ${joins.size}")
      val storeSide = joins.head.right
      assert(storeSide.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }.isEmpty,
        "the persisted store must never re-shuffle: its buckets ARE the join partitions")
      val scans = storeSide.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      assert(scans.nonEmpty && scans.head.bucketedScan,
        "store side must be a bucketed file scan")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
