package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: isolated 3-run medians for NAMED registered queries at an
  * arbitrary data dir — `runMain graft.ProbeQ <dir> <q1> <q2> ...`. The
  * quiet-session counterpart to Bench's contended full sweep (PERF_NOTES
  * convention since r06: bench outliers are adjudicated against isolated
  * medians, and scaling ratios against same-harness runs).
  *
  * GRAFT_HEAP (tools/runjava.sh's -Xms=-Xmx knob) — the measured rule on
  * this 125 GiB box (PERF_NOTES r17, probeq vs probeq32 logs): at sf100 a
  * 96 g pinned heap leaves ~25 GiB for the OS page cache, so SCAN-heavy
  * queries lose file residency and turn into a coin flip (q_tpch21 median
  * 147.5 s at 96 g vs 54.6 s at 32 g in full isolation), while
  * AGGREGATION-SPILL-heavy queries invert (q_dup_ngrams 321.5 s at 32 g vs
  * 184.4 s at 96 g — the spill wants the heap). Therefore: isolated ProbeQ
  * runs default to 32 g (runjava's default — cache-friendly, matches the
  * r13+ tail-matrix convention); full-session sf100 SWEEPS need
  * GRAFT_HEAP=96g (32 g OOMed the 187-query session in r13); and a number
  * measured under one heap is never compared against the other. On a real
  * cluster the same tradeoff is executor-memory vs host-cache
  * provisioning: spill-bound stages size the executor, scan-bound stages
  * want the difference left to the OS. */
object ProbeQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProbeQ <sfDir> <query>...")
    val d = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // Partitions ∝ data decade (see [[Bench.shufflePartitions]]): at sf100
    // a 600M-row sort-merge join through 32 partitions is ~19M rows per
    // sort task — every task spills (q_tpch21 measured 18.6×/decade fixed
    // vs 5.5× scaled). SPARK_GRAFT_PARTS overrides.
    val parts = Bench.shufflePartitions(d, cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    TimeProbe.time("warmup count")(Tables(spark, d, "region").count())
    // Events read-path warmup (timestamp normalization + cast codegen) so
    // an events query probed first isn't charged session costs — the exact
    // attribution error behind the r10 q_asof_forward "drift" (PERF_NOTES).
    TimeProbe.time("warmup events ts")(
      Tables(spark, d, "events").selectExpr("max(ts)").collect())
    for (q <- args.tail) {
      val fn = SparkEntry.queries.getOrElse(q, sys.error(s"unknown query $q"))
      val runs = (1 to 3).map { _ =>
        // Full-result checksum, not count(): see [[Bench.forceEval]] — a
        // bare count lets the optimizer elide the very subtrees being
        // measured (r12: the near-dup screens folded to a filtered count).
        val t0 = System.nanoTime(); Bench.forceEval(fn(spark, d))
        val dt = (System.nanoTime() - t0) / 1e9
        // Teardown OUTSIDE the timer, and thoroughly: localCheckpoint-heavy
        // queries (the CC iterators) leave dozens of materialized RDDs +
        // shuffle map outputs per run, and with a 96 GB heap the JVM may
        // never GC, so the ContextCleaner never reclaims them — measured as
        // run 1 = 15 s, runs 2-3 = 170 s for q_dedup_clusters at sf10
        // before this block existed. Blocking unpersist + an explicit GC
        // (which is what actually triggers the cleaner's reference queue)
        // keeps every run a cold, comparable measurement.
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        // Two GC cycles with a settle window: the first enqueues the dead
        // RDD/shuffle references, the cleaner thread then deletes files and
        // blocks asynchronously; the second pass catches stragglers. The
        // settle is generous because at sf10+ a single CC run leaves
        // thousands of shuffle files.
        System.gc(); Thread.sleep(2000); System.gc(); Thread.sleep(2000)
        dt
      }.sorted
      println(f"[probe] $q isolated median ${runs(1)}%.2f s (min ${runs.head}%.2f, max ${runs.last}%.2f)")
    }
    spark.stop()
  }
}
