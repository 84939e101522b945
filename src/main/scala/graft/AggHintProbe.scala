package graft

import org.apache.spark.sql.SparkSession

/** VERDICT r19 next #1: adjudicate the three AGGREGATE-DERIVED forced
  * broadcasts (tpch2's per-part argmin `best`, tpch20's qualifying-supplier
  * set `vol`, the salted join's hot-key list `hot`) against the no-hint/AQE
  * alternative. These sides are dimension-bounded by construction but
  * SF-proportional in truth, and plan-time stats cannot see either fact —
  * so the question is empirical: with the hint DROPPED and AQE on, does the
  * runtime shuffle→broadcast conversion restore the same join from REAL
  * sizes, and at what wall-time cost?
  *
  * `runMain graft.AggHintProbe <sfDir>` — for each of the three registered
  * queries, runs 3 hinted + 3 unhinted passes (alternating regimes via the
  * [[ops.Hints.AggBroadcastHints]] seam), reports per-regime medians and
  * the FINAL adaptive plan's join inventory (BroadcastHashJoin vs
  * SortMergeJoin counts read off the executed plan after the run, i.e.
  * post-AQE-reoptimization, not the static guess).
  *
  * ADJUDICATED r20 (PERF_NOTES probe table, target/agghint_sf{01,100}.log):
  * tpch2 and tpch20 dropped their hints — unhinted measured faster at both
  * decades — so for those two the seam no longer wires anywhere and both
  * regimes now measure the shipped unhinted plan; only
  * [[ops.Tpch.saltedHotJoin]]'s hot-list hint (kept, with the measured
  * reason at the site) still responds to the seam. The probe remains the
  * instrument of record for re-running the A/B.
  */
object AggHintProbe {
  private def joinMix(plan: String): String = {
    def n(tok: String) = tok.r.findAllIn(plan).length
    s"BHJ=${n("BroadcastHashJoin")} SMJ=${n("SortMergeJoin")} " +
      s"SHJ=${n("ShuffledHashJoin")} BNLJ=${n("BroadcastNestedLoopJoin")}"
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: AggHintProbe <sfDir>")
    val d = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = Bench.shufflePartitions(d, cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // AQE on with defaults — the deployment shape the probe adjudicates.
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    TimeProbe.time("warmup count")(Tables(spark, d, "region").count())

    val queries = Seq("q_tpch2", "q_tpch20", "q_salted_hotkey")
    for (q <- queries; hinted <- Seq(true, false)) {
      ops.Hints.AggBroadcastHints = hinted
      val fn = SparkEntry.queries(q)
      var lastPlan = ""
      val runs = (1 to 3).map { _ =>
        val df = fn(spark, d)
        // forceEval's exact checksum action, but on a handle we keep so the
        // EXECUTED (post-AQE) plan is readable afterwards.
        val cols = df.schema.fields.map { f =>
          if (Bench.hasMapType(f.dataType)) s"xxhash64(to_json(`${f.name}`))"
          else s"`${f.name}`"
        }
        val c = df.selectExpr(
          s"bit_xor(xxhash64(struct(${cols.mkString(",")}))) AS checksum")
        val t0 = System.nanoTime(); c.collect()
        val dt = (System.nanoTime() - t0) / 1e9
        lastPlan = c.queryExecution.executedPlan.toString
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        System.gc(); Thread.sleep(1000); System.gc(); Thread.sleep(1000)
        dt
      }.sorted
      println(f"[agghint] $q hinted=$hinted median ${runs(1)}%.2f s " +
        f"(min ${runs.head}%.2f, max ${runs.last}%.2f) ${joinMix(lastPlan)}")
    }
    ops.Hints.AggBroadcastHints = true
    spark.stop()
  }
}
