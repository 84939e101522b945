package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for headline queries and flag the
  * scale-relevant properties (filter pushdown into the parquet scan,
  * broadcast vs shuffle joins, whole-stage codegen coverage).
  * Usage: runMain graft.PlanAudit <sfDir> [queryName...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
    else Seq("q_flagship", "q_join_multiway", "q_join_broadcast", "q1_agg",
      "q_minhash_pairs", "q_cosine_topk", "q_topk", "q_window_rank")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n================ $n ================")
      val plan = SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(plan)
      val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
      val smj = "SortMergeJoin".r.findAllIn(plan).length
      val shj = "ShuffledHashJoin".r.findAllIn(plan).length
      val exchanges = "Exchange".r.findAllIn(plan).length
      val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).length
      println(s"[audit] $n: broadcastJoins=$broadcasts sortMergeJoins=$smj " +
        s"shuffledHashJoins=$shj exchanges=$exchanges scansWithPushedFilters=$pushed")
    }
    spark.stop()
  }
}
