package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: isolated 3-run medians for NAMED registered queries at an
  * arbitrary data dir — `runMain graft.ProbeQ <dir> <q1> <q2> ...`. The
  * quiet-session counterpart to Bench's contended full sweep (PERF_NOTES
  * convention since r06: bench outliers are adjudicated against isolated
  * medians, and scaling ratios against same-harness runs). */
object ProbeQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProbeQ <sfDir> <query>...")
    val d = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    TimeProbe.time("warmup count")(Tables(spark, d, "region").count())
    for (q <- args.tail) {
      val fn = SparkEntry.queries.getOrElse(q, sys.error(s"unknown query $q"))
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); fn(spark, d).count()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] $q isolated median ${runs(1)}%.2f s (min ${runs.head}%.2f, max ${runs.last}%.2f)")
    }
    spark.stop()
  }
}
