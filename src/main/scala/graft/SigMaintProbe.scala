package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: split the sig-cluster store lifecycle into its build and
  * maintenance phases so PERF_NOTES can quote the per-batch maintenance
  * cost separately from the day-0 build — the text-tier twin of
  * [[EmbedMaintProbe]]. `args(1)` = modulus M: day-0 = (M-1)/M of the
  * corpus, the day-N batch = 1/M (the real-world shape: daily delta <<
  * accumulated corpus). The comparison row is q_dedup_clusters's
  * from-scratch cost at the same SF. */
object SigMaintProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("benchdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", Bench.shufflePartitions(d, cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val m = args.lift(1).map(_.toLong).getOrElse(2L)
    val docs = Tables(spark, d, "documents").withColumn("p", pmod(col("doc_id"), lit(m)))
    val loc = java.nio.file.Files.createTempDirectory("graft_smp_").toString
    TimeProbe.time(s"build day-0 (sig store + labels, ${m - 1}/$m of corpus)") {
      ops.Dedup.buildSigClusterStore(spark, "graft_smp", loc,
        docs.filter(col("p") =!= 0).select("doc_id", "text"))
    }
    TimeProbe.time(s"maintain day-N (1/$m batch: new-edge verify + contracted CC + append + label publish)") {
      ops.Dedup.maintainSigClusterStore(spark, "graft_smp",
        docs.filter(col("p") === 0).select("doc_id", "text"))
    }
    TimeProbe.time("steady-state label read") {
      Bench.forceEval(ops.TextOps.readLabels(spark, "graft_smp_labels", "doc_id"))
    }
    // Separate cold-cache effects from the overlay's intrinsic cost, and
    // prove which guard regime served the read (r19: the broadcast hint is
    // size-gated on the delta's stats bytes).
    TimeProbe.time("steady-state label read (warm)") {
      Bench.forceEval(ops.TextOps.readLabels(spark, "graft_smp_labels", "doc_id"))
    }
    println(s"[probe] delta stats bytes: " + spark.table("graft_smp_labels_delta")
      .queryExecution.optimizedPlan.stats.sizeInBytes +
      s" (ceiling ${ops.TextOps.LabelDeltaMaxBytes})")
    spark.stop()
  }
}
