package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: split the embed-cluster store lifecycle into its build and
  * maintenance phases so PERF_NOTES can quote the per-batch maintenance
  * cost separately from the day-0 build (the registered query memoizes
  * both into one closure). */
object EmbedMaintProbe {
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
    // args(1) = modulus M: day-0 = (M-1)/M of the corpus, the day-N batch
    // = 1/M — the real-world shape (daily delta << accumulated corpus).
    val m = args.lift(1).map(_.toLong).getOrElse(2L)
    val emb = Tables(spark, d, "embeddings").withColumn("p", pmod(col("vec_id"), lit(m)))
    val bits = ops.Similarity.autoBits(emb.count())
    val loc = java.nio.file.Files.createTempDirectory("graft_emp_").toString
    TimeProbe.time(s"build day-0 (band store + labels, ${m - 1}/$m of corpus)") {
      ops.Similarity.buildEmbedClusterStore(spark, "graft_emp", loc,
        emb.filter(col("p") =!= 0).select("vec_id", "embedding"), bits = bits)
    }
    TimeProbe.time(s"maintain day-N (1/$m batch: screen + new-edge verify + contracted CC + append + label rewrite)") {
      ops.Similarity.maintainEmbedClusterStore(spark, "graft_emp",
        emb.filter(col("p") === 0).select("vec_id", "embedding"))
    }
    TimeProbe.time("steady-state label read") {
      Bench.forceEval(ops.TextOps.readLabels(spark, "graft_emp_elabels", "vec_id"))
    }
    // See SigMaintProbe: warm re-read + guard-regime evidence (r19).
    TimeProbe.time("steady-state label read (warm)") {
      Bench.forceEval(ops.TextOps.readLabels(spark, "graft_emp_elabels", "vec_id"))
    }
    println(s"[probe] delta stats bytes: " + spark.table("graft_emp_elabels_delta")
      .queryExecution.optimizedPlan.stats.sizeInBytes +
      s" (ceiling ${ops.TextOps.LabelDeltaMaxBytes})")
    spark.stop()
  }
}
