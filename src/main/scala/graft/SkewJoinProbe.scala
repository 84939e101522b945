package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VERDICT r20 next #1 — the last unadjudicated plan choice on the
  * registered surface: the manual hot-key-only salted join
  * ([[ops.Tpch.saltedHotJoin]], registered as q_salted_hotkey) versus
  * Spark's built-in AQE skew-join handling
  * (`spark.sql.adaptive.skewJoin.*`) on the plain equi-join that computes
  * the identical result (the oracle IS the plain join).
  *
  * `runMain graft.SkewJoinProbe <sfDir>` — three regimes × 3 runs each,
  * per-regime medians + the FINAL adaptive plan's join/skew inventory
  * (read off the executed plan after the run, i.e. post-AQE):
  *
  *   - `salted`     — the registered operator exactly as shipped (hot-key
  *                    detection pass, broadcast hot list, salt hot keys
  *                    only);
  *   - `plain`      — `li ⋈ ord` + groupBy with AQE defaults
  *                    (skewJoin.enabled=true, 256 MB / 5× thresholds);
  *   - `plain-tuned`— same plain join with the skew thresholds lowered
  *                    (8 MB / 2×) so the splitter CAN fire at probe scale
  *                    if any post-shuffle partition is oversized — the
  *                    "tune skewedPartitionFactor/ThresholdInBytes"
  *                    arm the verdict asked for.
  *
  * What the built-in can and cannot do here (guide §2.5): AQE splits an
  * oversized SMJ/SHJ partition into per-mapper slices at runtime — zero
  * user code, but it only fires past its byte threshold and it cannot
  * split one enormous KEY (all rows of a key land in one slice's join
  * group... it CAN split a single key's partition across mappers for the
  * skewed side since the other side is replicated per slice). The manual
  * operator handles the same case with an explicit detection pass +
  * bounded broadcast + constant ×S replication of the HOT subset only.
  */
object SkewJoinProbe {
  private def inventory(plan: String): String = {
    def n(tok: String) = tok.r.findAllIn(plan).length
    s"BHJ=${n("BroadcastHashJoin")} SMJ=${n("SortMergeJoin")} " +
      s"SHJ=${n("ShuffledHashJoin")} skewSplits=${n("skewed")}"
  }

  /** The plain join computing q_salted_hotkey's exact result. */
  private def plainJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables(s, d, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    val ord = Tables(s, d, "orders").select("o_orderkey", "o_orderpriority")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("cnt"))
      .orderBy("o_orderpriority")
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: SkewJoinProbe <sfDir>")
    val d = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = Bench.shufflePartitions(d, cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the page cache over BOTH join inputs before any timed regime:
    // the first regime otherwise pays the cold multi-GB lineitem read
    // alone (the r21 after3 session measured the first regime's first run
    // 135.6 s vs 82.7 warm for identical plans) and every later regime
    // inherits the warmth — an order bias, not a plan difference. A
    // noop-style full-column materialization per guide §1.4.
    TimeProbe.time("warmup scan") {
      Bench.forceEval(Tables(spark, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity"))
      Bench.forceEval(Tables(spark, d, "orders")
        .select("o_orderkey", "o_orderpriority"))
    }

    case class Regime(name: String, fn: (SparkSession, String) => DataFrame,
                      confs: Map[String, String])
    val regimes = Seq(
      Regime("salted", SparkEntry.queries("q_salted_hotkey"), Map.empty),
      Regime("plain", plainJoin _, Map(
        "spark.sql.adaptive.skewJoin.enabled" -> "true")),
      Regime("plain-tuned", plainJoin _, Map(
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m")))

    for (r <- regimes) {
      val saved = r.confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      r.confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        var lastPlan = ""
        val runs = (1 to 3).map { _ =>
          val df = r.fn(spark, d)
          val cols = df.schema.fields.map(f => s"`${f.name}`")
          val c = df.selectExpr(
            s"bit_xor(xxhash64(struct(${cols.mkString(",")}))) AS checksum")
          val t0 = System.nanoTime(); val sum = c.collect()(0)
          val dt = (System.nanoTime() - t0) / 1e9
          lastPlan = c.queryExecution.executedPlan.toString
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
          System.gc(); Thread.sleep(1000); System.gc(); Thread.sleep(1000)
          (dt, sum.getLong(0))
        }
        val times = runs.map(_._1).sorted
        println(f"[skewjoin] ${r.name}%-12s median ${times(1)}%.2f s " +
          f"(min ${times.head}%.2f, max ${times.last}%.2f) " +
          s"checksum=${runs.head._2} ${inventory(lastPlan)}")
      } finally {
        saved.foreach { case (k, vOpt) =>
          vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      }
    }
    spark.stop()
  }
}
