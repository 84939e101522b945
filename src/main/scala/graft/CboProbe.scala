package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VERDICT r20 next #3 — probe CBO column statistics as a replacement for
  * the [[ops.Hints]] plumbing. The entire Hints saga (the 256 MB stats
  * gate, the two-arg base-scan workaround, the aggregate-derived
  * exemption) exists because the NON-CBO estimator multiplies join
  * children's byte sizes, so a joined dim (supplier⋈nation) estimates as
  * GBs when its true size is KBs. `ANALYZE TABLE ... COMPUTE STATISTICS
  * FOR ALL COLUMNS` + `spark.sql.cbo.enabled=true` gives Catalyst real
  * per-column NDV/min/max, which its join-cardinality model can use —
  * IF the inputs are CATALOG tables (path-based `spark.read.parquet`
  * reads, which the whole registered surface uses via [[Tables]], have no
  * catalog entry to hang stats on; that structural fact is itself one of
  * the probe's findings).
  *
  * `runMain graft.CboProbe <sfDir>` — registers external parquet tables
  * over the same files, ANALYZEs them, then for the tpch7 join shape
  * UNHINTED (no broadcast, no dimBroadcast — the planner decides):
  *   - prints the supplier⋈nation subtree's estimated sizeInBytes under
  *     cbo=off vs cbo=on (the mis-estimate the hints work around);
  *   - prints the final executed join inventory + 3-run medians per
  *     regime, plus the registered (hinted) q_tpch7 as the comparator.
  */
object CboProbe {
  private def inventory(plan: String): String = {
    def n(tok: String) = tok.r.findAllIn(plan).length
    s"BHJ=${n("BroadcastHashJoin")} SMJ=${n("SortMergeJoin")} " +
      s"SHJ=${n("ShuffledHashJoin")}"
  }

  private def ts(s: String) = lit(s + " 00:00:00").cast("timestamp")

  /** tpch7's exact shape against CATALOG tables, zero hints. */
  private def tpch7Catalog(s: SparkSession): DataFrame = {
    val pair = Seq("NATION_1", "NATION_2")
    val n1 = s.table("nation").filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = s.table("nation").filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val supp = s.table("supplier").select("s_suppkey", "s_nationkey")
      .join(n1, col("s_nationkey") === col("s_nk"))
      .select("s_suppkey", "supp_nation")
    val cust = s.table("customer").select("c_custkey", "c_nationkey")
      .join(n2, col("c_nationkey") === col("c_nk"))
      .select("c_custkey", "cust_nation")
    val ord = s.table("orders").select("o_orderkey", "o_custkey")
    val li = s.table("lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1998-01-01"))
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
        || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** The joined supplier dim alone — the frame whose estimate the
    * two-arg dimBroadcast gate works around. */
  private def suppJoined(s: SparkSession): DataFrame =
    s.table("supplier").select("s_suppkey", "s_nationkey")
      .join(s.table("nation").filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")),
        col("s_nationkey") === col("s_nk"))
      .select("s_suppkey", "supp_nation")

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: CboProbe <sfDir>")
    // Absolutize: CREATE TABLE ... LOCATION resolves a relative path
    // against spark-warehouse, not the cwd.
    val d = new java.io.File(args.head).getAbsolutePath
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", Bench.shufflePartitions(d, cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Column stats on join keys + filter columns only. NOT on timestamps:
    // Spark 4.1.2's CBO estimator dies with `scala.MatchError:
    // TimestampNTZType` during optimization when column stats exist on an
    // NTZ column that appears in a comparison filter (first probe run hit
    // it on l_shipdate) — a hard blocker for FOR ALL COLUMNS on this
    // schema, recorded as part of the probe's finding.
    val statCols = Map(
      "nation" -> "n_nationkey, n_name",
      "supplier" -> "s_suppkey, s_nationkey",
      "customer" -> "c_custkey, c_nationkey",
      "orders" -> "o_orderkey, o_custkey",
      "lineitem" -> "l_orderkey, l_suppkey")
    val tables = statCols.keys.toSeq
    tables.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t USING parquet LOCATION '$d/$t.parquet'")
    }
    val t0 = System.nanoTime()
    tables.foreach(t =>
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS ${statCols(t)}"))
    println(f"[cbo] ANALYZE FOR COLUMNS (keys, no timestamps) over ${tables.size} tables: " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s (the fixture-build-time cost)")

    for (cbo <- Seq(false, true)) {
      spark.conf.set("spark.sql.cbo.enabled", cbo.toString)
      try {
        val est = suppJoined(spark).queryExecution.optimizedPlan.stats.sizeInBytes
        println(s"[cbo] cbo=$cbo supplier⋈nation estimated bytes = $est")
        var lastPlan = ""
        val runs = (1 to 3).map { _ =>
          val df = tpch7Catalog(spark)
          val cols = df.schema.fields.map(f => s"`${f.name}`")
          val c = df.selectExpr(
            s"bit_xor(xxhash64(struct(${cols.mkString(",")}))) AS checksum")
          val t = System.nanoTime(); val sum = c.collect()(0)
          val dt = (System.nanoTime() - t) / 1e9
          lastPlan = c.queryExecution.executedPlan.toString
          System.gc(); Thread.sleep(500)
          (dt, sum.getLong(0))
        }
        val times = runs.map(_._1).sorted
        println(f"[cbo] cbo=$cbo tpch7-unhinted median ${times(1)}%.2f s " +
          f"(min ${times.head}%.2f, max ${times.last}%.2f) " +
          s"checksum=${runs.head._2} ${inventory(lastPlan)}")
      } catch {
        case e: Throwable =>
          println(s"[cbo] cbo=$cbo FAILED: ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" / ")}")
      }
    }
    spark.conf.set("spark.sql.cbo.enabled", "false")

    // Comparator: the registered hinted query on the same session.
    val fn = SparkEntry.queries("q_tpch7")
    val runs = (1 to 3).map { _ =>
      val df = fn(spark, d)
      val cols = df.schema.fields.map(f => s"`${f.name}`")
      val c = df.selectExpr(
        s"bit_xor(xxhash64(struct(${cols.mkString(",")}))) AS checksum")
      val t = System.nanoTime(); val sum = c.collect()(0)
      val dt = (System.nanoTime() - t) / 1e9
      System.gc(); Thread.sleep(500)
      (dt, sum.getLong(0))
    }
    val times = runs.map(_._1).sorted
    println(f"[cbo] registered q_tpch7 (hinted) median ${times(1)}%.2f s " +
      f"(min ${times.head}%.2f, max ${times.last}%.2f) checksum=${runs.head._2}")
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }
}
