package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Aggregations + window functions (▲ extensions, SURVEY.md §2.2 — the
  * reference has no group-by or windows at all).
  *
  * Scale notes: `groupBy.agg` compiles to partial (map-side) HashAggregate →
  * shuffle on the group key → final HashAggregate, so the shuffle carries one
  * row per (partition, key), not per input row. `countDistinct` expands to a
  * two-phase distinct aggregate; for 100 TB cardinality estimation prefer
  * `approx_count_distinct` (HLL++, constant memory — registered as its own
  * query). Double sums are rounded at the declared decimal scale of the data
  * so the Spark-vs-DuckDB accumulation-order difference (~1e-10 relative)
  * can never cross a rounding boundary.
  */
object Aggregates {
  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-shaped pricing summary (filter + multi-agg group-by). */
  val q1Agg: Q = (s, d) =>
    Tables(s, d, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Exact distinct counting per group. */
  val aggDistinct: Q = (s, d) =>
    Tables(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_suppkey")).as("distinct_supps"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")

  /** HLL++ approximate distinct — the 100 TB path (constant memory per group;
    * no exact-distinct shuffle explosion). Not oracle-checked (approximate). */
  val aggApprox: Q = (s, d) =>
    Tables(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .orderBy("l_returnflag")

  /** ROLLUP: hierarchical subtotals + grand total. */
  val rollup: Q = (s, d) =>
    Tables(s, d, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** grouping_id / grouping markers over a rollup — distinguishes "NULL
    * because subtotal" from "NULL in the data". */
  val groupingId: Q = (s, d) =>
    Tables(s, d, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        grouping_id().cast("int").as("gid"),
        grouping(col("l_returnflag")).cast("int").as("g_flag"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** CUBE: all grouping-set combinations. */
  val cube: Q = (s, d) =>
    Tables(s, d, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  private def perCustomer = Window.partitionBy(col("o_custkey"))

  /** row_number / rank / dense_rank per customer (top-3 earliest orders).
    * The window shuffles once on o_custkey; the rank filter is evaluated
    * streaming over each sorted partition. */
  val windowRank: Q = (s, d) => {
    val w = perCustomer.orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables(s, d, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate")
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "rn", "rnk", "drnk")
      .orderBy("o_custkey", "rn")
  }

  /** Distribution window functions: percent_rank / cume_dist / ntile over a
    * total (tie-free) order within each customer. */
  val windowDist: Q = (s, d) => {
    val w = perCustomer.orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables(s, d, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .withColumn("quartile", ntile(4).over(w))
      .select("o_custkey", "o_orderkey", "pct_rank", "cume", "quartile")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Statistical aggregates: stddev / variance / correlation / covariance
    * (rounded at 4 — both engines' streaming moment updates agree to
    * ~1e-12 relative). */
  val statsAgg: Q = (s, d) =>
    Tables(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 4).as("covar_qty_disc"))
      .orderBy("l_returnflag")

  /** lag(): previous order price per customer + delta (exact double diff). */
  val windowLag: Q = (s, d) =>
    Tables(s, d, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(perCustomer.orderBy(col("o_orderkey"))))
      .withColumn("price_delta", col("o_totalprice") - col("prev_price"))
      .orderBy("o_custkey", "o_orderkey")

  /** Sliding-frame sum: 3-row moving total per customer. */
  val windowMovsum: Q = (s, d) =>
    Tables(s, d, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("movsum",
        round(sum(col("o_totalprice")).over(
          perCustomer.orderBy(col("o_orderkey")).rowsBetween(-2, Window.currentRow)), 2))
      .select("o_custkey", "o_orderkey", "movsum")
      .orderBy("o_custkey", "o_orderkey")

  /** Exact interpolated percentiles per group (the exact baseline; at 100 TB
    * use approx_percentile — the t-digest/KLL-style sketch — instead of the
    * full sort this implies). */
  val percentile: Q = (s, d) =>
    Tables(s, d, "orders")
      .groupBy("o_orderstatus")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.95)"), 2).as("p95"),
        count(lit(1)).as("cnt"))
      .orderBy("o_orderstatus")

  /** Sketch-based percentiles (the 100 TB path: bounded-memory mergeable
    * summaries instead of the full per-group sort q_percentile implies).
    * Approximate → rows-only check; bracketing vs exact asserted in tests
    * via the oracle-checked q_percentile. */
  val percentileApprox: Q = (s, d) =>
    Tables(s, d, "orders")
      .groupBy("o_orderstatus")
      .agg(
        approx_percentile(col("o_totalprice"), lit(0.5), lit(1000)).as("p50_approx"),
        approx_percentile(col("o_totalprice"), lit(0.95), lit(1000)).as("p95_approx"))
      .orderBy("o_orderstatus")

  /** Pivot: order counts by status × priority (pivot compiles to CASE-WHEN
    * aggregates — one shuffle, no transpose materialization). */
  val pivot: Q = (s, d) =>
    Tables(s, d, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .withColumnsRenamed(Map("F" -> "cnt_f", "O" -> "cnt_o", "P" -> "cnt_p"))
      .orderBy("o_orderpriority")

  /** Forced sort-merge join (`hint("merge")`): the 100 TB fact⋈fact shape —
    * both sides shuffle on the key and stream-merge; no in-memory hash table
    * to blow up. */
  val joinSortMerge: Q = (s, d) => {
    val li = Tables(s, d, "lineitem").select("l_orderkey", "l_extendedprice")
    val ord = Tables(s, d, "orders").select("o_orderkey", "o_orderstatus").hint("merge")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(round(sum(col("l_extendedprice")), 2).as("sum_price"), count(lit(1)).as("cnt"))
      .orderBy("o_orderstatus")
  }

  /** Skew-safe aggregation via salting: the hot-key pattern for 100 TB —
    * stage 1 groups on (key, salt) so one hot key spreads over 16 reducers'
    * partial aggregates; stage 2 merges the 16 partials per key. Results are
    * identical to a plain groupBy (the oracle IS the plain groupBy). Spark's
    * map-side partial aggregation covers mild skew already; explicit salting
    * is for keys hot enough to overwhelm a single final-agg reducer. */
  val saltedAgg: Q = (s, d) => {
    val salted = Tables(s, d, "lineitem")
      .withColumn("salt", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(16)))
      .groupBy("l_returnflag", "salt")
      .agg(sum(col("l_quantity")).as("pq"), count(lit(1)).as("pc"))
    salted.groupBy("l_returnflag")
      .agg(round(sum(col("pq")), 2).as("sum_qty"), sum(col("pc")).as("cnt"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, Q] = Map(
    "q1_agg" -> q1Agg,
    "q_salted_agg" -> saltedAgg,
    "q_percentile" -> percentile,
    "q_percentile_approx" -> percentileApprox,
    "q_pivot" -> pivot,
    "q_join_sortmerge" -> joinSortMerge,
    "q_agg_distinct" -> aggDistinct,
    "q_agg_approx" -> aggApprox,
    "q_rollup" -> rollup,
    "q_grouping_id" -> groupingId,
    "q_cube" -> cube,
    "q_window_rank" -> windowRank,
    "q_window_dist" -> windowDist,
    "q_stats_agg" -> statsAgg,
    "q_window_lag" -> windowLag,
    "q_window_movsum" -> windowMovsum,
  )

  val oracle: Map[String, String] = Map(
    "q_salted_agg" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty, CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_percentile" ->
      """SELECT o_orderstatus, round(quantile_cont(o_totalprice, 0.5), 2) AS p50, round(quantile_cont(o_totalprice, 0.95), 2) AS p95, CAST(count(*) AS BIGINT) AS cnt FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_pivot" ->
      """SELECT o_orderpriority, CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS cnt_f, CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS cnt_o, CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS cnt_p FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_join_sortmerge" ->
      """SELECT o_orderstatus, round(sum(l_extendedprice), 2) AS sum_price, CAST(count(*) AS BIGINT) AS cnt FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, round(sum(l_extendedprice), 2) AS sum_base_price, round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price, round(avg(l_quantity), 2) AS avg_qty, CAST(count(*) AS BIGINT) AS cnt FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q_agg_distinct" ->
      """SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS distinct_parts, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS distinct_supps, CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_grouping_id" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS cnt, CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid, CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS cnt, round(sum(o_totalprice), 2) AS sum_price FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q_window_dist" ->
      """SELECT o_custkey, o_orderkey, percent_rank() OVER w AS pct_rank, cume_dist() OVER w AS cume, CAST(ntile(4) OVER w AS INTEGER) AS quartile FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) ORDER BY o_custkey, o_orderkey""",
    "q_stats_agg" ->
      """SELECT l_returnflag, round(stddev_samp(l_quantity), 4) AS sd_qty, round(var_samp(l_quantity), 4) AS var_qty, round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price, round(covar_samp(l_quantity, l_discount), 4) AS covar_qty_disc FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, CAST(rn AS INTEGER) AS rn, CAST(rnk AS INTEGER) AS rnk, CAST(drnk AS INTEGER) AS drnk FROM (SELECT o_custkey, o_orderkey, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn, rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rnk, dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS drnk FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, prev_price, o_totalprice - prev_price AS price_delta FROM (SELECT o_custkey, o_orderkey, o_totalprice, lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_price FROM orders) t ORDER BY o_custkey, o_orderkey""",
    "q_window_movsum" ->
      """SELECT o_custkey, o_orderkey, round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS movsum FROM orders ORDER BY o_custkey, o_orderkey""",
  )
}
