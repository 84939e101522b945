package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's relational surface, Spark-first.
  *
  * The reference hand-wires one physical plan — Scan → Filter →
  * HashJoin(build/probe) → Limit+Offset (`/root/reference/src/main.rs:29-48`,
  * operators `/root/reference/src/executor/mod.rs:250-466`) — and runs it on
  * two pipelines. Here every query is a declarative DataFrame plan: Catalyst
  * performs the pushdown/pruning the reference bakes in by hand, and
  * WholeStageCodegen supplies the fused push loop the reference implements as
  * `PipelineExecutor` (`/root/reference/src/executor/mod.rs:84-212`).
  *
  * Scale notes (100 TB): joins against the small dimension tables
  * (region/nation/customer/part/supplier) broadcast — no shuffle of the fact
  * table; the flagship filter sits on the build side *before* the join
  * (mirroring the reference's wiring, `/root/reference/src/main.rs:31-32`) so
  * the hash table stays small; every oracle-checked query carries a total
  * `orderBy` on a unique key for determinism (SURVEY.md §7.5).
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** Flagship: scan → filter(build) → inner hash equi-join → offset/limit.
    * Mirrors `/root/reference/src/main.rs:29-48` (filter `>= const` on the
    * build side `src/executor/mod.rs:295`, offset=100/limit=200
    * `src/main.rs:35`). */
  val flagship: Q = (s, d) => {
    val li = Tables(s, d, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    val ord = Tables(s, d, "orders")
      .filter(col("o_totalprice") >= 250000.0)
      .select("o_orderkey", "o_totalprice")
    li.join(ord, col("l_orderkey") === col("o_orderkey"), "inner")
      .select("l_orderkey", "l_linenumber", "l_quantity", "o_totalprice")
      // (l_orderkey, l_linenumber) is NOT unique in the driver data — sort by
      // every output column so the offset/limit window is deterministic.
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "o_totalprice")
      .offset(100).limit(200)
  }

  /** TableScan (ref `src/executor/mod.rs:250-276`): full projection scan. */
  val scan: Q = (s, d) =>
    Tables(s, d, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey")

  /** Scan + count — exercises a column-less aggregate over the full table. */
  val scanCount: Q = (s, d) =>
    Tables(s, d, "lineitem").agg(count(lit(1)).as("cnt"))

  /** Filter (ref `src/executor/mod.rs:278-308`) with a compound predicate —
    * the reference only supports one hardcoded `>= const` (`:295`). Both
    * conjuncts reach the parquet scan as PushedFilters. */
  val filter: Q = (s, d) =>
    Tables(s, d, "lineitem")
      .filter(col("l_quantity") >= 25.0 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")

  /** Projection with a computed column (absent in the reference — operators
    * pick output columns implicitly, SURVEY.md §2.2). Row-level arithmetic is
    * bit-exact across engines, so no rounding. */
  val project: Q = (s, d) =>
    Tables(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("l_orderkey", "l_linenumber", "revenue")

  /** Limit+Offset (ref `src/executor/mod.rs:383-466`) with the *intended* SQL
    * semantics — the reference's cursor math is only valid for its demo
    * constants (author comment "just hard code for test", `:417`). */
  val limitOffset: Q = (s, d) =>
    Tables(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
      .offset(500).limit(300)

  /** Inner hash equi-join (ref `src/executor/mod.rs:310-381`). customer is a
    * dimension → Spark broadcasts it (no fact-table shuffle at scale). */
  val joinInner: Q = (s, d) => {
    val ord = Tables(s, d, "orders").select("o_orderkey", "o_custkey")
    val cust = Tables(s, d, "customer").select("c_custkey", "c_name", "c_mktsegment")
    ord.join(cust, col("o_custkey") === col("c_custkey"), "inner")
      .select("o_orderkey", "c_name", "c_mktsegment")
      .orderBy("o_orderkey")
  }

  /** Left outer join (▲ extension, SURVEY.md §2.2 — absent in reference). */
  val joinLeft: Q = (s, d) => {
    val ord = Tables(s, d, "orders").select("o_orderkey", "o_custkey")
    val rich = Tables(s, d, "customer")
      .filter(col("c_acctbal") > 5000.0)
      .select("c_custkey", "c_acctbal")
    ord.join(rich, col("o_custkey") === col("c_custkey"), "left")
      .select("o_orderkey", "c_custkey", "c_acctbal")
      .orderBy("o_orderkey")
  }

  /** Left-semi join: orders having any high-quantity line. */
  val joinSemi: Q = (s, d) => {
    val big = Tables(s, d, "lineitem")
      .filter(col("l_quantity") > 45.0).select("l_orderkey")
    Tables(s, d, "orders").select("o_orderkey", "o_totalprice")
      .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .orderBy("o_orderkey")
  }

  /** Left-anti join: parts never ordered. */
  val joinAnti: Q = (s, d) => {
    val li = Tables(s, d, "lineitem").select("l_partkey")
    Tables(s, d, "part").select("p_partkey")
      .join(li, col("p_partkey") === col("l_partkey"), "left_anti")
      .orderBy("p_partkey")
  }

  /** Explicit broadcast-hint join + partial (map-side) aggregation — the
    * 100 TB shape: fact table never shuffles for the join, only for the
    * (pre-combined) group-by. */
  val joinBroadcast: Q = (s, d) => {
    val li = Tables(s, d, "lineitem").select("l_partkey", "l_quantity")
    val pt = Tables(s, d, "part")
      .filter(col("p_size") < 25).select("p_partkey", "p_brand")
    li.join(Hints.dimBroadcast(pt), col("l_partkey") === col("p_partkey"), "inner")
      .groupBy("p_brand")
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("cnt"))
      .orderBy("p_brand")
  }

  /** Multi-way star join: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region with
    * revenue aggregation. All dims broadcast; only the orders⋈lineitem edge
    * shuffles (on the join key) at scale. */
  val joinMultiway: Q = (s, d) => {
    val li = Tables(s, d, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    val ord = Tables(s, d, "orders").select("o_orderkey", "o_custkey")
    val cust = Tables(s, d, "customer").select("c_custkey", "c_nationkey")
    val nat = Tables(s, d, "nation").select("n_nationkey", "n_name", "n_regionkey")
    val reg = Tables(s, d, "region").select("r_regionkey", "r_name")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Hints.dimBroadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"),
        count(lit(1)).as("cnt"))
      .orderBy("r_name", "n_name")
  }

  /** UNION ALL (▲ set ops, SURVEY.md §2.2). */
  val union: Q = (s, d) => {
    val c = Tables(s, d, "customer")
    c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      .union(c.filter(col("c_acctbal") > 5000.0).select("c_custkey"))
      .orderBy("c_custkey")
  }

  /** INTERSECT (distinct). */
  val intersect: Q = (s, d) => {
    val o = Tables(s, d, "orders").select(col("o_custkey").as("custkey"))
    val c = Tables(s, d, "customer").filter(col("c_acctbal") > 5000.0)
      .select(col("c_custkey").as("custkey"))
    o.intersect(c).orderBy("custkey")
  }

  /** EXCEPT (distinct): parts never ordered, as a set op. */
  val except: Q = (s, d) => {
    val p = Tables(s, d, "part").select("p_partkey")
    val li = Tables(s, d, "lineitem").select("l_partkey")
    p.except(li).orderBy("p_partkey")
  }

  /** Cross join (the one legitimate use: tiny × tiny dimension grids). */
  val crossJoinGrid: Q = (s, d) => {
    val r = Tables(s, d, "region").select(col("r_name"))
    val n = Tables(s, d, "nation").select(col("n_name"))
    r.crossJoin(n).orderBy("r_name", "n_name")
  }

  /** HAVING: post-aggregation filter (groupBy → agg → filter). */
  val having: Q = (s, d) =>
    Tables(s, d, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .filter(col("cnt") >= 15)
      .orderBy("o_custkey")

  /** Interval arithmetic: shifted event-time columns. */
  val interval: Q = (s, d) =>
    Tables(s, d, "orders")
      .select(
        col("o_orderkey"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_date"),
        (col("o_orderdate") - expr("INTERVAL 1 HOUR")).as("cutoff"))
      .orderBy("o_orderkey")

  /** EXCEPT ALL — multiset difference (duplicates preserved minus
    * matched occurrences). */
  val exceptAll: Q = (s, d) => {
    val o = Tables(s, d, "orders").select(col("o_custkey").as("custkey"))
    val c = Tables(s, d, "customer").filter(col("c_acctbal") > 5000.0)
      .select(col("c_custkey").as("custkey"))
    o.exceptAll(c).orderBy("custkey")
  }

  /** Top-k: orderBy + limit compiles to TakeOrderedAndProject — per-partition
    * heap then a k-row merge on the driver; no global sort at scale. */
  val topk: Q = (s, d) =>
    Tables(s, d, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** SQL-text entry point (`spark.sql`) with a scalar subquery — the same
    * engine surface as the DataFrame API, through the parser/analyzer. */
  val sqlScalarSubquery: Q = (s, d) => {
    Tables(s, d, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_orderstatus, count(*) AS cnt
        |FROM orders_v
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders_v)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  /** Recursive CTE (Spark 4's WITH RECURSIVE): a month spine generated by
    * recursion — anchor + step UNION ALL until the fixture's last order
    * month — left-joined to per-month order counts, zero-filling empty
    * months. The recursion itself is driver-cheap (~80 spine rows, one
    * UNION ALL node per unrolled step); the fact side stays one
    * map-side-combined groupBy, so at 100 TB the spine join is a broadcast
    * of the spine, never a shuffle of the fact beyond its aggregate. The
    * q_gapfill twin builds the same spine with `sequence()`; this is the
    * SQL-standard-recursion route to it. */
  val sqlRecursive: Q = (s, d) => {
    Tables(s, d, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """WITH RECURSIVE months(m) AS (
        |  SELECT CAST('1995-01-01 00:00:00' AS TIMESTAMP)
        |  UNION ALL
        |  SELECT m + INTERVAL '1' MONTH FROM months
        |  WHERE m < TIMESTAMP '2001-08-01 00:00:00'
        |)
        |SELECT m, coalesce(cnt, CAST(0 AS BIGINT)) AS n_orders
        |FROM months
        |LEFT JOIN (SELECT date_trunc('MONTH', o_orderdate) AS mo,
        |                  count(*) AS cnt
        |           FROM orders_v GROUP BY 1) o
        |  ON m = mo
        |ORDER BY m""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "q_sql_scalar_subquery" -> sqlScalarSubquery,
    "q_sql_recursive" -> sqlRecursive,
    "q_flagship" -> flagship,
    "q_scan" -> scan,
    "q_scan_count" -> scanCount,
    "q_filter" -> filter,
    "q_project" -> project,
    "q_limit_offset" -> limitOffset,
    "q_join_inner" -> joinInner,
    "q_join_left" -> joinLeft,
    "q_join_semi" -> joinSemi,
    "q_join_anti" -> joinAnti,
    "q_join_broadcast" -> joinBroadcast,
    "q_join_multiway" -> joinMultiway,
    "q_union" -> union,
    "q_intersect" -> intersect,
    "q_except" -> except,
    "q_except_all" -> exceptAll,
    "q_topk" -> topk,
    "q_cross_join" -> crossJoinGrid,
    "q_having" -> having,
    "q_interval" -> interval,
  )

  val oracle: Map[String, String] = Map(
    "q_sql_scalar_subquery" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt FROM orders WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_sql_recursive" ->
      """WITH RECURSIVE months(m) AS (SELECT TIMESTAMP '1995-01-01 00:00:00' UNION ALL SELECT m + INTERVAL 1 MONTH FROM months WHERE m < TIMESTAMP '2001-08-01 00:00:00') SELECT m, coalesce(cnt, 0) AS n_orders FROM months LEFT JOIN (SELECT date_trunc('month', o_orderdate) AS mo, CAST(count(*) AS BIGINT) AS cnt FROM orders GROUP BY 1) o ON m = mo ORDER BY m""",
    "q_flagship" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE o_totalprice >= 250000.0 ORDER BY l_orderkey, l_linenumber, l_quantity, o_totalprice LIMIT 200 OFFSET 100""",
    "q_scan" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey""",
    "q_scan_count" ->
      """SELECT CAST(count(*) AS BIGINT) AS cnt FROM lineitem""",
    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem WHERE l_quantity >= 25.0 AND l_returnflag = 'R' ORDER BY l_orderkey, l_linenumber, l_quantity""",
    "q_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice * (1.0 - l_discount) AS revenue FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue""",
    "q_limit_offset" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 300 OFFSET 500""",
    "q_join_inner" ->
      """SELECT o_orderkey, c_name, c_mktsegment FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey""",
    "q_join_left" ->
      """SELECT o_orderkey, c_custkey, c_acctbal FROM orders LEFT JOIN (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000.0) c ON o_custkey = c_custkey ORDER BY o_orderkey""",
    "q_join_semi" ->
      """SELECT o_orderkey, o_totalprice FROM orders WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45.0) ORDER BY o_orderkey""",
    "q_join_anti" ->
      """SELECT p_partkey FROM part WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey) ORDER BY p_partkey""",
    "q_join_broadcast" ->
      """SELECT p_brand, round(sum(l_quantity), 2) AS sum_qty, CAST(count(*) AS BIGINT) AS cnt FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_size < 25 GROUP BY p_brand ORDER BY p_brand""",
    "q_join_multiway" ->
      """SELECT r_name, n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue, CAST(count(*) AS BIGINT) AS cnt FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q_union" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING' UNION ALL SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0 ORDER BY c_custkey""",
    "q_intersect" ->
      """SELECT o_custkey AS custkey FROM orders INTERSECT SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000.0 ORDER BY custkey""",
    "q_except" ->
      """SELECT p_partkey FROM part EXCEPT SELECT l_partkey FROM lineitem ORDER BY p_partkey""",
    "q_except_all" ->
      """SELECT o_custkey AS custkey FROM orders EXCEPT ALL SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000.0 ORDER BY custkey""",
    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name""",
    "q_having" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt, round(sum(o_totalprice), 2) AS sum_price FROM orders GROUP BY o_custkey HAVING count(*) >= 15 ORDER BY o_custkey""",
    "q_interval" ->
      """SELECT o_orderkey, CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date, CAST(o_orderdate - INTERVAL 1 HOUR AS TIMESTAMP) AS cutoff FROM orders ORDER BY o_orderkey""",
  )
}
