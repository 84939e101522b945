package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Classic TPC-H-shaped analytics over the driver's star schema — the
  * multiway-join workloads a user of the reference's capability surface
  * (hash equi-join + filter + limit, `/root/reference/src/executor/
  * mod.rs:278-381,383-466`) would actually run at 100 TB, generalized from
  * the reference's single two-table plan (`/root/reference/src/main.rs:
  * 29-48`) to filtered multiway stars. (The fixture schema has no partsupp
  * and uses o_orderpriority instead of o_shippriority; queries are
  * adapted.)
  *
  * Scale shapes: dims (region/nation/customer-filtered) broadcast; the one
  * unavoidable shuffle is fact⋈fact on orderkey; every revenue sort orders
  * by the ROUNDED measure plus a unique tiebreak key so top-k is
  * deterministic in both engines.
  */
object Tpch {
  type Q = (SparkSession, String) => DataFrame

  private def ts(s: String) = lit(s + " 00:00:00").cast("timestamp")

  /** Q3 shape — shipping-priority revenue: unshipped-as-of-date orders of
    * one market segment, top-10 by revenue. */
  val tpch3: Q = (s, d) => {
    val cust = Tables(s, d, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Tables(s, d, "orders")
      .filter(col("o_orderdate") < ts("1998-06-01"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables(s, d, "lineitem")
      .filter(col("l_shipdate") > ts("1998-06-01"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
  }

  /** Q5 shape — local-supplier volume per nation in one region and year
    * (customer and supplier in the same nation). */
  val tpch5: Q = (s, d) => {
    val region = Tables(s, d, "region").filter(col("r_name") === "ASIA")
    val nation = Tables(s, d, "nation")
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = Tables(s, d, "customer").select("c_custkey", "c_nationkey")
    val supp = Tables(s, d, "supplier").select("s_suppkey", "s_nationkey")
    val ord = Tables(s, d, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
      .select("o_orderkey", "o_custkey")
    val li = Tables(s, d, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey")
        && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy("n_name")
  }

  /** Q10 shape — returned-item reporting: top-20 customers by lost revenue
    * in one quarter. */
  val tpch10: Q = (s, d) => {
    val ord = Tables(s, d, "orders")
      .filter(col("o_orderdate") >= ts("1997-01-01") && col("o_orderdate") < ts("1997-04-01"))
      .select("o_orderkey", "o_custkey")
    val li = Tables(s, d, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val cust = Tables(s, d, "customer")
      .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val nation = Tables(s, d, "nation").select("n_nationkey", "n_name")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
      .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
  }

  /** Salt-replicated skew join: the fact side salts its join key; the dim
    * side replicates each row across all S salts (explode of a literal
    * array — no shuffle, S× the small side only). One hot orderkey then
    * spreads over S reducers instead of melting one. Result is identical to
    * the plain join — the oracle IS the plain join. AQE's runtime skew
    * splitting covers moderate skew; explicit salting is the insurance for
    * keys hot enough to overwhelm a single task even after splitting. */
  val saltedJoin: Q = (s, d) => {
    val S = 8
    val li = Tables(s, d, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
      .withColumn("salt", pmod(hash(col("l_linenumber"), col("l_partkey")), lit(S)))
    val ord = Tables(s, d, "orders")
      .select("o_orderkey", "o_orderpriority")
      .withColumn("salt", explode(array((0 until S).map(lit): _*)))
    li.join(ord, col("l_orderkey") === col("o_orderkey") && li("salt") === ord("salt"))
      .groupBy("o_orderpriority")
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("cnt"))
      .orderBy("o_orderpriority")
  }

  /** Q17 shape — small-quantity-order revenue: lineitems of one brand's
    * parts whose quantity is below 20% of that part's average quantity.
    * The correlated AVG subquery becomes one groupBy on the fact's join key
    * (a single shuffle, reused by the join back); the brand filter pushes
    * into the part scan and broadcasts. The `qty < 0.2 * avg` threshold is
    * evaluated in exact integer arithmetic (`5 * qty * cnt < sum_qty` on
    * longs — quantities are integral) so the boundary can never flip on
    * float summation order, in either engine. */
  val tpch17: Q = (s, d) => {
    val pa = Tables(s, d, "part")
      .filter(col("p_brand") === "Brand#4").select("p_partkey")
    val li = Tables(s, d, "lineitem")
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        col("l_extendedprice"))
    val avgq = li.groupBy("l_partkey")
      .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("cnt"))
      .withColumnRenamed("l_partkey", "a_partkey")
    li.join(broadcast(pa), col("l_partkey") === col("p_partkey"))
      .join(avgq, col("l_partkey") === col("a_partkey"))
      .filter(col("qty") * lit(5L) * col("cnt") < col("sum_qty"))
      .agg(round(sum(col("l_extendedprice")), 2).as("total_price"),
        (round(sum(col("l_extendedprice")), 2) / lit(7)).as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }

  /** Q18 shape — large-volume orders: orders whose total lineitem quantity
    * exceeds a threshold, with their customer. The HAVING threshold runs on
    * exact long sums (quantities are integral); the aggregated order list is
    * tiny relative to the fact table, so the customer edge broadcasts and
    * the only real shuffle is the orderkey groupBy. */
  val tpch18: Q = (s, d) => {
    val big = Tables(s, d, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
      .filter(col("sum_qty") > 250L)
    val ord = Tables(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = Tables(s, d, "customer").select("c_custkey", "c_name")
    big.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
        "o_totalprice", "sum_qty")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Q7 shape — volume shipping: bilateral trade revenue between two
    * nations by year (supplier in one, customer in the other, either
    * direction). The two nation dims filter-then-broadcast into supplier
    * and customer, shrinking both to 2/25 BEFORE they reach the fact join,
    * so the only real shuffle is lineitem⋈orders on orderkey; the
    * direction filter is an OR over the two (supp, cust) name pairs. At
    * 100 TB the nation-filtered customer side may outgrow a broadcast —
    * then it shuffle-joins on custkey like any dim promoted to fact size. */
  val tpch7: Q = (s, d) => {
    val pair = Seq("NATION_1", "NATION_2")
    val n1 = Tables(s, d, "nation").filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables(s, d, "nation").filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val supp = Tables(s, d, "supplier").select("s_suppkey", "s_nationkey")
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .select("s_suppkey", "supp_nation")
    val cust = Tables(s, d, "customer").select("c_custkey", "c_nationkey")
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .select("c_custkey", "cust_nation")
    val ord = Tables(s, d, "orders").select("o_orderkey", "o_custkey")
    val li = Tables(s, d, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1998-01-01"))
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
        || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Q12 shape — priority counts per line status in a ship-date year: the
    * conditional two-way CASE aggregation over the fact⋈fact orderkey join.
    * (The fixture schema has no l_shipmode/l_commitdate/l_receiptdate, so
    * the grouping key is l_linestatus and the late-delivery predicate
    * becomes the ship-date year window — the join + conditional-sum shape
    * is what Q12 exercises.) Exact integer CASE sums → bit-stable. */
  val tpch12: Q = (s, d) => {
    val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    val ord = Tables(s, d, "orders").select("o_orderkey", "o_orderpriority")
    val li = Tables(s, d, "lineitem")
      .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01"))
      .select("l_orderkey", "l_linestatus")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!urgent, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** Q6 shape — forecast revenue change: pure scan-filter-aggregate with a
    * three-way range predicate, no join at all. The entire predicate pushes
    * into the parquet scan (row-group skipping on shipdate/discount/quantity
    * min-max stats), so at 100 TB this reads only the row groups of one
    * ship-year — the canonical "pushdown is the whole query" benchmark. */
  val tpch6: Q = (s, d) =>
    Tables(s, d, "lineitem")
      .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01")
        && col("l_discount") >= 0.05 && col("l_discount") <= 0.07
        && col("l_quantity") < 24.0)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))

  /** Q14 shape — promotion-effect ratio: lineitem⋈part with a conditional
    * numerator. The part dim broadcasts; the percentage is computed from the
    * two ROUNDED sums (identical doubles in both engines) so the ratio can
    * never flip on summation order. */
  val tpch14: Q = (s, d) => {
    val pa = Tables(s, d, "part").select("p_partkey", "p_type")
    val li = Tables(s, d, "lineitem")
      .filter(col("l_shipdate") >= ts("1997-06-01") && col("l_shipdate") < ts("1997-09-01"))
      .select("l_partkey", "l_extendedprice", "l_discount")
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(broadcast(pa), col("l_partkey") === col("p_partkey"))
      .agg(round(sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))), 2).as("promo_revenue"),
        round(sum(rev), 2).as("total_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
        round(lit(100.0) * col("promo_revenue") / col("total_revenue"), 4).as("promo_pct"))
  }

  /** Q19 shape — discounted revenue under an OR-of-ANDs predicate (three
    * brand/size/quantity bands). The join key equality plus the whole
    * disjunction sit in ONE join condition; Catalyst extracts the
    * common `l_partkey = p_partkey` equi-key (broadcast hash join, not a
    * nested loop) and pushes the per-side conjuncts
    * (`p_size >= 1`, quantity bounds) down into each scan. */
  val tpch19: Q = (s, d) => {
    val pa = Tables(s, d, "part").select("p_partkey", "p_brand", "p_size")
    val li = Tables(s, d, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val band = (brand: String, qlo: Double, qhi: Double, smax: Int) =>
      col("p_brand") === brand && col("l_quantity") >= qlo && col("l_quantity") <= qhi &&
        col("p_size") >= 1 && col("p_size") <= smax
    li.join(broadcast(pa), col("l_partkey") === col("p_partkey") &&
        (band("Brand#1", 1, 11, 5) || band("Brand#2", 10, 20, 10) || band("Brand#3", 20, 30, 15)))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** One-pass column profile (the data-quality screening scan every
    * pipeline runs before training ingestion): row count, per-column
    * min/max/rounded-sum, null count, exact distinct. */
  val profile: Q = (s, d) =>
    Tables(s, d, "lineitem")
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        sum(col("l_discount").isNull.cast("long")).as("null_disc"),
        countDistinct(col("l_returnflag")).as("n_flags"))

  val queries: Map[String, Q] = Map(
    "q_tpch3" -> tpch3,
    "q_tpch5" -> tpch5,
    "q_tpch7" -> tpch7,
    "q_tpch10" -> tpch10,
    "q_tpch12" -> tpch12,
    "q_tpch6" -> tpch6,
    "q_tpch14" -> tpch14,
    "q_tpch19" -> tpch19,
    "q_tpch17" -> tpch17,
    "q_tpch18" -> tpch18,
    "q_salted_join" -> saltedJoin,
    "q_profile" -> profile,
  )

  val oracle: Map[String, String] = Map(
    "q_tpch3" ->
      """SELECT l_orderkey, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_orderpriority FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00' AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00' GROUP BY l_orderkey, o_orderdate, o_orderpriority ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q_tpch5" ->
      """SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' GROUP BY n_name ORDER BY n_name""",
    "q_tpch7" ->
      """SELECT supp_nation, cust_nation, l_year, revenue FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, CAST(year(l_shipdate) AS INTEGER) AS l_year, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN supplier ON l_suppkey = s_suppkey JOIN customer ON o_custkey = c_custkey JOIN nation n1 ON s_nationkey = n1.n_nationkey JOIN nation n2 ON c_nationkey = n2.n_nationkey WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' GROUP BY 1, 2, 3) t ORDER BY supp_nation, cust_nation, l_year""",
    "q_tpch12" ->
      """SELECT l_linestatus, CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' GROUP BY l_linestatus ORDER BY l_linestatus""",
    "q_tpch6" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, CAST(count(*) AS BIGINT) AS n_items FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0""",
    "q_tpch14" ->
      """WITH a AS (SELECT round(sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END), 2) AS promo_revenue, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue FROM lineitem JOIN part ON l_partkey = p_partkey WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-09-01 00:00:00') SELECT promo_revenue, total_revenue, round(100.0 * promo_revenue / total_revenue, 4) AS promo_pct FROM a""",
    "q_tpch19" ->
      """SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue, CAST(count(*) AS BIGINT) AS n_items FROM lineitem JOIN part ON l_partkey = p_partkey WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5) OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10) OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)""",
    "q_tpch10" ->
      """SELECT c_custkey, c_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue, c_acctbal, n_name FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey WHERE l_returnflag = 'R' AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00' GROUP BY c_custkey, c_name, c_acctbal, n_name ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "q_tpch17" ->
      """SELECT round(sum(l_extendedprice), 2) AS total_price, round(sum(l_extendedprice), 2) / 7 AS avg_yearly, CAST(count(*) AS BIGINT) AS n_small FROM lineitem JOIN part ON l_partkey = p_partkey JOIN (SELECT l_partkey AS a_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, count(*) AS cnt FROM lineitem GROUP BY 1) a ON l_partkey = a_partkey WHERE p_brand = 'Brand#4' AND CAST(l_quantity AS BIGINT) * 5 * cnt < sum_qty""",
    "q_tpch18" ->
      """SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_totalprice, sum_qty FROM (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty FROM lineitem GROUP BY 1 HAVING sum_qty > 250) b JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "q_salted_join" ->
      """SELECT o_orderpriority, round(sum(l_quantity), 2) AS sum_qty, CAST(count(*) AS BIGINT) AS cnt FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_profile" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows, min(l_quantity) AS min_qty, max(l_quantity) AS max_qty, round(sum(l_extendedprice), 2) AS sum_price, CAST(coalesce(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS null_disc, CAST(count(DISTINCT l_returnflag) AS BIGINT) AS n_flags FROM lineitem""",
  )
}
