package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar string / math / conditional / date / JSON functions (▲ SURVEY.md
  * §2.2 — the reference's entire expression surface is one hardcoded integer
  * `>=`, `/root/reference/src/executor/mod.rs:295`).
  *
  * All of these are codegen'd Catalyst expressions inside WholeStageCodegen —
  * no UDFs anywhere in this file. Math picks only IEEE-exact ops (`sqrt`,
  * `*`, `-`, `floor`, `abs`, `%`) so raw doubles compare bit-equal against
  * the DuckDB oracle without rounding.
  */
object Scalars {
  type Q = (SparkSession, String) => DataFrame

  /** String functions: lower/length/substring/concat. */
  val string: Q = (s, d) =>
    Tables(s, d, "customer")
      .select(
        col("c_custkey"),
        lower(col("c_name")).as("lname"),
        length(col("c_name")).as("name_len"),
        substring(col("c_name"), 1, 5).as("prefix"),
        concat(col("c_mktsegment"), lit("#"), col("c_name")).as("tagged"))
      .orderBy("c_custkey")

  /** Math functions (IEEE-exact only — see object doc). */
  val math: Q = (s, d) =>
    Tables(s, d, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        sqrt(col("l_extendedprice")).as("sqrt_price"),
        floor(col("l_quantity") * (lit(1.0) + col("l_tax"))).as("qty_tax_floor"),
        abs(col("l_discount") - lit(0.05)).as("disc_dev"),
        (col("l_orderkey") % 7).as("mod7"))
      .orderBy("l_orderkey", "l_linenumber", "sqrt_price", "qty_tax_floor", "disc_dev")

  /** CASE WHEN bucketing + aggregation. */
  val caseWhen: Q = (s, d) =>
    Tables(s, d, "orders")
      .select(
        when(col("o_totalprice") < 100000.0, "low")
          .when(col("o_totalprice") < 300000.0, "mid")
          .otherwise("high").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("bucket")

  /** Date functions: year/month extraction + group-by. */
  val date: Q = (s, d) =>
    Tables(s, d, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy("yr", "mo")

  /** JSON extraction over events.props (`{"k": 87}` strings). */
  val json: Q = (s, d) =>
    Tables(s, d, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"))
      .orderBy("event_type")

  /** Event-time tumbling aggregation in batch (the streaming twin lives in
    * graft.streaming.Streams with a real watermark). */
  val eventsHourly: Q = (s, d) =>
    Tables(s, d, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy("hour")

  /** from_json into a typed MapType + map access — the structured twin of
    * get_json_object (schema enforced at parse, codegen'd access). */
  val fromJson: Q = (s, d) =>
    Tables(s, d, "events")
      .withColumn("kv",
        from_json(col("props"), org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")))
      .select(
        col("event_id"),
        element_at(col("kv"), "k").as("k"),
        size(map_keys(col("kv"))).as("n_keys"))
      .orderBy("event_id")

  /** Batch session windows (30-min gap) per user — `session_window` merges
    * an event into the current session while ts < last_ts + gap. The oracle
    * expresses the same semantics as gaps-and-islands SQL (new session when
    * the consecutive gap is >= the timeout). */
  val sessionWindow: Q = (s, d) =>
    Tables(s, d, "events")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"))
      .select(col("user_id"), col("n_events"), col("session_start"))
      .orderBy("user_id", "session_start")

  /** Null-handling functions over an outer-join's null side: coalesce,
    * isnull flags, nullif. */
  val nullFns: Q = (s, d) => {
    val ord = Tables(s, d, "orders").select("o_orderkey", "o_custkey")
    val rich = Tables(s, d, "customer")
      .filter(col("c_acctbal") > 5000.0)
      .select("c_custkey", "c_acctbal")
    ord.join(rich, col("o_custkey") === col("c_custkey"), "left")
      .select(
        col("o_orderkey"),
        coalesce(col("c_acctbal"), lit(0.0)).as("acctbal_or_zero"),
        col("c_custkey").isNull.as("is_poor"),
        nullif(col("o_custkey") % 2, lit(0)).as("odd_or_null"))
      .orderBy("o_orderkey")
  }

  /** Date arithmetic: days from order to first shipment. */
  val dateArith: Q = (s, d) => {
    val ord = Tables(s, d, "orders").select("o_orderkey", "o_orderdate")
    val li = Tables(s, d, "lineitem").select("l_orderkey", "l_shipdate")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey")
      .agg(min(col("l_shipdate")).as("first_ship"),
        datediff(min(col("l_shipdate")), first(col("o_orderdate"))).as("days_to_ship"))
      .orderBy("o_orderkey")
  }

  /** Time-series gap fill: a dense hourly spine (sequence + explode over the
    * observed range) left-joined to the sparse aggregate, empty hours
    * zero-filled — the standard densification step before windowed
    * time-series features. */
  val gapFill: Q = (s, d) => {
    val ev = Tables(s, d, "events")
    val hourly = ev.groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("cnt"))
    val spine = ev
      .agg(min(date_trunc("hour", col("ts"))).as("mn"), max(date_trunc("hour", col("ts"))).as("mx"))
      .select(explode(expr("sequence(mn, mx, interval 1 hour)")).as("hour"))
    spine.join(hourly, Seq("hour"), "left")
      .select(col("hour"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy("hour")
  }

  /** Map higher-order functions over the parsed props map. */
  val mapFns: Q = (s, d) =>
    Tables(s, d, "events")
      .withColumn("kv",
        from_json(col("props"), org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")))
      .select(
        col("event_id"),
        element_at(transform_values(col("kv"), (_, v) => v * 2), "k").as("k2"),
        size(map_filter(col("kv"), (_, v) => v > 50)).as("n_big"))
      .orderBy("event_id")

  /** Second string batch: pad/trim/replace/reverse/repeat. */
  val string2: Q = (s, d) =>
    Tables(s, d, "customer")
      .select(
        col("c_custkey"),
        lpad(col("c_mktsegment"), 12, ".").as("padded"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
        reverse(col("c_mktsegment")).as("rev"),
        repeat(substring(col("c_name"), 1, 2), 3).as("rep"))
      .orderBy("c_custkey")

  /** Conditional aggregation: count_if / FILTER-style sums. */
  val countIf: Q = (s, d) =>
    Tables(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count_if(col("l_quantity") > 25.0).as("n_bulk"),
        round(sum(when(col("l_discount") > 0.05, col("l_extendedprice")).otherwise(0.0)), 2).as("disc_price"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")

  /** Histogram: fixed-width value bucketing + counts. */
  val histogram: Q = (s, d) =>
    Tables(s, d, "orders")
      .select(width_bucket(col("o_totalprice"), lit(0.0), lit(500000.0), lit(10)).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("bucket")

  /** Calendar part extraction (dow/quarter/doy/end-of-month) — the
    * time-bucketing vocabulary for partition keys. Spark's dayofweek is
    * 1=Sunday; the oracle shifts DuckDB's 0=Sunday to match. */
  val dateParts: Q = (s, d) =>
    Tables(s, d, "orders")
      .select(
        col("o_orderkey"),
        dayofweek(col("o_orderdate")).as("dow"),
        quarter(col("o_orderdate")).as("qtr"),
        dayofyear(col("o_orderdate")).as("doy"),
        last_day(col("o_orderdate")).as("eom"))
      .orderBy("o_orderkey")

  /** Ordered string aggregation (sorted collect → join). */
  val stringAgg: Q = (s, d) =>
    Tables(s, d, "nation")
      .groupBy("n_regionkey")
      .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"))
      .orderBy("n_regionkey")

  /** Ordered conversion funnel (view → click-after-view →
    * purchase-after-click): each step's cohort is the min event time AFTER
    * the previous step's min — the product-analytics staple. Three
    * aggregates chained on user_id: every join and groupBy keys on the
    * same user_id, so Spark reuses ONE hash partitioning across the whole
    * chain (no re-shuffle per step at scale); events are never
    * self-joined on anything wider than the user key. Timestamps truncate
    * to microseconds in BOTH engines (the parquet is nanos; Spark's native
    * precision is micros) so step comparisons can't flip on sub-micro
    * ordering. */
  val funnel: Q = (s, d) => {
    val ev = Tables(s, d, "events").select(col("user_id"), col("event_type"), col("ts"))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val t2 = ev.filter(col("event_type") === "click")
      .join(t1, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val t3 = ev.filter(col("event_type") === "purchase")
      .join(t2, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    t1.agg(lit("1_view").as("step"), count(lit(1)).as("n_users"))
      .unionAll(t2.agg(lit("2_click").as("step"), count(lit(1)).as("n_users")))
      .unionAll(t3.agg(lit("3_purchase").as("step"), count(lit(1)).as("n_users")))
      .orderBy("step")
  }

  /** Weekly cohort retention: users bucketed by first-seen week, counted in
    * every later week they were active — the (cohort_week, week_offset) →
    * users matrix. Two aggregates over the fact (first-seen and distinct
    * active weeks), one join back on user_id; at scale both shuffles key on
    * user_id and the matrix is |weeks|² rows. Offsets are exact integer
    * day-diffs / 7 (weeks are 7-day aligned by date_trunc in both
    * engines). */
  val cohortRetention: Q = (s, d) => {
    val ev = Tables(s, d, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val firstSeen = ev.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
    val active = ev.distinct()
    active.join(firstSeen, "user_id")
      .groupBy(col("cohort_wk"),
        (datediff(col("wk"), col("cohort_wk")) / 7).cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_wk", "week_offset")
  }

  /** Tukey/IQR outlier screen over the event stream: per event-type fences
    * at quartile ± 1.5·IQR from EXACT interpolated quartiles, counting the
    * events beyond each fence. Engines may disagree on a quartile's final
    * ulp (different interpolation arithmetic), but the measured fence gaps
    * on this data are ≥ 0.075 — so the flag decisions are stable — and the
    * OUTPUT carries only integer counts plus an exact two-integer ratio
    * (emitting the interpolated quantiles themselves would risk
    * round-boundary flakes; see the float rules in the verify notes).
    * Shape: one sort-based quartile aggregate per type, then the 5-row
    * fence table BROADCASTS back onto the scan — two passes over events,
    * zero corpus-sized shuffles. */
  val outliers: Q = (s, d) => {
    val ev = Tables(s, d, "events").select(col("event_type"), col("value"))
    val fences = ev.groupBy("event_type")
      .agg(percentile(col("value"), lit(0.25)).as("q1"),
        percentile(col("value"), lit(0.75)).as("q3"))
    val iqr = col("q3") - col("q1")
    ev.join(broadcast(fences), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("value") > col("q3") + iqr * 1.5, 1L).otherwise(0L)).as("n_high"),
        sum(when(col("value") < col("q1") - iqr * 1.5, 1L).otherwise(0L)).as("n_low"))
      .withColumn("high_frac", col("n_high").cast("double") / col("n_events"))
      .orderBy("event_type")
  }

  val queries: Map[String, Q] = Map(
    "q_outliers" -> outliers,
    "q_funnel" -> funnel,
    "q_cohort" -> cohortRetention,
    "q_dateparts" -> dateParts,
    "q_histogram" -> histogram,
    "q_string_agg" -> stringAgg,
    "q_map_fns" -> mapFns,
    "q_string2" -> string2,
    "q_count_if" -> countIf,
    "q_gapfill" -> gapFill,
    "q_null_fns" -> nullFns,
    "q_date_arith" -> dateArith,
    "q_session_window" -> sessionWindow,
    "q_from_json" -> fromJson,
    "q_string" -> string,
    "q_math" -> math,
    "q_case" -> caseWhen,
    "q_date" -> date,
    "q_json" -> json,
    "q_events_hourly" -> eventsHourly,
  )

  val oracle: Map[String, String] = Map(
    "q_outliers" ->
      """WITH q AS (SELECT event_type, quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3 FROM events GROUP BY 1) SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_events, CAST(sum(CASE WHEN value > q3 + (q3 - q1) * 1.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_high, CAST(sum(CASE WHEN value < q1 - (q3 - q1) * 1.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_low, CAST(sum(CASE WHEN value > q3 + (q3 - q1) * 1.5 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS high_frac FROM events e JOIN q USING (event_type) GROUP BY e.event_type ORDER BY e.event_type""",
    "q_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, date_trunc('microseconds', ts) AS ts FROM events), t1 AS (SELECT user_id, min(ts) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1), t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM ev e JOIN t1 ON e.user_id = t1.user_id WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY 1), t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM ev e JOIN t2 ON e.user_id = t2.user_id WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY 1) SELECT step, n_users FROM (SELECT '1_view' AS step, CAST(count(*) AS BIGINT) AS n_users FROM t1 UNION ALL SELECT '2_click', CAST(count(*) AS BIGINT) FROM t2 UNION ALL SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM t3) u ORDER BY step""",
    "q_cohort" ->
      """WITH ev AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events), fs AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY 1) SELECT CAST(cohort_wk AS TIMESTAMP) AS cohort_wk, CAST(datediff('day', cohort_wk, wk) / 7 AS INTEGER) AS week_offset, CAST(count(*) AS BIGINT) AS n_users FROM ev JOIN fs USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_dateparts" ->
      """SELECT o_orderkey, CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow, CAST(quarter(o_orderdate) AS INTEGER) AS qtr, CAST(dayofyear(o_orderdate) AS INTEGER) AS doy, last_day(CAST(o_orderdate AS DATE)) AS eom FROM orders ORDER BY o_orderkey""",
    "q_histogram" ->
      """SELECT CAST(CASE WHEN o_totalprice < 0.0 THEN 0 WHEN o_totalprice >= 500000.0 THEN 11 ELSE floor(o_totalprice / 50000.0) + 1 END AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS cnt FROM orders GROUP BY 1 ORDER BY 1""",
    "q_string_agg" ->
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    "q_map_fns" ->
      """SELECT event_id, 2 * CAST(json_extract_string(props, 'k') AS BIGINT) AS k2, CAST(CASE WHEN CAST(json_extract_string(props, 'k') AS BIGINT) > 50 THEN 1 ELSE 0 END AS INTEGER) AS n_big FROM events ORDER BY event_id""",
    "q_string2" ->
      """SELECT c_custkey, lpad(c_mktsegment, 12, '.') AS padded, regexp_replace(c_name, '[0-9]', '#', 'g') AS masked, reverse(c_mktsegment) AS rev, repeat(substr(c_name, 1, 2), 3) AS rep FROM customer ORDER BY c_custkey""",
    "q_count_if" ->
      """SELECT l_returnflag, CAST(count(*) FILTER (WHERE l_quantity > 25.0) AS BIGINT) AS n_bulk, round(sum(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END), 2) AS disc_price, CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_gapfill" ->
      """WITH hourly AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, count(*) AS cnt FROM events GROUP BY 1), spine AS (SELECT unnest(generate_series((SELECT min(hour) FROM hourly), (SELECT max(hour) FROM hourly), INTERVAL 1 HOUR)) AS hour) SELECT s.hour, CAST(coalesce(h.cnt, 0) AS BIGINT) AS cnt FROM spine s LEFT JOIN hourly h ON s.hour = h.hour ORDER BY s.hour""",
    "q_null_fns" ->
      """SELECT o_orderkey, coalesce(c_acctbal, 0.0) AS acctbal_or_zero, c_custkey IS NULL AS is_poor, nullif(o_custkey % 2, 0) AS odd_or_null FROM orders LEFT JOIN (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000.0) c ON o_custkey = c_custkey ORDER BY o_orderkey""",
    "q_date_arith" ->
      """SELECT o_orderkey, CAST(min(l_shipdate) AS TIMESTAMP) AS first_ship, CAST(date_diff('day', CAST(min(o_orderdate) AS DATE), CAST(min(l_shipdate) AS DATE)) AS INTEGER) AS days_to_ship FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderkey ORDER BY o_orderkey""",
    "q_session_window" ->
      """WITH marks AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s FROM events), sess AS (SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM marks) SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, CAST(min(ts) AS TIMESTAMP) AS session_start FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "q_from_json" ->
      """SELECT event_id, CAST(json_extract_string(props, 'k') AS BIGINT) AS k, CAST(len(json_keys(props)) AS INTEGER) AS n_keys FROM events ORDER BY event_id""",
    "q_string" ->
      """SELECT c_custkey, lower(c_name) AS lname, CAST(length(c_name) AS INTEGER) AS name_len, substr(c_name, 1, 5) AS prefix, c_mktsegment || '#' || c_name AS tagged FROM customer ORDER BY c_custkey""",
    "q_math" ->
      """SELECT l_orderkey, l_linenumber, sqrt(l_extendedprice) AS sqrt_price, CAST(floor(l_quantity * (1.0 + l_tax)) AS BIGINT) AS qty_tax_floor, abs(l_discount - 0.05) AS disc_dev, l_orderkey % 7 AS mod7 FROM lineitem ORDER BY l_orderkey, l_linenumber, sqrt_price, qty_tax_floor, disc_dev""",
    "q_case" ->
      """SELECT CASE WHEN o_totalprice < 100000.0 THEN 'low' WHEN o_totalprice < 300000.0 THEN 'mid' ELSE 'high' END AS bucket, CAST(count(*) AS BIGINT) AS cnt FROM orders GROUP BY 1 ORDER BY 1""",
    "q_date" ->
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr, CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mo, CAST(count(*) AS BIGINT) AS cnt, round(sum(o_totalprice), 2) AS sum_price FROM orders GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_json" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(CAST(json_extract_string(props, 'k') AS BIGINT)) AS BIGINT) AS sum_k FROM events GROUP BY event_type ORDER BY event_type""",
    "q_events_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, CAST(count(*) AS BIGINT) AS cnt, round(sum(value), 2) AS sum_value FROM events GROUP BY 1 ORDER BY 1""",
  )
}
