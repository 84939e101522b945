package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** AS-OF join — an operator Spark lacks natively, built by composition
  * (builder-prompt preference (a): compose existing ops) rather than a
  * custom SparkPlan: for each left row, the latest right row with
  * right.ts <= left.ts for the same key.
  *
  * Shape: union both sides with a side marker, one window over
  * (key, ts, side) carrying the last non-null right payload forward, then
  * keep left rows. Cost at 100 TB: ONE shuffle on the key + a per-partition
  * sort — the same price as a single sort-merge join, with no range
  * explosion (a naive `left.ts >= right.ts` theta-join is quadratic).
  * Correctness oracle: DuckDB's native ASOF JOIN.
  */
object AsOf {
  type Q = (SparkSession, String) => DataFrame

  /** Generic as-of join on one key and one event-time column. `right` must
    * expose `payload` (the column to carry); ties (equal ts) match the
    * right row (>= semantics, like DuckDB ASOF). Inner flavor: left rows
    * with no prior right row are dropped. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               ts: String, payload: String): DataFrame = {
    // The carried value is a single-field STRUCT, not the bare payload:
    // right rows always contribute a non-null struct (even when the payload
    // itself is NULL), so "no prior right row" (null struct) stays
    // distinguishable from "prior right row with a NULL payload" — matching
    // ASOF join semantics exactly.
    val wrapped = s"_w_$payload"
    val l = left
      .withColumn("_side", lit(1))
      .withColumn(wrapped,
        lit(null).cast(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("p", right.schema(payload).dataType)))))
    val r = right.select(col(key), col(ts), lit(0).as("_side"),
      struct(col(payload).as("p")).as(wrapped))
    val lAligned = l.select(Seq(col(key), col(ts), col("_side"), col(wrapped)) ++
      left.columns.filterNot(c => c == key || c == ts).map(c => col(c)): _*)
    val rAligned = r.select(Seq(col(key), col(ts), col("_side"), col(wrapped)) ++
      left.columns.filterNot(c => c == key || c == ts).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lAligned.union(rAligned)
      .withColumn("_matched", last(col(wrapped), ignoreNulls = true).over(w))
      .filter(col("_side") === 1 && col("_matched").isNotNull)
      .withColumn(payload, col("_matched.p"))
      .drop("_side", wrapped, "_matched")
  }

  /** NATIVE as-of join — the same semantics as [[asofJoin]], but as a
    * first-class Catalyst operator ([[graft.plans.AsOfJoinPlan]] →
    * [[graft.plans.AsOfJoinExec]] via [[graft.plans.GraftStrategy]],
    * registered through `spark.sql.extensions`): builder-contract
    * preference (c), demonstrated on the one operator in the surface whose
    * composed form costs a union + window over BOTH sides. The native plan
    * shuffles each side once on the key, sorts by (key, time), and streams
    * a single-pass merge with one retained row of state — no union blow-up,
    * no window buffering, and the right side carries ONLY its own columns.
    *
    * Both inputs must expose resolved columns named by the caller; the
    * right side's columns must not collide with the left's (rename before
    * calling — aliasing also gives the self-join case fresh exprIds).
    *
    * `outer = true` emits unmatched left rows null-extended (DuckDB
    * `ASOF LEFT JOIN`); `tolerance` (native time units — micros for
    * timestamps) rejects matches older than `leftTime - tolerance`,
    * DuckDB-mirrored as a post-ASOF `epoch_us` gap predicate;
    * `forward = true` matches the EARLIEST right row at-or-after instead
    * (DuckDB `ASOF JOIN ... ON l.ts <= r.ts`).
    */
  def asofJoinNative(left: DataFrame, right: DataFrame, leftKey: String,
                     rightKey: String, leftTime: String, rightTime: String,
                     outer: Boolean = false, tolerance: Option[Long] = None,
                     forward: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    // Belt-and-braces for sessions built WITHOUT spark.sql.extensions (a
    // foreign driver session): the public `experimental` hooks accept the
    // same strategy/rule post-construction. Idempotent; the extensions
    // path stays the production registration.
    if (!spark.experimental.extraStrategies.contains(graft.plans.GraftStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.GraftStrategy
    if (!spark.experimental.extraOptimizations.contains(graft.plans.PushFilterThroughAsOfJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.PushFilterThroughAsOfJoin
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not in ${p.output.map(_.name)}"))
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      graft.plans.AsOfJoinPlan(lp, rp,
        attr(lp, leftKey), attr(rp, rightKey), attr(lp, leftTime), attr(rp, rightTime),
        outer, tolerance, forward))
  }

  /** [[purchaseAsofSignup]] re-expressed on the native operator — same
    * output, same DuckDB oracle, different (better) physical plan. */
  val purchaseAsofSignupNative: Q = (s, d) => {
    val ev = Tables(s, d, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user_id"), col("ts").as("signup_ts"))
    asofJoinNative(purchases, signups, "user_id", "s_user_id", "ts", "signup_ts")
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"),
        col("value"), col("signup_ts"))
      .orderBy("event_id")
  }

  /** LEFT-OUTER flavor of [[purchaseAsofSignupNative]]: every purchase
    * emits; those with no prior signup carry a null signup_ts — the
    * "which events are unattributable" audit an attribution pipeline runs.
    * Oracle: DuckDB `ASOF LEFT JOIN`. */
  val purchaseAsofSignupOuter: Q = (s, d) => {
    val ev = Tables(s, d, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user_id"), col("ts").as("signup_ts"))
    asofJoinNative(purchases, signups, "user_id", "s_user_id", "ts", "signup_ts",
        outer = true)
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"),
        col("value"), col("signup_ts"))
      .orderBy("event_id")
  }

  /** Tolerance-bounded as-of: a purchase only attributes to a signup within
    * the last 3 days (`within X` — the other common ASOF ask; trading
    * systems use it to reject stale quotes). Inner flavor: out-of-window
    * matches drop. The bound is checked O(1) per left row inside the merge
    * (the candidate is already the LATEST at-or-before row), and the oracle
    * mirrors it as a post-ASOF `epoch_us` gap predicate. */
  val ToleranceMicros: Long = 3L * 24 * 3600 * 1000000 // 3 days
  val purchaseAsofTolerance: Q = (s, d) => {
    val ev = Tables(s, d, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user_id"), col("ts").as("signup_ts"))
    asofJoinNative(purchases, signups, "user_id", "s_user_id", "ts", "signup_ts",
        tolerance = Some(ToleranceMicros))
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"),
        col("value"), col("signup_ts"))
      .orderBy("event_id")
  }

  /** FORWARD as-of: each signup matched to the user's FIRST purchase
    * at-or-after it — the "time to first conversion" attribution query.
    * Oracle: DuckDB ASOF with the inequality flipped
    * (`s.ts <= p.ts` picks the nearest later purchase). */
  val signupToFirstPurchase: Q = (s, d) => {
    val ev = Tables(s, d, "events")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("p_value"))
    asofJoinNative(signups, purchases, "user_id", "p_user_id", "ts", "purchase_ts",
        forward = true)
      .select(col("event_id"), col("user_id"), col("ts").as("s_ts"),
        col("purchase_ts"), col("p_value"))
      .orderBy("event_id")
  }

  /** Each purchase matched to the user's latest signup at-or-before it. */
  val purchaseAsofSignup: Q = (s, d) => {
    val ev = Tables(s, d, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("ts").as("signup_ts"))
    asofJoin(purchases, signups, "user_id", "ts", "signup_ts")
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"),
        col("value"), col("signup_ts"))
      .orderBy("event_id")
  }

  val queries: Map[String, Q] = Map(
    "q_asof_join" -> purchaseAsofSignup,
    "q_asof_native" -> purchaseAsofSignupNative,
    "q_asof_native_outer" -> purchaseAsofSignupOuter,
    "q_asof_tolerance" -> purchaseAsofTolerance,
    "q_asof_forward" -> signupToFirstPurchase,
  )

  val oracle: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'), s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup') SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS p_ts, p.value, CAST(s.ts AS TIMESTAMP) AS signup_ts FROM p ASOF JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts ORDER BY event_id""",
    "q_asof_native" ->
      """WITH p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'), s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup') SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS p_ts, p.value, CAST(s.ts AS TIMESTAMP) AS signup_ts FROM p ASOF JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts ORDER BY event_id""",
    "q_asof_native_outer" ->
      """WITH p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'), s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup') SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS p_ts, p.value, CAST(s.ts AS TIMESTAMP) AS signup_ts FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts ORDER BY event_id""",
    "q_asof_tolerance" ->
      s"""WITH p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'), s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup') SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS p_ts, p.value, CAST(s.ts AS TIMESTAMP) AS signup_ts FROM p ASOF JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts WHERE epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(s.ts AS TIMESTAMP)) <= $ToleranceMicros ORDER BY event_id""",
    "q_asof_forward" ->
      """WITH s AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup'), p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') SELECT s.event_id, s.user_id, CAST(s.ts AS TIMESTAMP) AS s_ts, CAST(p.ts AS TIMESTAMP) AS purchase_ts, p.value AS p_value FROM s ASOF JOIN p ON s.user_id = p.user_id AND s.ts <= p.ts ORDER BY event_id""",
  )
}
