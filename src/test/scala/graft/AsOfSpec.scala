package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOf

/** As-of join composition semantics: latest right ≤ left, tie at equal ts
  * matches, unmatched left rows drop (inner flavor). */
class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def t(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("matches the latest right row at-or-before each left row per key") {
    import spark.implicits._
    val left = Seq(
      (1L, t("10:00"), 100L),  // after signups 09:00 and 09:30 → matches 09:30
      (1L, t("09:30"), 101L),  // equal ts → matches 09:30 (>= semantics)
      (1L, t("08:00"), 102L),  // before any signup → dropped
      (2L, t("10:00"), 103L),  // user 2 has no signup → dropped
    ).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, t("09:00"), t("09:00")),
      (1L, t("09:30"), t("09:30")),
    ).toDF("user_id", "ts", "signup_ts")

    val out = AsOf.asofJoin(left, right, "user_id", "ts", "signup_ts")
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Timestamp]("signup_ts")).toMap
    assert(out == Map(100L -> t("09:30"), 101L -> t("09:30")))
  }

  test("a NULL right payload is still a match — no fallback to a stale earlier row") {
    import spark.implicits._
    val left = Seq((1L, t("10:00"), 200L)).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, t("08:00"), Option(t("08:00"))),
      (1L, t("09:30"), Option.empty[Timestamp]), // latest eligible row, NULL payload
    ).toDF("user_id", "ts", "signup_ts")
    val rows = AsOf.asofJoin(left, right, "user_id", "ts", "signup_ts").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Timestamp]("signup_ts") == null,
      "must match the 09:30 row's NULL payload, not fall back to 08:00")
  }
}
