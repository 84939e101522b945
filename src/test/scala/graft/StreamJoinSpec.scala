package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Watermarked stream-stream join: purchases within 2h of a signup. */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def t(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("stream-stream join matches purchases to preceding signup within the window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val signups = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val out = Streams.purchasesAfterSignup(signups.toDF(), purchases.toDF())
    val q = out.writeStream
      .format("memory").queryName("sjoin_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      signups.addData(Ev(1, t("01:00"), 7, "signup", 0.0, "{}"))
      purchases.addData(
        Ev(2, t("02:30"), 7, "purchase", 42.0, "{}"),  // within 2h → joins
        Ev(3, t("05:00"), 7, "purchase", 99.0, "{}"),  // 4h later → outside window
        Ev(4, t("02:00"), 8, "purchase", 11.0, "{}"))  // no signup → no match
      q.processAllAvailable()

      val rows = spark.table("sjoin_test")
        .collect().map(r => (r.getLong(0), r.getDouble(3)))
      assert(rows.toSet == Set((7L, 42.0)))
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched purchases once the watermark proves no match") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val signups = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val out = Streams.purchasesWithOptionalSignup(signups.toDF(), purchases.toDF())
    val q = out.writeStream
      .format("memory").queryName("sjoin_outer_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      signups.addData(Ev(1, t("01:00"), 7, "signup", 0.0, "{}"))
      purchases.addData(
        Ev(2, t("02:30"), 7, "purchase", 42.0, "{}"),  // within 2h → joins
        Ev(3, t("02:00"), 8, "purchase", 11.0, "{}"))  // no signup → NULL row, later
      q.processAllAvailable()
      // The matched row emits immediately; the unmatched one is still held
      // back — the watermark can't yet rule out a late signup for user 8.
      val early = spark.table("sjoin_outer_test").collect()
        .map(r => (r.getLong(0), r.getDouble(3))).toSet
      assert(early == Set((7L, 42.0)))

      // Push both watermarks far past 02:00 + the 2h interval + 1h delay:
      // the engine now KNOWS user 8 can never match and must emit the
      // NULL-signup row.
      signups.addData(Ev(4, t("12:00"), 99, "signup", 0.0, "{}"))
      purchases.addData(Ev(5, t("12:00"), 99, "purchase", 1.0, "{}"))
      q.processAllAvailable()
      q.processAllAvailable()

      val rows = spark.table("sjoin_outer_test").collect()
        .map(r => (r.getLong(0), Option(r.get(1)), r.getDouble(3))).toSet
      assert(rows.contains((7L, Some(java.sql.Timestamp.valueOf("2024-01-01 01:00:00")), 42.0)))
      assert(rows.exists { case (u, s, a) => u == 8L && s.isEmpty && a == 11.0 },
        s"unmatched purchase must surface with a NULL signup after the watermark passes; got $rows")
    } finally q.stop()
  }
}
