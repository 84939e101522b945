package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Gap-based sessionization via flatMapGroupsWithState. */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def t(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("sessions split on the inactivity gap within a batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val stream = MemoryStream[Ev]
    val sessions = Streams.sessionize(spark, stream.toDF(), gapMs = 30 * 60 * 1000L)
    val q = sessions.writeStream
      .format("memory").queryName("sessions_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // user 1: burst at 00:00-00:10, then silence, burst at 02:00 → first
      // session closes inside the batch; second stays open in state.
      stream.addData(
        Ev(1, t("00:00"), 1, "click", 1.0, "{}"),
        Ev(2, t("00:10"), 1, "click", 1.0, "{}"),
        Ev(3, t("02:00"), 1, "click", 1.0, "{}"),
        Ev(4, t("00:05"), 2, "click", 1.0, "{}"))
      q.processAllAvailable()

      val closed = spark.table("sessions_test").as[streaming.UserSession].collect()
      assert(closed.length == 1)
      assert(closed.head.user_id == 1L && closed.head.events == 2L)
      assert(closed.head.start_ms == t("00:00").getTime &&
        closed.head.end_ms == t("00:10").getTime)
    } finally q.stop()
  }

  test("sub-second gap boundaries are not truncated to whole seconds") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val stream = MemoryStream[Ev]
    val q = Streams.sessionize(spark, stream.toDF(), gapMs = 30 * 60 * 1000L)
      .writeStream.format("memory").queryName("subsec_sessions")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      // true gap = 1,800,800 ms > 30 min; whole-second truncation would give
      // exactly 1,800,000 ms and wrongly merge the sessions.
      stream.addData(
        Ev(1, Timestamp.valueOf("2024-01-01 00:00:00.1"), 1, "c", 1.0, "{}"),
        Ev(2, Timestamp.valueOf("2024-01-01 00:30:00.9"), 1, "c", 1.0, "{}"),
        Ev(3, Timestamp.valueOf("2024-01-01 03:00:00.0"), 1, "c", 1.0, "{}"))
      q.processAllAvailable()
      val closed = spark.table("subsec_sessions").as[streaming.UserSession].collect()
      assert(closed.length == 2, s"expected two distinct sessions, got ${closed.toSeq}")
      assert(closed.forall(_.events == 1L))
    } finally q.stop()
  }
}
