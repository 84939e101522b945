package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Structured Streaming: watermark + tumbling window over an events-shaped
  * MemoryStream (SURVEY.md §7.3 step 4). */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double, props: String)

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def t(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("tumbling 1h window with 2h watermark aggregates and drops late data") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val stream = MemoryStream[Ev]
    val out = Streams.hourlyByType(stream.toDF())
    val query = out.writeStream
      .format("memory").queryName("hourly_test")
      .outputMode(OutputMode.Update())
      .start()
    try {
      stream.addData(
        Ev(1, t("00:10"), 1, "click", 1.0, "{}"),
        Ev(2, t("00:40"), 2, "click", 2.0, "{}"),
        Ev(3, t("01:15"), 1, "buy", 10.0, "{}"))
      query.processAllAvailable()

      val r1 = spark.table("hourly_test")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(r1.contains(("2024-01-01 00:00:00.0", "click", 2L)))
      assert(r1.contains(("2024-01-01 01:00:00.0", "buy", 1L)))

      // Advance event time to 06:00 → watermark moves to 04:00; then send a
      // late event at 00:50, far below the watermark → must be dropped.
      stream.addData(Ev(4, t("06:00"), 3, "click", 1.0, "{}"))
      query.processAllAvailable()
      stream.addData(Ev(5, t("00:50"), 1, "click", 99.0, "{}"))
      query.processAllAvailable()

      val updates = spark.table("hourly_test")
        .filter("window_start = timestamp '2024-01-01 00:00:00' AND event_type = 'click'")
        .collect().map(r => r.getLong(2))
      // Only the original batch's update (cnt=2) — no cnt=3 row from the late event.
      assert(updates.toSet == Set(2L))
    } finally query.stop()
  }

  test("foreachBatch sink: micro-batches land keyed by batchId (replay-safe upsert shape)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Ev]
    // Keying the sink write by batchId is what makes foreachBatch
    // exactly-once on retry: a replayed batch OVERWRITES its own slot
    // instead of appending a duplicate.
    val seen = scala.collection.concurrent.TrieMap.empty[Long, Long]
    val q = stream.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        seen.put(id, batch.count()); ()
      }
      .start()
    try {
      stream.addData(
        Ev(1, t("00:10"), 1, "click", 1.0, "{}"),
        Ev(2, t("00:20"), 1, "click", 1.0, "{}"))
      q.processAllAvailable()
      stream.addData(Ev(3, t("00:30"), 2, "buy", 5.0, "{}"))
      q.processAllAvailable()
      assert(seen.values.sum == 3, s"expected 3 rows across batches, got $seen")
      assert(seen.size >= 2, "expected at least two micro-batches")
    } finally q.stop()
  }
}
