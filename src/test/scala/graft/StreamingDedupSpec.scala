package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming exact dedup: dropDuplicatesWithinWatermark keeps state only
  * within the watermark horizon — the streaming form of the exact-dedup
  * pipeline op, with bounded state at any scale. */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def t(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("duplicate event ids are dropped within the watermark window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val stream = MemoryStream[Ev]
    val deduped = stream.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream
      .format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      stream.addData(
        Ev(1, t("00:00"), 1, "click", 1.0, "{}"),
        Ev(1, t("00:05"), 1, "click", 1.0, "{}"), // dup id, same batch
        Ev(2, t("00:10"), 2, "click", 2.0, "{}"))
      q.processAllAvailable()
      stream.addData(
        Ev(1, t("00:20"), 1, "click", 1.0, "{}"), // dup id, later batch, within watermark
        Ev(3, t("00:30"), 3, "click", 3.0, "{}"))
      q.processAllAvailable()

      val ids = spark.table("dedup_test").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
