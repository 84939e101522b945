package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Stream-static broadcast join: per-batch dim enrichment with zero
  * streaming state (the static side re-broadcasts each micro-batch). */
class StreamStaticJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("events enrich from the static dim; unmatched users get the sentinel") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val tiers = Seq((7L, "gold"), (8L, "silver")).toDF("user_id", "tier")
    val events = MemoryStream[Ev]
    val q = Streams.enrichWithTier(events.toDF(), tiers)
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 01:00:00")
      events.addData(
        Ev(1, t0, 7, "click", 1.0, "{}"),
        Ev(2, t0, 8, "view", 2.0, "{}"),
        Ev(3, t0, 9, "click", 3.0, "{}")) // no dim row → sentinel
      q.processAllAvailable()

      val byId = spark.table("enrich_test").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("tier")).toMap
      assert(byId == Map(1L -> "gold", 2L -> "silver", 3L -> "unknown"))
    } finally q.stop()
  }

  test("streaming as-of enrich: each event gets the latest prior signup, null when none") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val signups = Seq(
      (7L, Timestamp.valueOf("2024-01-01 10:00:00")),
      (7L, Timestamp.valueOf("2024-01-01 12:00:00")),
      (8L, Timestamp.valueOf("2024-01-01 11:00:00"))).toDF("user_id", "ts")
    val events = MemoryStream[Ev]
    val q = Streams.asofEnrich(events.toDF(), signups)
      .writeStream.format("memory").queryName("asof_enrich_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      events.addData(
        Ev(1, Timestamp.valueOf("2024-01-01 11:00:00"), 7, "purchase", 1.0, "{}"), // -> 10:00
        Ev(2, Timestamp.valueOf("2024-01-01 12:30:00"), 7, "purchase", 2.0, "{}"), // -> 12:00
        Ev(3, Timestamp.valueOf("2024-01-01 12:00:00"), 7, "purchase", 3.0, "{}"), // tie -> 12:00
        Ev(4, Timestamp.valueOf("2024-01-01 10:30:00"), 8, "purchase", 4.0, "{}"), // before any -> null
        Ev(5, Timestamp.valueOf("2024-01-01 11:00:00"), 9, "purchase", 5.0, "{}")) // no key -> null
      q.processAllAvailable()

      val byId = spark.table("asof_enrich_test").collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[Timestamp]("signup_ts")).map(_.toString)).toMap
      assert(byId == Map(
        1L -> Some("2024-01-01 10:00:00.0"),
        2L -> Some("2024-01-01 12:00:00.0"),
        3L -> Some("2024-01-01 12:00:00.0"),
        4L -> None,
        5L -> None))
    } finally q.stop()
  }
}
