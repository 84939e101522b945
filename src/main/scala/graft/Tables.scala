package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-generated parquet test tables (TESTDATA.md).
  *
  * The reference engine's only source is an in-memory row-store scanned in
  * 1024-row morsels (`/root/reference/src/executor/mod.rs:250-276`,
  * `/root/reference/src/releation/mod.rs:20-26`). Here a "scan" is a parquet
  * read: Spark's vectorized reader supplies the columnar batches, and
  * Catalyst pushes filters + prunes columns into the scan — at 100 TB the
  * scan is where most of the win lives, so every query in this library
  * selects explicit columns early so `ReadSchema` stays minimal.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped in two physical layouts across driver data
      // generations: parquet TIMESTAMP(NANOS) (readable only as a raw long
      // via the legacy conf — ScaleUp-derived dirs preserve that long), and
      // TIMESTAMP(MICROS, isAdjustedToUTC=false), which reads natively as
      // TIMESTAMP_NTZ. Normalize BOTH to Spark's session-timezone
      // TimestampType (sessions here run UTC, so the instants are
      // identical): the streaming tier requires TimestampType for
      // watermarks/windows, and it keeps every events-derived output the
      // same type across data generations.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType =>
          // Integral DIV, not `/`: epoch-nanos (~1.7e18) exceed double's
          // 2^53 mantissa; float division silently loses microseconds.
          df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
