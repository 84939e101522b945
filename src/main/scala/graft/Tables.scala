package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
      // by default; read it as raw nanos and truncate to a microsecond
      // timestamp (Spark's native precision).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Integral DIV, not `/`: epoch-nanos (~1.7e18) exceed double's 2^53
      // mantissa, so float division here silently loses microseconds.
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
