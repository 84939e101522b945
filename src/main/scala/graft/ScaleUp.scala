package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic N× scale-up of a driver test-data directory — the input
  * generator for the round-8 scaling sweep (VERDICT r07 next-steps #2:
  * "convert 100-TB design claims into measured evidence").
  *
  * Model: each replica is "another day's crawl" with the same statistics as
  * the source — identical schema, identical per-table distributions,
  * disjoint keys.
  *
  *  - Fact keys shift by `replica × 10^ceil(log10(max key))`, consistently
  *    across referencing tables (orders.o_custkey moves with customer,
  *    lineitem's three FKs move with orders/part/supplier), so join
  *    selectivity and fan-out per key are EXACTLY preserved.
  *  - Dimensions (region, nation) copy as-is: every replica shares them,
  *    like the real world shares its geography.
  *  - documents: replica 0 is bit-identical to the source (its internal
  *    duplicate/near-dup structure survives); replicas ≥ 1 suffix every
  *    token with a replica tag, so each replica carries the SAME dup/near-
  *    dup density internally but no cross-replica near-dups — a 10× corpus
  *    with 10× clusters of the original sizes, not one degenerate 10×-deep
  *    cluster per document (which would be a quadratic adversary, not a
  *    scale-up). n_chars is recomputed from the transformed text.
  *  - embeddings: vectors rotate by `replica` positions — norm-preserving,
  *    deterministic, direction-distinct — so ANN candidate structure grows
  *    with the corpus instead of collapsing onto 10× copies of each point.
  *  - events keep their time range (10× event density, same horizon), with
  *    event_id/user_id shifted; ts stays raw TIMESTAMP(NANOS)-as-long so
  *    [[Tables]] reads the output exactly like the driver's parquet.
  *
  * Usage: `runMain graft.ScaleUp [srcDir] [dstDir] [replicas]`
  * (defaults: /root/testdata/sf0.1 → benchdata/sf1 × 10).
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("benchdata/sf1")
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // Read events.ts as raw nanos (and write it back the same way) so the
      // scaled directory is a drop-in for Tables' events branch.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t: ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }
    /** Next power of ten above the key's max — a human-readable, collision-
      * free per-replica offset. */
    def off(t: String, key: String): Long = {
      val m = read(t).agg(max(col(key))).head.getLong(0)
      var p = 1L; while (p <= m) p *= 10; p
    }
    def replicate(t: String)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until reps).map(i => f(read(t), i)).reduce(_ unionByName _)

    val cOff = off("customer", "c_custkey")
    val sOff = off("supplier", "s_suppkey")
    val pOff = off("part", "p_partkey")
    val oOff = off("orders", "o_orderkey")
    val eOff = off("events", "event_id")
    val uOff = off("events", "user_id")
    val dOff = off("documents", "doc_id")
    val vOff = off("embeddings", "vec_id")

    write("region", read("region"))
    write("nation", read("nation"))
    write("customer", replicate("customer")((df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * cOff))))
    write("supplier", replicate("supplier")((df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i * sOff))))
    write("part", replicate("part")((df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * pOff))))
    write("orders", replicate("orders")((df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * oOff))
        .withColumn("o_custkey", col("o_custkey") + lit(i * cOff))))
    write("lineitem", replicate("lineitem")((df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * oOff))
        .withColumn("l_partkey", col("l_partkey") + lit(i * pOff))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * sOff))))
    write("events", replicate("events")((df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * eOff))
        .withColumn("user_id", col("user_id") + lit(i * uOff))))
    write("documents", replicate("documents") { (df, i) =>
      val text = if (i == 0) col("text")
        else concat_ws(" ", transform(split(col("text"), " "),
          t => concat(t, lit(s"x$i"))))
      df.withColumn("doc_id", col("doc_id") + lit(i * dOff))
        .withColumn("text", text)
        .withColumn("n_chars", length(col("text")).cast("long"))
    })
    write("embeddings", replicate("embeddings") { (df, i) =>
      val e = col("embedding")
      val rotated = if (i == 0) e
        else concat(slice(e, i + 1, 10000), slice(e, 1, i))
      df.withColumn("vec_id", col("vec_id") + lit(i * vOff))
        .withColumn("embedding", rotated.cast("array<float>"))
    })
    spark.stop()
  }
}
