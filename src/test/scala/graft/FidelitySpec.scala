package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-fidelity test: reproduces the demo run of
  * `/root/reference/src/main.rs` exactly — build ids 0..4096, probe ids
  * 2048..4096 (`:17-27`), filter `id >= 2560` (`src/executor/mod.rs:295`),
  * inner equi-join, offset 100 / limit 200 (`src/main.rs:35`) — and asserts
  * the reference's own checks: 200 rows, 2 columns, first joined id 2660
  * (`src/main.rs:71-73`).
  */
class FidelitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("flagship plan reproduces the reference demo output") {
    val build = spark.range(0, 4096).toDF("id")
      .filter(col("id") >= 2560) // Filter :295 (1024*2+512)
    val probe = spark.range(2048, 4096).toDF("probe_id")
    val joined = probe.join(build, col("probe_id") === col("id"), "inner")
      .select(col("id"), col("probe_id")) // join emits 2 cols, mod.rs:356-359
      .orderBy("id")
      .offset(100).limit(200)

    val rows = joined.collect()
    assert(rows.length == 200)             // main.rs:71
    assert(rows.head.length == 2)          // main.rs:72
    assert(rows.head.getLong(0) == 2660L)  // main.rs:73 (2560 + offset 100)
    assert(rows.last.getLong(0) == 2859L)
    assert(rows.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("filter semantics match the reference predicate (>= 2560 keeps 1536 of 4096)") {
    assert(spark.range(0, 4096).filter(col("id") >= 2560).count() == 1536L)
  }

  test("unique-key build side: duplicate probe keys each match once") {
    // The reference build side dedups by HashMap overwrite (mod.rs:371);
    // with unique build keys, join cardinality == probe-side match count.
    val build = spark.range(0, 100).toDF("id")
    val probe = spark.range(50, 150).toDF("id")
    assert(probe.join(build, "id").count() == 50L)
  }
}
