package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query inventory re-expresses the reference's capability surface
  * (scan / filter / hash join / limit+offset,
  * `/root/reference/src/executor/mod.rs:250-466`) plus the SURVEY.md §2.2 ▲
  * extensions (joins variants, aggregations, windows, set ops, scalar/JSON
  * functions) and the north-star LLM-pipeline operators (dedup, similarity,
  * text analysis, multimodal), each as a deterministic DataFrame query with
  * (where dialect-stable) a DuckDB oracle.
  */
object SparkEntry {

  /** Flagship: scan → filter(build side) → inner hash equi-join →
    * offset/limit, the reference's one hand-wired plan
    * (`/root/reference/src/main.rs:29-48`), on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++
      ops.Aggregates.queries ++
      ops.Scalars.queries ++
      ops.TextOps.queries ++
      ops.Dedup.queries ++
      ops.Similarity.queries ++
      ops.Multimodal.queries ++
      ops.Custom.queries ++
      ops.AsOf.queries ++
      ops.Extended.queries ++
      ops.Tpch.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted for non-SQL-expressible / non-dialect-stable ops
    * (minhash/simhash/langid/approx/ANN) → driver records rows-only check. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++
      ops.Aggregates.oracle ++
      ops.Scalars.oracle ++
      ops.TextOps.oracle ++
      ops.Dedup.oracle ++
      ops.Similarity.oracle ++
      ops.Multimodal.oracle ++
      ops.Custom.oracle ++
      ops.AsOf.oracle ++
      ops.Extended.oracle ++
      ops.Tpch.oracle
}
