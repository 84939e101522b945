package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** User-extension surface: scalar UDF + typed `Aggregator` (SURVEY.md §2.2
  * "UDF / UDAF" row — the reference's analog is implementing the
  * `PushFashion` trait, `/root/reference/src/executor/mod.rs:47-81`).
  *
  * Built-ins beat UDFs (codegen, pushdown); these exist to prove the
  * extension path, and the typed Aggregator is the right tool when an
  * aggregation genuinely has no built-in (it gets partial aggregation /
  * map-side combine for free via `reduce`+`merge`, so it scales like any
  * native agg).
  */
object Custom {
  type Q = (SparkSession, String) => DataFrame

  /** Quantity-weighted mean price: sum(w*x)/sum(w) with explicit
    * partial-merge semantics (input rows are (flag, price, qty)). */
  object WeightedMean
    extends Aggregator[(String, Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (String, Double, Double)): (Double, Double) =
      (b._1 + in._2 * in._3, b._2 + in._3)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) 0.0 else r._1 / r._2
    override def bufferEncoder = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaDouble)
    override def outputEncoder = org.apache.spark.sql.Encoders.scalaDouble
  }

  /** Typed Aggregator over lineitem: weighted mean price per return flag. */
  val udafWeightedMean: Q = (s, d) => {
    import s.implicits._
    Tables(s, d, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .as[(String, Double, Double)]
      .groupByKey(_._1)
      .agg(WeightedMean.toColumn.name("wmean_price"))
      .toDF("l_returnflag", "wmean_price")
      .select(col("l_returnflag"), round(col("wmean_price"), 2).as("wmean_price"))
      .orderBy("l_returnflag")
  }

  /** Scalar UDF: vowel count. (Deliberately simple — the point is the
    * registration path; a UDF is opaque to Catalyst, so anything
    * expressible as built-ins should never be one.) */
  private val vowelCount = udf((s: String) =>
    if (s == null) 0 else s.count(c => "aeiou".indexOf(c) >= 0))

  val udfVowels: Q = (s, d) =>
    Tables(s, d, "documents")
      .select(col("doc_id"), vowelCount(col("text")).as("vowels"))
      .orderBy("doc_id")

  val queries: Map[String, Q] = Map(
    "q_udaf_weighted_mean" -> udafWeightedMean,
    "q_udf_vowels" -> udfVowels,
  )

  val oracle: Map[String, String] = Map(
    "q_udaf_weighted_mean" ->
      """SELECT l_returnflag, round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2) AS wmean_price FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_udf_vowels" ->
      """SELECT doc_id, CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS INTEGER) AS vowels FROM documents ORDER BY doc_id""",
  )
}
