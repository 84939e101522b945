package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Functions
import graft.ops.Similarity

/** The native codegen'd CosineSimilarity expression must be bit-identical to
  * the zip_with/aggregate composition, handle nulls, and register in SQL. */
class NativeExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vecs = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (0 until 50).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v")
  }

  test("native expression == higher-order-function composition, bit-exact") {
    val a = vecs.select(col("id"), col("v"))
    val b = vecs.select(col("id").as("id2"), col("v").as("w"))
    val both = a.join(b, col("id") === col("id2") - 1)
      .select(
        Functions.cosineSim(col("v"), col("w")).as("native"),
        Similarity.cosine(Similarity.toDouble(col("v")), Similarity.toDouble(col("w"))).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null input yields null, zero vector yields 0.0") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0f, 2.0f))),
      (None, Some(Array(1.0f, 2.0f))),
      (Some(Array(0.0f, 0.0f)), Some(Array(1.0f, 2.0f))),
    ).toDF("a", "b")
    val out = df.select(Functions.cosineSim(col("a"), col("b"))).collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-12)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 0.0)
  }

  test("double arrays are rejected at analysis time, not silently misread") {
    Functions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0, 0.0), array(1.0, 0.0))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine_sim") ||
      e.getMessage.toLowerCase.contains("array<float>"))
  }

  test("registers as a SQL function") {
    Functions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }
}
