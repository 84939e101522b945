package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed tables: the co-located-join story for 100 TB — both sides
  * pre-hashed into the same bucket layout on the join key, so the join
  * needs NO shuffle exchange at read time. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("join of co-bucketed tables runs without a shuffle exchange") {
    import spark.implicits._
    val facts = (0L until 1000L).map(i => (i, i * 2.0)).toDF("id", "v")
    val dims = (0L until 1000L by 3).map(i => (i, s"d$i")).toDF("id", "name")
    facts.write.bucketBy(8, "id").sortBy("id").mode("overwrite").saveAsTable("bkt_facts")
    dims.write.bucketBy(8, "id").sortBy("id").mode("overwrite").saveAsTable("bkt_dims")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_facts").join(spark.table("bkt_dims"), "id")
      assert(joined.count() == 334)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
