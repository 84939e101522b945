package graft

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-regression guards: the scale-critical physical-plan properties
  * (filter pushdown, column pruning, broadcast choice, top-k operator)
  * asserted on the sf0.001 fixtures so a refactor can't silently trade them
  * away. Static (pre-AQE) plan text only — no execution-order flake. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, d).queryExecution.explainString(FormattedMode)

  test("flagship: predicate pushed into the orders scan, schema pruned, broadcast join, fused top-k") {
    val p = plan("q_flagship")
    assert(p.contains("GreaterThanOrEqual(o_totalprice,250000.0)"), "filter not pushed to scan")
    assert(!p.contains("l_tax"), "lineitem schema not pruned")
    assert(p.contains("BroadcastHashJoin"), "filtered build side should broadcast")
    assert(p.contains("TakeOrderedAndProject"), "sort+offset+limit should fuse")
    assert(!p.contains("SortMergeJoin"))
  }

  test("dimension joins broadcast, never sort-merge, at small build sizes") {
    val p = plan("q_join_multiway")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("sort-merge hint forces the fact-fact shuffle shape") {
    val p = plan("q_join_sortmerge")
    assert(p.contains("SortMergeJoin"))
    assert(!p.contains("BroadcastHashJoin"))
  }

  test("cosine top-k: scan reads only vec_id + embedding and uses the native expression") {
    val p = plan("q_cosine_topk")
    assert(p.contains("cosine_sim"), "native CosineSimilarity expression missing from plan")
    assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"),
      "embedding scan should prune to two columns")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("salted aggregation keeps two aggregation levels") {
    val p = plan("q_salted_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "expected partial+final aggregates at both (key,salt) and key levels")
  }

  test("tpch5: every dimension edge broadcasts; no sort-merge at dim sizes") {
    val p = plan("q_tpch5")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("tpch3: segment and date predicates pushed into the scans, fused top-k") {
    val p = plan("q_tpch3")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), "segment filter not pushed to customer scan")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("range join rides the equi key — never a cartesian/nested-loop product") {
    val p = plan("q_rangejoin")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("Join"), "expected a hash/merge join on the equi key")
  }

  test("IVF probe: native cosine expression, no unbroadcast cartesian product") {
    val p = plan("q_ivf_ann")
    assert(p.contains("cosine_sim"))
    assert(!p.contains("CartesianProduct"),
      "centroid/query sides must broadcast — a cartesian here scans N^2 at scale")
  }

  test("full outer join shuffles both sides (broadcast cannot produce the unmatched build rows)") {
    val p = plan("q_join_full")
    assert(p.contains("FullOuter"), "expected a full-outer join node")
    assert(!p.contains("BroadcastHashJoin"),
      "full outer must not broadcast — unmatched build-side rows would be lost per partition")
  }

  test("scan-level pruning: projection query never reads unused columns") {
    val p = plan("q_project")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_extendedprice:double,l_discount:double>")
      || !p.contains("l_returnflag"), "projection should prune the scan schema")
  }

  test("tpch17: brand filter pushed to the part scan; the part edge broadcasts") {
    val p = plan("q_tpch17")
    assert(p.contains("EqualTo(p_brand,Brand#4)"), "brand filter not pushed to part scan")
    assert(p.contains("BroadcastHashJoin"), "filtered part dim should broadcast")
  }

  test("tpch18: customer edge broadcasts against the tiny big-orders set") {
    val p = plan("q_tpch18")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"), "top-100 should fuse, not global sort")
  }

  test("lateral top-N decorrelates to a ranked window — no per-row re-execution") {
    val p = plan("q_lateral")
    assert(p.contains("Window"), "expected the LIMIT-per-key to become a window rank")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "lateral must join on the correlation key, not enumerate pairs")
  }

  test("chunking stays a per-row explode — no shuffle in the plan") {
    val p = plan("q_chunk")
    assert(!p.replaceAll("(?s)Sort \\[doc_id.*", "").contains("Exchange hashpartitioning"),
      "chunk generation must not shuffle before the final presentation sort")
  }
}
