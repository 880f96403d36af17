package graft

/** Plan-shape regression tests: the physical-plan properties the 100 TB
  * story rests on, asserted against the actual optimized plans so a
  * refactor can't silently regress them. */
class PlanShapeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def available = new java.io.File(sfDir).exists()

  private def plan(name: String): String =
    Queries.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q01: filter pushed to the parquet scan; partial aggregation before shuffle") {
    assume(available)
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(800))
    assert(p.contains("partial_sum") || p.contains("HashAggregate"), p.take(800))
  }

  test("q02: scan reads only the projected+filtered columns") {
    assume(available)
    val p = plan("q02_filter_project")
    // 5 output + 2 filter columns of lineitem's 16 — pruning must show
    // in ReadSchema (l_shipdate filtered, not all columns read).
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_comment"), "column pruning lost: l_comment read")
  }

  test("q10: small part dimension joins via broadcast, not shuffle") {
    assume(available)
    val p = plan("q10_dim_join_brand")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("q09: tiny tier table resolves as a broadcast nested-loop range join") {
    assume(available)
    val p = plan("q09_tier_pricing")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("q54: banded self-join does not degrade to a cartesian product") {
    assume(available)
    val p = plan("q54_minhash_pairs")
    assert(!p.contains("CartesianProduct"), "minhash candidate join went quadratic")
    assert(!p.contains("BroadcastNestedLoopJoin"), "minhash candidate join went nested-loop")
  }
}
