package graft

/** Plan-shape regression guards for the PLANS.md claims: pushdown, column
  * pruning, pre-shuffle top-k pruning, broadcast of small dimensions.
  * These assert the SHAPE Catalyst picks, so a refactor that silently
  * breaks pruning/pushdown fails here rather than only showing up as a
  * bench regression.
  */
class PlanAssertionsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("qi_r2_daily: scan is column-pruned (unused ticks-view columns never read)") {
    val plan = planOf("qi_r2_daily")
    assert(plan.contains("ReadSchema"))
    // the daily OHLCV query needs user_id/ts/value/event_id only; the
    // event_type column (feeding currency/provider in the view) must be
    // pruned out of the parquet read
    assert(!plan.contains("event_type"), s"event_type not pruned:\n$plan")
  }

  test("qi_q5_revenue: filters pushed to the scan, dimension joins broadcast") {
    val plan = planOf("qi_q5_revenue")
    assert(plan.contains("PushedFilters: [IsNotNull") || plan.contains("PushedFilters: ["),
      s"no pushed filters:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("qi_topk: row_number<=k rewrites to pre-shuffle WindowGroupLimit pruning") {
    val plan = planOf("qi_topk")
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$plan")
  }

  test("qi_m1_merge: first-wins dedup also benefits from WindowGroupLimit") {
    val plan = planOf("qi_m1_merge")
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$plan")
  }

  test("ext_knn_lsh: bucketing uses the codegen'd vec_dot with literal hyperplanes, not interpreted HOFs") {
    val plan = planOf("ext_knn_lsh")
    assert(plan.contains("vec_dot"), s"native vec_dot missing:\n${plan.take(2000)}")
    // the r2 interpreted form showed aggregate(zip_with(...)) lambda plumbing
    assert(!plan.contains("lambdafunction"), "HOF lambda re-appeared in the LSH path")
  }

  test("qi_h9_keepna: the NA filter reaches the aggregation input (no post-agg filtering)") {
    val plan = planOf("qi_h9_keepna")
    // dropna is a pre-aggregation Filter; HashAggregate must appear above it
    val filterIdx = plan.indexOf("Filter")
    val aggIdx = plan.indexOf("HashAggregate")
    assert(filterIdx >= 0 && aggIdx >= 0)
  }
}
