package graft.queries

import graft.SparkSpec

/** Physical-plan assertions for the star-schema joins: the strategies the
  * queries are designed around must actually appear in the plan (a silent
  * fallback to the wrong join would still pass the value oracle). */
class JoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("orders ⋈ customer uses a broadcast hash join (dim side broadcast)") {
    plan(JoinQueries.ordersBySegment(spark, dir)) should include("BroadcastHashJoin")
  }

  test("lineitem ⋈ orders is pinned to sort-merge (the 100 TB join shape)") {
    val p = plan(JoinQueries.revenueByPriority(spark, dir))
    p should include("SortMergeJoin")
    p should not include "BroadcastHashJoin"
  }

  test("4-way star: merge for fact-fact plus broadcasts for dims, filter pushed to scan") {
    val p = plan(JoinQueries.revenueByNation(spark, dir))
    p should include("SortMergeJoin")
    p should include("BroadcastHashJoin")
    // o_orderstatus <> 'F' must reach the orders parquet scan
    p should include("Not(EqualTo(o_orderstatus,F))")
  }
}
