package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** SURVEY.md §7.1 as executable regressions: the plan-shape claims
  * (pushdown, pruning, broadcast, shuffle counts) are asserted against
  * executed plans at sf0.001 so a refactor that silently degrades a
  * plan fails the suite, not just the bench.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def executed(df: DataFrame): Seq[SparkPlan] = {
    df.count() // finalize AQE
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case o => o +: o.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  private def shuffles(plan: Seq[SparkPlan]): Int =
    plan.count(_.isInstanceOf[ShuffleExchangeLike])

  test("text quality scan-shaped: zero shuffles before the final sort") {
    val plan = executed(SparkEntry.queries("q_text_quality")(spark, dir))
    // only the presentation-sort range partitioning may shuffle
    assert(shuffles(plan) <= 1)
  }

  test("star join enrichment broadcasts every dim") {
    val plan = executed(SparkEntry.queries("q_join_enrich")(spark, dir))
    assert(plan.count(_.isInstanceOf[BroadcastHashJoinExec]) == 3)
  }

  test("dwc mapping reads only referenced columns") {
    val plan = executed(SparkEntry.queries("q_dwc_mapping")(spark, dir))
    val lineitemScan = plan.map(_.toString).find(s =>
      s.contains("Scan parquet") && s.contains("lineitem.parquet")).get
    // 7 mapped terms touch 5 lineitem columns; the other 11 must be pruned
    assert(!lineitemScan.contains("l_tax") && !lineitemScan.contains("l_comment"))
    assert(lineitemScan.contains("l_quantity") && lineitemScan.contains("l_shipdate"))
  }

  test("ann query-side predicate pushes into the parquet scan") {
    val plan = executed(SparkEntry.queries("q_ann_cosine")(spark, dir))
    val pushed = plan.map(_.toString).filter(_.contains("PushedFilters"))
    assert(pushed.exists(_.contains("LessThan(vec_id,8)")))
  }

  test("asof join is one key shuffle, not a per-row probe join") {
    val plan = executed(SparkEntry.queries("q_asof_join")(spark, dir))
    // union + window on user_id + presentation sort: ≤2 shuffles, and
    // NO nested-loop/cartesian fallback anywhere
    assert(shuffles(plan) <= 2)
    assert(!plan.exists(_.nodeName.toLowerCase.contains("nestedloop")))
    assert(!plan.exists(_.nodeName.toLowerCase.contains("cartesian")))
  }

  test("fuzzy match joins on the blocking key, no cartesian fallback") {
    val plan = executed(SparkEntry.queries("q_fuzzy_match")(spark, dir))
    assert(!plan.exists(_.nodeName.toLowerCase.contains("nestedloop")))
    assert(!plan.exists(_.nodeName.toLowerCase.contains("cartesian")))
  }

  test("aggregations keep map-side partial aggregation") {
    val plan = executed(SparkEntry.queries("q_statistical_summary")(spark, dir))
    val aggs = plan.map(_.toString).filter(_.contains("HashAggregate"))
    assert(aggs.exists(_.contains("partial_")))
  }
}
