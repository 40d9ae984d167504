package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.SparkSession
import graft.sources.Writers

/** SURVEY.md §5 — the co-located-join layout, proven at the plan
  * level: two tables bucketed the same way join with ZERO shuffle
  * exchanges. At 100 TB this is the difference between re-shuffling
  * both fact tables per query and reading co-located buckets in place.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.count() // finalize AQE
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case other => other +: other.children.flatMap(walk)
      }
    walk(df.queryExecution.executedPlan).count(_.isInstanceOf[ShuffleExchangeLike])
  }

  test("same-bucketing join and aggregation run with zero exchanges") {
    val facts = (1L to 1000L).map(k => (k % 50, k, k * 2.0)).toDF("k", "id", "v")
    val dims = (0L until 50L).map(k => (k, s"name$k")).toDF("k", "name")
    Writers.bucketedTable(facts, "facts_b", Seq("k"), 8)
    Writers.bucketedTable(dims, "dims_b", Seq("k"), 8)
    val withoutBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("facts_b").join(spark.table("dims_b"), "k")
      assert(shuffles(joined) == 0, "bucketed join must not shuffle")
      assert(joined.count() == 1000L)
      // aggregation on the bucket key also reuses the layout
      val agg = spark.table("facts_b").groupBy("k").count()
      assert(shuffles(agg) == 0, "bucket-key aggregation must not shuffle")
      // control: the same join from unbucketed frames DOES shuffle
      assert(shuffles(facts.join(dims, "k")) > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", withoutBroadcast)
      spark.sql("DROP TABLE IF EXISTS facts_b")
      spark.sql("DROP TABLE IF EXISTS dims_b")
    }
  }
}
