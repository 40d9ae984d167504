package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** G9 — proof that the range-clustered parquet layout actually skips:
  * the SAME date-range scan over the same rows reads a fraction of the
  * clustered layout's row groups but every row of a round-robin one.
  * Row-group min/max skipping is the mechanism that turns a 100 TB
  * time-series scan into a bounded one when directory partitioning is
  * too coarse, so this is asserted as a metric regression, not prose.
  */
class ClusterLayoutSpec extends SparkSpec {

  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: walk(q.plan)
      case o => o +: o.children.flatMap(walk)
    }
    val scans = walk(df.queryExecution.executedPlan)
      .filter(p => p.nodeName.contains("Scan") && p.metrics.contains("numOutputRows"))
    assert(scans.nonEmpty, "no scan node with numOutputRows metric")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("range-clustered layout skips row groups a round-robin layout reads") {
    val src = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(to_date(col("l_shipdate")).as("l_shipdate"),
        col("l_returnflag"), col("l_extendedprice"))
    val total = src.count()
    val clustered = s"/tmp/graft-spec-clustered-${java.lang.Math.abs(hashCode)}"
    val shuffled = s"/tmp/graft-spec-roundrobin-${java.lang.Math.abs(hashCode)}"
    graft.sources.Writers.clusteredParquet(src, clustered, Seq("l_shipdate"), nFiles = 8)
    src.repartition(8).write.mode("overwrite").parquet(shuffled)

    def filtered(path: String) =
      spark.read.parquet(path)
        .where(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
          col("l_shipdate") < lit("1997-01-01").cast("date"))
    val matching = filtered(clustered).count()
    assert(matching > 0 && matching < total / 4,
      s"test premise: the range must select a minority of rows ($matching/$total)")

    // identical filter, identical rows — different layouts
    val clusteredRead = scanOutputRows(filtered(clustered))
    val shuffledRead = scanOutputRows(filtered(shuffled))
    // round-robin: every row group spans the full date range — nothing skips
    assert(shuffledRead == total,
      s"round-robin layout unexpectedly skipped: read $shuffledRead of $total")
    // clustered: only the row groups overlapping the range are read
    assert(clusteredRead < total / 2,
      s"clustered layout did not skip: read $clusteredRead of $total")
    assert(clusteredRead >= matching)
    // and the answers agree
    assert(filtered(clustered).count() == filtered(shuffled).count())
  }
}
