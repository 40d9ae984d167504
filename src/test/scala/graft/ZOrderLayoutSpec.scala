package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** G10 — Z-order layout proofs.
  *
  * 1. The Morton code expression replays a driver-side reference
  *    interleave bit-for-bit (exact-rank path: integral domains
  *    narrower than 2^bits quantize by offset, no scaling).
  * 2. The scan-metric regression that motivates the layout: a filter
  *    on the SECOND clustered dimension alone skips row groups of the
  *    z-ordered layout but reads EVERY row of a lexicographic
  *    range-clustered one (whose stats are only narrow on its leading
  *    column) — the case where single-dimension clustering loses at
  *    100 TB, asserted as metrics, not prose.
  */
class ZOrderLayoutSpec extends SparkSpec {

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

  /** Reference interleave: bit b of dimension i → position b*k + i,
    * dimension order = zCols order. */
  private def morton(dims: Seq[Long]): Long = {
    val k = dims.size
    val bits = math.min(16, 63 / k)
    var z = 0L
    for (i <- dims.indices; b <- 0 until bits)
      z |= ((dims(i) >> b) & 1L) << (b * k + i)
    z
  }

  test("zvalue expression matches the reference Morton interleave") {
    import spark.implicits._
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (7L, 200L), (255L, 255L),
      (1000L, 3L), (999L, 998L), (512L, 513L))
    val df = pts.toDF("x", "y")
    val got = df.withColumn("z", graft.sources.Writers.zvalue(df, Seq("x", "y")))
      .select("x", "y", "z").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // both domains span < 2^16 from their min, so ranks are exact
    // offsets, top-aligned to the 16-bit quantization width
    def shiftFor(span: Long) =
      16 - (64 - java.lang.Long.numberOfLeadingZeros(math.max(span, 1L)))
    val mnX = pts.map(_._1).min
    val mnY = pts.map(_._2).min
    val sx = shiftFor(pts.map(_._1).max - mnX)
    val sy = shiftFor(pts.map(_._2).max - mnY)
    for ((x, y) <- pts)
      assert(got((x, y)) == morton(Seq((x - mnX) << sx, (y - mnY) << sy)),
        s"zvalue mismatch at ($x,$y)")
  }

  test("second-dimension filter prunes the z-order layout but reads all of a range-clustered one") {
    val src = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(to_date(col("l_shipdate")).as("l_shipdate"),
        col("l_partkey"), col("l_returnflag"), col("l_extendedprice"))
    val total = src.count()
    val zpath = s"/tmp/graft-spec-zorder-${java.lang.Math.abs(hashCode)}"
    val dpath = s"/tmp/graft-spec-datecluster-${java.lang.Math.abs(hashCode)}"
    graft.sources.Writers.zorderedParquet(
      src, zpath, Seq("l_shipdate", "l_partkey"), nFiles = 16)
    graft.sources.Writers.clusteredParquet(
      src, dpath, Seq("l_shipdate"), nFiles = 16)

    // filter on the SECOND dimension only: lowest quarter of partkeys
    val loPk = src.agg(max(col("l_partkey"))).head().getLong(0) / 4
    def pkOnly(path: String) =
      spark.read.parquet(path).where(col("l_partkey") <= lit(loPk))
    val matching = pkOnly(zpath).count()
    assert(matching > 0 && matching < total / 2,
      s"test premise: partkey filter must select a minority ($matching/$total)")

    val dateClusteredRead = scanOutputRows(pkOnly(dpath))
    val zRead = scanOutputRows(pkOnly(zpath))
    // lexicographic-on-date stats are wide on partkey: nothing skips
    assert(dateClusteredRead == total,
      s"date-clustered layout unexpectedly skipped on partkey: $dateClusteredRead of $total")
    // z-order: partkey participates in every file's z-range → files
    // whose partkey rectangle misses the quarter are never read
    assert(zRead <= total / 2,
      s"z-order layout did not skip on the second dimension: read $zRead of $total")
    assert(zRead >= matching)

    // the leading dimension still prunes the z layout too, and both
    // layouts agree with the source on a two-dimension predicate
    def bothDims(df: DataFrame) = df
      .where(col("l_shipdate") >= lit("1995-01-01").cast("date") &&
        col("l_shipdate") < lit("1997-01-01").cast("date") &&
        col("l_partkey") <= lit(loPk))
    val zBoth = scanOutputRows(bothDims(spark.read.parquet(zpath)))
    assert(zBoth < total,
      s"z-order layout did not skip on a two-dimension predicate: $zBoth of $total")
    assert(bothDims(spark.read.parquet(zpath)).count() ==
      bothDims(src).count())
    assert(pkOnly(zpath).count() == pkOnly(dpath).count())
  }
}
