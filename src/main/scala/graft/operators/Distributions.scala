package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Distribution transformers (histograms / category profiles /
  * time-series presence), set-at-a-time.
  *
  * Reference: niamoto `core/plugins/transformers/distribution/`. Each
  * was a per-entity pandas computation; here one `groupBy` computes all
  * entities, and the "all bins present, zeros included" contract the
  * reference's widgets rely on is restored by cross-joining the
  * (small, literal) bin/category/month dimension with the observed
  * groups — a broadcast, never a shuffle.
  */
object Distributions {

  /** Histogram over explicit ascending bin edges; bins are left-closed
    * `[lo, hi)`, last bin closed `[lo, hi]`; out-of-range rows dropped.
    * Output has every (group, bin) pair, zero-filled, with optional
    * percentages of the group total.
    * Reference: `transformers/distribution/binned_distribution.py`.
    */
  def binnedDistribution(
      df: DataFrame,
      field: String,
      bins: Seq[Double],
      groupBy: Seq[String],
      includePercentages: Boolean = true): DataFrame = {
    require(bins.size >= 2 && bins.sliding(2).forall(p => p(0) < p(1)),
      "bins must be ascending with at least 2 edges")
    val c = col(field)
    // CASE chain (not width_bucket) so the oracle SQL can reproduce the
    // exact same boundary semantics engine-independently.
    val binIdx = bins.sliding(2).zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (Seq(lo, hi), i)) =>
        val inBin =
          if (i == bins.size - 2) c >= lo && c <= hi else c >= lo && c < hi
        when(inBin, lit(i)).otherwise(acc)
    }
    val counts = df
      .filter(c.isNotNull)
      .withColumn("bin", binIdx)
      .filter(col("bin").isNotNull)
      .groupBy((groupBy.map(col) :+ col("bin")): _*)
      .agg(count(lit(1)).as("cnt"))
    val groups = df.select(groupBy.map(col): _*).distinct()
    val binDim = df.sparkSession
      .range(bins.size - 1)
      .select(col("id").cast("int").as("bin"))
      .withColumn("bin_label",
        concat_ws("-",
          element_at(lit(bins.map(b => f"$b%.1f").toArray), col("bin") + 1),
          element_at(lit(bins.map(b => f"$b%.1f").toArray), col("bin") + 2)))
    val filled = groups
      .crossJoin(broadcast(binDim))
      .join(counts, groupBy :+ "bin", "left")
      .na.fill(0L, Seq("cnt"))
    val withPct =
      if (!includePercentages) filled
      else {
        val totals = counts.groupBy(groupBy.map(col): _*)
          .agg(sum(col("cnt")).as("total"))
        filled.join(totals, groupBy, "left")
          .withColumn("pct",
            when(col("total") > 0,
              round(col("cnt").cast(DoubleType) * 100.0 / col("total").cast(DoubleType), 2))
              .otherwise(0.0))
          .drop("total")
      }
    withPct.orderBy((groupBy.map(col) :+ col("bin")): _*)
  }

  /** Per-category counts against a FIXED category list (zero-filled,
    * stable order), plus share-of-group percentages.
    * Reference: `transformers/distribution/categorical_distribution.py:161`.
    */
  def categoricalDistribution(
      df: DataFrame,
      field: String,
      categories: Seq[String],
      groupBy: Seq[String]): DataFrame = {
    val counts = df
      .filter(col(field).isin(categories: _*))
      .groupBy((groupBy :+ field).map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumnRenamed(field, "category")
    val groups = df.select(groupBy.map(col): _*).distinct()
    val catDf = df.sparkSession.createDataFrame(
      categories.zipWithIndex.map { case (cat, i) => (cat, i) }
    ).toDF("category", "cat_order")
    val totals = counts.groupBy(groupBy.map(col): _*).agg(sum(col("cnt")).as("total"))
    groups
      .crossJoin(broadcast(catDf))
      .join(counts, groupBy :+ "category", "left")
      .na.fill(0L, Seq("cnt"))
      .join(totals, groupBy, "left")
      .withColumn("pct",
        when(col("total") > 0,
          round(col("cnt").cast(DoubleType) * 100.0 / col("total").cast(DoubleType), 2))
          .otherwise(0.0))
      .drop("total")
      .orderBy((groupBy.map(col) :+ col("cat_order")): _*)
  }

  /** Per-month (1..12) "presence percentage" profile of a value field:
    * share of that month's rows where the field is non-null and > 0.
    * All 12 months present per group, zero-filled.
    * Reference: `transformers/distribution/time_series_analysis.py:178`
    * (`_presence_percentage` per month, phenology charts).
    */
  def timeSeriesPresence(
      df: DataFrame,
      timeField: String,
      valueField: String,
      groupBy: Seq[String]): DataFrame = {
    val m = month(col(timeField))
    val present = col(valueField).isNotNull && col(valueField) > 0
    val agg = df
      .withColumn("month", m)
      .groupBy((groupBy.map(col) :+ col("month")): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(present, 1)).as("n_present"))
    val groups = df.select(groupBy.map(col): _*).distinct()
    val monthDim = df.sparkSession.range(1, 13).select(col("id").cast("int").as("month"))
    groups
      .crossJoin(broadcast(monthDim))
      .join(agg, groupBy :+ "month", "left")
      .na.fill(0L, Seq("n_rows", "n_present"))
      .withColumn("presence_pct",
        when(col("n_rows") > 0,
          round(col("n_present").cast(DoubleType) * 100.0 / col("n_rows").cast(DoubleType), 2))
          .otherwise(0.0))
      .orderBy((groupBy.map(col) :+ col("month")): _*)
  }

  /** Per-group quantile binning (`ntile`): assign each row to one of
    * `k` equal-frequency bins WITHIN its group and aggregate per bin —
    * equal-width histograms ([[binnedDistribution]]) mis-bin skewed
    * values; equal-frequency bins are the feature-engineering staple.
    * The window partitions by the group key (parallel across groups —
    * a GLOBAL ntile would serialize on one partition; for ungrouped
    * data at scale use `percentile_approx` edges + binning instead).
    * Ties break on `tieCol` so the assignment is total-order
    * deterministic. */
  /** GLOBAL equal-frequency binning without a one-partition window:
    * compute the k−1 quantile edges in one aggregate (exact
    * `percentile` for oracle-verified runs; `percentile_approx` is the
    * 100 TB path — same plan shape, sketch-mergeable state), broadcast
    * the single edge row back over the scan, and bin each value by
    * counting edges strictly below it. Two passes over the data, zero
    * global sorts. With dyadic probabilities (quartiles/eighths) and
    * integral values the interpolated edges are exact in IEEE double
    * on every engine, so the binning is portable. */
  def globalQuantileBins(
      df: DataFrame, valueCol: String, k: Int,
      exact: Boolean = false): DataFrame = {
    val probs = (1 until k).map(i => lit(i.toDouble / k))
    val v = col(valueCol).cast(DoubleType)
    val edgeAgg =
      if (exact) percentile(v, array(probs: _*))
      else percentile_approx(v, array(probs: _*), lit(10000))
    val edges = df.agg(edgeAgg.as("__edges"))
    df.crossJoin(broadcast(edges))
      .withColumn("bin",
        size(filter(col("__edges"), e => v > e)))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n"),
        min(valueCol).as("lo"),
        max(valueCol).as("hi"),
        Num.dsum(col(valueCol)).as("value_sum"))
      .orderBy("bin")
  }

  def quantileBins(
      df: DataFrame, groupBy: Seq[String], valueCol: String, tieCol: String,
      k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupBy.map(col): _*)
      .orderBy(col(valueCol), col(tieCol))
    df.withColumn("bin", ntile(k).over(w))
      .groupBy((groupBy :+ "bin").map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        min(valueCol).as("lo"),
        max(valueCol).as("hi"),
        Num.dsum(col(valueCol)).as("value_sum"))
      .orderBy((groupBy :+ "bin").map(col): _*)
  }
}
