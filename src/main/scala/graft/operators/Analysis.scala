package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Analysis transformers.
  * Reference: niamoto `core/plugins/transformers/analysis/`.
  */
object Analysis {

  /** Per-group paired-variable summary: n, deterministic Pearson
    * correlation, exact-decimal means of both variables.
    * Reference: `transformers/analysis/scatter_analysis.py` (x/y pair
    * extraction for scatter widgets + trend).
    */
  def scatterAnalysis(
      df: DataFrame,
      xField: String,
      yField: String,
      groupBy: Seq[String]): DataFrame = {
    val x = col(xField)
    val y = col(yField)
    val paired = df.filter(x.isNotNull && y.isNotNull)
    paired
      .groupBy(groupBy.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        Num.dmean(x).as("x_mean"),
        Num.dmean(y).as("y_mean"),
        Num.dcorr(x, y).as("correlation"))
      .orderBy(groupBy.map(col): _*)
  }

  /** Agreement counts between two boolean predicates per group:
    * both / only-a / only-b / neither.
    * Reference: `transformers/analysis/boolean_comparison.py`.
    */
  def booleanComparison(
      df: DataFrame,
      a: Column,
      b: Column,
      groupBy: Seq[String]): DataFrame =
    df.groupBy(groupBy.map(col): _*)
      .agg(
        count(when(a && b, 1)).as("both_true"),
        count(when(a && !b, 1)).as("only_a"),
        count(when(!a && b, 1)).as("only_b"),
        count(when(!a && !b, 1)).as("both_false"))
      .orderBy(groupBy.map(col): _*)
}
