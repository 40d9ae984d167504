package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Extraction / class-object transformers.
  *
  * Niamoto's "class objects" are long-format stats rows
  * `(class_object, class_name, class_value)` produced by earlier
  * pipeline steps; the `class_objects/` transformers reshape them into
  * widget series. Here the long format is a plain DataFrame and every
  * reshape is a pivot/unpivot that Catalyst plans as one shuffle.
  */
object Extraction {

  /** Projection + label mapping.
    * Reference: `transformers/extraction/direct_attribute.py` — pick a
    * field, optionally map raw values to display labels.
    */
  def directAttribute(
      df: DataFrame,
      keyCols: Seq[String],
      field: String,
      labels: Map[String, String],
      target: String): DataFrame = {
    val mapped =
      if (labels.isEmpty) col(field)
      else labels.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
        when(col(field) === k, lit(v)).otherwise(acc)
      }
    df.select((keyCols.map(col) :+ coalesce(mapped, col(field)).as(target)): _*)
      .orderBy(keyCols.map(col): _*)
  }

  /** Aggregate several numeric columns (plus derived formula columns)
    * per group, then unpivot to long `(class_name, value)` rows.
    * Reference: `transformers/extraction/multi_column_extractor.py`
    * (columns + derived-formula columns → categorical distribution).
    */
  def multiColumnExtractor(
      df: DataFrame,
      groupBy: Seq[String],
      columns: Seq[String],
      derived: Seq[(String, Column)]): DataFrame = {
    val sums = df
      .groupBy(groupBy.map(col): _*)
      .agg(
        Num.dsum(col(columns.head)).as(columns.head),
        (columns.tail.map(c => Num.dsum(col(c)).as(c)) ++
          derived.map { case (n, e) => Num.dsum(e).as(n) }): _*)
    val names = columns ++ derived.map(_._1)
    val stackExpr = names.map(n => s"'$n', `$n`").mkString(", ")
    sums.selectExpr(
      (groupBy :+ s"stack(${names.size}, $stackExpr) as (class_name, value)"): _*)
      .orderBy((groupBy :+ "class_name").map(col): _*)
  }

  /** D6 — semi-structured attribute extraction: parse a JSON string
    * column against an EXPLICIT schema and surface its fields as typed
    * top-level columns (the reference imports JSON attribute blobs into
    * typed columns during import; `from_json` is the schema-on-read
    * form that stays a codegen'd column expression — no UDF, no
    * inference pass, malformed rows yield nulls instead of failures).
    */
  def jsonAttributes(
      df: DataFrame,
      jsonCol: String,
      schema: org.apache.spark.sql.types.StructType,
      keep: Seq[String]): DataFrame =
    df.select(
      keep.map(col) :+ from_json(col(jsonCol), schema).as("_parsed"): _*)
      .select(
        keep.map(col) ++
          schema.fieldNames.toSeq.map(f => col(s"_parsed.$f").as(f)): _*)

  /** Select one class_object's series from a long stats table against a
    * FIXED category list (zero-filled, stable order).
    * Reference: `transformers/class_objects/categories_extractor.py`.
    */
  def categoriesExtractor(
      long: DataFrame,
      classObject: String,
      categories: Seq[String]): DataFrame = {
    val catDf = long.sparkSession.createDataFrame(
      categories.zipWithIndex.map { case (c, i) => (c, i) }
    ).toDF("class_name", "cat_order")
    broadcast(catDf)
      .join(
        long.filter(col("class_object") === classObject),
        Seq("class_name"), "left")
      .select(col("class_name"), col("cat_order"),
        coalesce(col("class_value"), lit(0.0)).as("value"))
      .orderBy("cat_order")
  }

  /** Pivot several class_objects over a shared axis: one row per axis
    * value, one column per requested series (missing cells → 0).
    * Reference: `transformers/class_objects/series_by_axis_extractor.py`
    * (e.g. forest types × elevation bands).
    */
  def seriesByAxis(
      long: DataFrame,
      series: Map[String, String]): DataFrame = {
    val objects = series.values.toSeq
    val renames = series.toSeq.map { case (out, obj) => (obj, out) }.toMap
    val pivoted = long
      .filter(col("class_object").isin(objects: _*))
      .groupBy(col("class_name").as("axis"))
      .pivot("class_object", objects)
      .agg(first(col("class_value")))
    renames.foldLeft(pivoted) { case (d, (obj, out)) =>
      d.withColumnRenamed(obj, out)
    }.na.fill(0.0, renames.values.toSeq)
      .orderBy("axis")
  }

  /** Ratio/difference of two class_object series along the axis.
    * Reference: `transformers/class_objects/series_ratio_aggregator.py`
    * — 'ratio' = 1 − subset/total, 'difference' = total − subset.
    */
  def seriesRatio(
      long: DataFrame,
      totalObject: String,
      subsetObject: String,
      mode: String = "ratio"): DataFrame = {
    val wide = seriesByAxis(long, Map("total" -> totalObject, "subset" -> subsetObject))
    val out = mode match {
      case "ratio" =>
        when(col("total") =!= 0.0, lit(1.0) - col("subset") / col("total"))
      case "difference" => col("total") - col("subset")
      case other => throw new IllegalArgumentException(s"mode: $other")
    }
    wide.select(col("axis"), col("total"), col("subset"), out.as("result"))
      .orderBy("axis")
  }
}
