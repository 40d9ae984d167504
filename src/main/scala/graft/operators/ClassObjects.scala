package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Class-object reshape transformers (SURVEY.md §2 O) — the rest of the
  * reference's `transformers/class_objects/` family beyond the
  * categories/series-by-axis/ratio trio in [[Extraction]].
  *
  * Input contract is the reference's long stats format: one row per
  * `(class_object, class_name, class_value)` (duplicate class rows are
  * collapsed by sum first, mirroring `class_objects/utils.py::
  * aggregate_class_values`). The reference reshapes these per entity in
  * pandas; here each reshape is a grouped aggregation or broadcast
  * mapping join over ALL entities' rows at once — the mapping specs are
  * literal CASE ladders / broadcast dims, so nothing leaves the
  * executors.
  */
object ClassObjects {

  /** Collapse duplicate (class_object, class_name) rows by summing
    * values — `class_objects/utils.py::aggregate_class_values`. */
  def collapse(long: DataFrame): DataFrame =
    long.groupBy("class_object", "class_name")
      .agg(Num.dsum(col("class_value")).as("class_value"))

  /** O1 — binary/ternary distribution
    * (`class_objects/binary_aggregator.py`): select one class_object,
    * map raw class names onto output classes (many→one), sum values per
    * output class, and zero-fill classes the mapping can produce but the
    * data doesn't. `label` tags the group in the output.
    */
  def binaryAggregator(
      long: DataFrame,
      classObject: String,
      mapping: Map[String, String],
      label: String): DataFrame = {
    val outClasses = mapping.values.toSeq.distinct.sorted
    val mapExpr = mapping.foldLeft(lit(null).cast("string")) {
      case (acc, (from, to)) => when(col("class_name") === from, lit(to)).otherwise(acc)
    }
    val shell = long.sparkSession
      .createDataFrame(outClasses.map(Tuple1(_))).toDF("out_class")
    val mapped = collapse(long.filter(col("class_object") === classObject))
      .withColumn("out_class", mapExpr)
      .filter(col("out_class").isNotNull)
      .groupBy("out_class")
      .agg(Num.dsum(col("class_value")).as("value"))
    broadcast(shell)
      .join(mapped, Seq("out_class"), "left")
      .select(
        lit(label).as("label"), col("out_class"),
        coalesce(col("value"), lit(0.0)).as("value"))
      .orderBy("out_class")
  }

  /** O2 — categories mapper (`class_objects/categories_mapper.py`):
    * relabel selected class rows into (category, subcategory) cells,
    * 0.0 where the source class is absent. `picks` rows:
    * (category, subcategory, class_object, class_name).
    */
  def categoriesMapper(
      long: DataFrame,
      picks: Seq[(String, String, String, String)]): DataFrame = {
    val pickDf = long.sparkSession
      .createDataFrame(picks)
      .toDF("category", "subcategory", "class_object", "class_name")
    broadcast(pickDf)
      .join(collapse(long), Seq("class_object", "class_name"), "left")
      .select(
        col("category"), col("subcategory"),
        coalesce(col("class_value"), lit(0.0)).as("value"))
      .orderBy("category", "subcategory")
  }

  /** O3 — multi-source field profile (`class_objects/field_aggregator
    * .py` + `aggregation/reference_enrichment_profile.py`): pull named
    * aggregates out of several sources into one provenance-tagged
    * `(source, field, value, units)` summary. Each source contributes
    * one aggregation pass; the union is a plan-level concat (no
    * shuffle beyond each source's own aggregate).
    */
  def fieldProfile(
      sources: Seq[(String, DataFrame, Seq[(String, Column, String)])]): DataFrame =
    sources.map { case (sourceName, df, fields) =>
      val aggd = df.agg(fields.head._2.as(fields.head._1),
        fields.tail.map { case (n, c, _) => c.as(n) }: _*)
      val stackExpr = fields
        .map { case (n, _, _) => s"'$n', CAST(`$n` AS DOUBLE)" }
        .mkString(", ")
      val unitExpr = fields.foldLeft(lit(null).cast("string")) {
        case (acc, (n, _, u)) => when(col("field") === n, lit(u)).otherwise(acc)
      }
      aggd
        .selectExpr(s"stack(${fields.size}, $stackExpr) as (field, value)")
        .select(lit(sourceName).as("source"), col("field"), col("value"),
          unitExpr.as("units"))
    }.reduce(_ unionByName _).orderBy("source", "field")

  /** O4 — paired series (`class_objects/series_extractor.py`): one
    * class_object's rows as a (size, value) series ordered by the
    * numeric size axis (`class_name` parsed numeric, the reference's
    * `size_field.numeric`).
    */
  def seriesExtractor(
      long: DataFrame,
      classObject: String,
      sizeName: String,
      valueName: String): DataFrame =
    collapse(long.filter(col("class_object") === classObject))
      .select(
        col("class_name").cast("double").as(sizeName),
        col("class_value").as(valueName))
      .orderBy(sizeName)

  /** O5 — series matrix (`class_objects/series_matrix_extractor.py`):
    * several class_objects pivoted over a shared numeric axis, each
    * series scaled and optionally complemented (`100 − v·scale`),
    * missing cells → 0 after transform of 0.
    */
  def seriesMatrix(
      long: DataFrame,
      series: Seq[(String, String, Double, Boolean)]): DataFrame = {
    val objects = series.map(_._2)
    val pivoted = collapse(long.filter(col("class_object").isin(objects: _*)))
      .groupBy(col("class_name").cast("double").as("axis"))
      .pivot("class_object", objects)
      .agg(first("class_value"))
    series.foldLeft(pivoted) { case (df, (out, obj, scale, complement)) =>
      val v = coalesce(col(s"`$obj`"), lit(0.0)) * scale
      df.withColumn(out, if (complement) lit(100.0) - v else v)
    }.select((col("axis") +: series.map { case (out, _, _, _) => col(out) }): _*)
      .orderBy("axis")
  }
}
