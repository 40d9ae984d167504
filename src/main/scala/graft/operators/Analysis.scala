package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Analysis transformers.
  * Reference: niamoto `core/plugins/transformers/analysis/`.
  */
object Analysis {

  /** A8b — deterministic column TYPE/ROLE detection on import (the
    * data-path subset of reference `core/utils/column_detector.py`
    * ID/GEOMETRY/DATE/NAME pattern lists + `core/imports/profiler.py`
    * `_profile_column`/`_detect_semantic_value_rules`; the surrounding
    * ML suggesters are config-UX, out of scope per SURVEY §6).
    *
    * ONE aggregation pass computes per-column null/distinct stats plus
    * a WKT value flag for string columns (`bool_or(v RLIKE
    * 'POINT|POLYGON|LINESTRING')` — the profiler's value rule made
    * order-independent: it samples "first 5 non-null" which has no
    * deterministic meaning on a distributed scan, so we test EVERY
    * value; one shared scan either way). Name rules are evaluated on
    * the driver against schema metadata (they are functions of the
    * column NAME, not data). Role cascade, first match wins:
    * identifier → geometry → temporal → label, then dtype:
    * numeric = `measure` (or `categorical` when n_distinct ≤ 20),
    * string = `categorical` when n_distinct ≤ 100 else `text`,
    * boolean = `flag`, anything else `other`. */
  def columnRoles(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnRoles: need at least one column")
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.foreach(c => require(fields.contains(c), s"columnRoles: no column '$c'"))
    def isString(c: String) =
      fields(c) == org.apache.spark.sql.types.StringType
    def isNumeric(c: String) =
      fields(c).isInstanceOf[org.apache.spark.sql.types.NumericType]
    def isTemporalType(c: String) = fields(c) match {
      case org.apache.spark.sql.types.DateType => true
      case _: org.apache.spark.sql.types.TimestampType => true
      case org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }
    // name rules (reference column_detector.py pattern lists; 'key'
    // from its RELATIONSHIP_IDENTIFIER_MARKERS)
    val idRe = "^id$|.*_id$|^id_.*|^identifier$|^code$|.*_code$|.*key$".r
    val geoNames = Seq("geometry", "geom", "wkt", "geo_pt", "geo_point",
      "location", "shape", "the_geom")
    val dateNames = Seq("date", "time", "datetime", "timestamp", "created",
      "updated", "modified", "observed", "collected")
    val labelNames = Seq("name", "label", "title")
    def nameId(c: String) = idRe.matches(c.toLowerCase)
    def nameGeo(c: String) = { val l = c.toLowerCase; geoNames.exists(l.contains) }
    def nameDate(c: String) = { val l = c.toLowerCase; dateNames.exists(l.contains) }
    def nameLabel(c: String) = { val l = c.toLowerCase; labelNames.exists(l.contains) }
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        (if (isString(c))
          coalesce(max(col(c).rlike("POINT|POLYGON|LINESTRING")), lit(false))
        else lit(false)).as(s"__wkt_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(cols.map { c =>
        val isId = lit(nameId(c))
        val isGeo = lit(nameGeo(c)) || col(s"__wkt_$c")
        val isDate = lit(nameDate(c) || isTemporalType(c))
        val isLabel = lit(nameLabel(c))
        val nd = col(s"__nd_$c")
        val dtypeRole =
          if (isNumeric(c)) when(nd <= 20, "categorical").otherwise("measure")
          else if (isString(c)) when(nd <= 100, "categorical").otherwise("text")
          else if (fields(c) == org.apache.spark.sql.types.BooleanType) lit("flag")
          else lit("other")
        struct(
          lit(c).as("column_name"),
          lit(fields(c).catalogString).as("dtype"),
          col("__n").as("n_rows"),
          (col("__n") - col(s"__nn_$c")).as("n_nulls"),
          nd.as("n_distinct"),
          (nd.cast("double") / col("__n")).as("unique_ratio"),
          isId.as("is_id"),
          isGeo.as("is_geometry"),
          isDate.as("is_date"),
          isLabel.as("is_label"),
          when(isId, "identifier").when(isGeo, "geometry")
            .when(isDate, "temporal").when(isLabel, "label")
            .otherwise(dtypeRole).as("role"))
      }: _*)).as("p"))
      .select("p.*")
      .orderBy("column_name")
  }

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
