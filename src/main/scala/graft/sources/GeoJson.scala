package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GeoJSON Polygon/MultiPolygon ingestion (SURVEY.md §2 P6; ref:
  * `imports/` + `loaders/spatial.py` load real shapes and
  * `shape_processor.py` parses their geometry): a FeatureCollection
  * document → one row per vertex RING, the representation
  * [[graft.operators.Geo.rasterizeRingSet]] /
  * [[graft.operators.Geo.pointInRingSet]] consume. Holes and
  * multipolygon parts come out as additional ring rows of the same
  * feature — the even-odd rule downstream needs no outer/hole
  * distinction.
  *
  * Parsing is pure column algebra (`from_json` + higher-order array
  * ops), fully distributed — no driver-side JSON walk, no geometry
  * library. GeoJSON's one schema wrinkle — `coordinates` nests 3 deep
  * for Polygon and 4 deep for MultiPolygon — is handled by parsing the
  * document twice with both depths (PERMISSIVE mode nulls the
  * mismatched parse) and selecting by `geometry.type` per feature.
  * GeoJSON rings are closed (first vertex repeated last); the closing
  * vertex is dropped, since the ray-cast walks rings cyclically.
  *
  * Output: `feature_idx int, feature_key string, poly_idx int,
  * ring_idx int, is_hole boolean, xs array<double>, ys array<double>`.
  */
object GeoJson {

  private val polygonCoords: DataType =
    ArrayType(ArrayType(ArrayType(DoubleType)))          // rings → points → [x, y, …]
  private val multiPolygonCoords: DataType = ArrayType(polygonCoords)

  private def docSchema(coords: DataType): StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("features", ArrayType(StructType(Seq(
      StructField("properties", MapType(StringType, StringType)),
      StructField("geometry", StructType(Seq(
        StructField("type", StringType),
        StructField("coordinates", coords))))))))))

  /** Parse a FeatureCollection JSON string column into ring rows.
    * `keyProperty` names the feature property used as `feature_key`
    * (falls back to the feature index when absent). Geometry types
    * other than Polygon/MultiPolygon fail loudly — and so does any
    * NON-EMPTY document that yields no feature array under BOTH parse
    * depths. That second guard is deliberate: the dual-depth trick
    * relies on partial-results JSON parsing
    * (`spark.sql.json.enablePartialResults`, default-on since Spark
    * 3.4.1) to survive the intentional Polygon/MultiPolygon depth
    * mismatch, and with it off a mixed FeatureCollection parses to
    * all-null — which would otherwise emit a silently empty layer
    * instead of the loud failure every other ingest path here uses. */
  def featureRings(df: DataFrame, jsonCol: String, keyProperty: String): DataFrame = {
    val pfRaw = from_json(col(jsonCol), docSchema(polygonCoords))
      .getField("features")
    val mfRaw = from_json(col(jsonCol), docSchema(multiPolygonCoords))
      .getField("features")
    val noFeatures = length(trim(col(jsonCol))) > 0 &&
      pfRaw.isNull && mfRaw.isNull
    val parsed = df.select(
      // the guard rides the consumed pf column (a dangling assert
      // column would be pruned by Catalyst before it could fire)
      when(noFeatures, raise_error(concat(
        lit("geojson: non-empty document produced no features under " +
          "both Polygon and MultiPolygon schemas — malformed input, " +
          "or spark.sql.json.enablePartialResults is disabled: "),
        substring(col(jsonCol), 1, 80)))).otherwise(pfRaw).as("pf"),
      mfRaw.as("mf"))

    val feats = parsed
      .select(posexplode(col("pf")).as(Seq("feature_idx", "feat")), col("mf"))
      .select(
        col("feature_idx").cast("int").as("feature_idx"),
        coalesce(
          col("feat.properties").getItem(keyProperty),
          col("feature_idx").cast("string")).as("feature_key"),
        col("feat.geometry.type").as("gtype"),
        col("feat.geometry.coordinates").as("pcoords"),
        element_at(col("mf"), col("feature_idx") + 1)
          .getField("geometry").getField("coordinates").as("mcoords"))

    // normalize both types to MultiPolygon depth, loud on anything else
    val polys = feats.withColumn("polys",
      when(col("gtype") === "Polygon", array(col("pcoords")))
        .when(col("gtype") === "MultiPolygon", col("mcoords"))
        .otherwise(raise_error(concat(
          lit("geojson: unsupported geometry type "), col("gtype")))))

    polys
      .select(col("feature_idx"), col("feature_key"),
        posexplode(col("polys")).as(Seq("poly_idx", "rings")))
      .select(col("feature_idx"), col("feature_key"),
        col("poly_idx").cast("int").as("poly_idx"),
        posexplode(col("rings")).as(Seq("ring_idx", "pts")))
      .withColumn("pts", dropClosing(col("pts")))
      .select(
        col("feature_idx"), col("feature_key"),
        col("poly_idx"),
        col("ring_idx").cast("int").as("ring_idx"),
        (col("ring_idx") > 0).as("is_hole"),
        transform(col("pts"), p => element_at(p, 1)).as("xs"),
        transform(col("pts"), p => element_at(p, 2)).as("ys"))
  }

  /** GeoJSON closes rings by repeating the first vertex; our ring
    * contract is open (the ray-cast adds the closing edge itself).
    * Closedness is decided on the whole VERTEX (array equality), never
    * per coordinate, and dropping only when first = last also accepts
    * already-open input. */
  private def dropClosing(pts: Column): Column =
    when(size(pts) > 1 && element_at(pts, 1) === element_at(pts, -1),
      slice(pts, lit(1), size(pts) - 1)).otherwise(pts)

  /** File reader: each file is one FeatureCollection document
    * (`wholetext`), parsed distributed — one task per file, so a
    * directory of regional extracts parallelizes naturally. */
  def read(spark: SparkSession, path: String, keyProperty: String): DataFrame =
    featureRings(
      spark.read.option("wholetext", "true").text(path), "value", keyProperty)

  /** Newline-delimited GeoJSON reader (one Feature per line — the
    * public GeoJSONL/geojsonseq convention, and what [[writeFeatures]]
    * emits): line-splittable, so a huge layer reads with normal file
    * parallelism instead of one-document-one-task. Each line wraps
    * into a single-feature collection and rides the same parser. */
  def readSeq(spark: SparkSession, path: String, keyProperty: String): DataFrame = {
    val lines = spark.read.text(path)
      .where(length(trim(col("value"))) > 0)
      .select(concat(
        lit("""{"type":"FeatureCollection","features":["""),
        col("value"), lit("]}")).as("doc"))
    featureRings(lines, "doc", keyProperty)
  }

  /** GeoJSON export (ref: the reference ships GeoJSON layers for its
    * site maps): ring rows → one Feature per `keyCol` value, written
    * as newline-delimited GeoJSON. Fully distributed: rings collapse
    * to features with one dim-sized shuffle, each feature renders its
    * JSON independently (rings closed per the spec, Polygon vs
    * MultiPolygon chosen by part count), and the write is a plain
    * text sink. Round-trips through [[readSeq]] exactly. */
  def writeFeatures(
      rings: DataFrame, path: String,
      keyCol: String, polyIdxCol: String, ringIdxCol: String,
      xsCol: String, ysCol: String): Unit = {
    // ring → closed [[x,y],...] point list (re-append the first vertex)
    val pts = zip_with(
      col(xsCol).cast("array<double>"), col(ysCol).cast("array<double>"),
      (x, y) => array(x, y))
    val closed = concat(pts, slice(pts, 1, 1))
    val polys = rings
      .select(col(keyCol).as("k"), col(polyIdxCol).as("pi"),
        col(ringIdxCol).as("ri"), closed.as("pts"))
      .groupBy(col("k"), col("pi"))
      .agg(sort_array(collect_list(struct(col("ri"), col("pts")))).as("rs"))
      .select(col("k"), col("pi"),
        transform(col("rs"), r => r.getField("pts")).as("rings"))
    val features = polys
      .groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col("pi"), col("rings")))).as("ps"))
      .select(col("k"), transform(col("ps"), p => p.getField("rings")).as("polys"))
      .select(concat(
        lit("""{"type":"Feature","properties":"""),
        to_json(map(lit("name"), col("k"))), // to_json: correct string escaping
        lit(""","geometry":{"type":"""),
        when(size(col("polys")) === 1,
          concat(lit(""""Polygon","coordinates":"""),
            to_json(element_at(col("polys"), 1))))
          .otherwise(concat(lit(""""MultiPolygon","coordinates":"""),
            to_json(col("polys")))),
        lit("}}")).as("value"))
    features.write.mode(org.apache.spark.sql.SaveMode.Overwrite).text(path)
  }
}
