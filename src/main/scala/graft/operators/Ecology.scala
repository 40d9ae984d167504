package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ecological analysis transformers (SURVEY.md §2 N) — the reference's
  * `transformers/ecological/` suite re-expressed set-at-a-time.
  *
  * The reference runs each analysis per shape: mask a raster (DEM,
  * Holdridge zones) or clip a vector layer (forest cover, land use)
  * with ONE zone geometry, then tally pixels/areas per class in numpy
  * (`ecological/elevation_profile.py:191`, `forest_elevation.py:314`,
  * `forest_holdridge.py:244`, `fragmentation.py:278`, `land_use.py:246`).
  * Here the rasterized world is a long cell table `(zone, cell attrs…)`
  * — the shape a distributed engine actually stores planetary rasters
  * in — and every per-shape numpy loop becomes one `groupBy(zone, …)`
  * over all zones at once: 10⁶ shapes cost one shuffle, not 10⁶ masks.
  * Per-pixel predicates stay codegen'd column expressions so the
  * parquet scan prunes to exactly the referenced attribute columns.
  */
object Ecology {

  /** N1 — elevation profile (`ecological/elevation_profile.py`):
    * per-zone altitude histogram with DATA-DRIVEN bins — each zone's
    * range is snapped to 100 m (floor/ceil), split into `nBins` equal
    * classes (numpy linspace semantics; top edge closed) — plus pixel
    * counts, surface area (`count × pixelArea`), and the forest-pixel
    * overlay share per class.
    *
    * Two scans over the cell table (min/max per zone, then the binned
    * tally), both shuffling only on `zone` — the per-zone bin spec
    * travels with the rows, never to the driver.
    */
  def elevationProfile(
      cells: DataFrame,
      zoneCol: String,
      elevCol: String,
      forestCol: String,
      nBins: Int,
      pixelArea: Double): DataFrame = {
    val bounds = cells
      .groupBy(col(zoneCol))
      .agg(
        (floor(min(col(elevCol)) / 100.0) * 100.0).as("min_elev"),
        (ceil(max(col(elevCol)) / 100.0) * 100.0).as("max_elev"))
      .withColumn("bin_width", (col("max_elev") - col("min_elev")) / nBins)
    cells
      .join(bounds, zoneCol)
      .withColumn(
        "bin",
        least(
          floor((col(elevCol) - col("min_elev")) / col("bin_width")),
          lit(nBins - 1L)).cast("int"))
      .groupBy(col(zoneCol), col("bin"), col("min_elev"), col("bin_width"))
      .agg(
        count(lit(1)).as("pixel_count"),
        count(when(col(forestCol), 1)).as("forest_pixels"))
      .select(
        col(zoneCol), col("bin"),
        (col("min_elev") + col("bin") * col("bin_width")).as("elev_lo"),
        (col("min_elev") + (col("bin") + 1) * col("bin_width")).as("elev_hi"),
        col("pixel_count"),
        (col("pixel_count") * pixelArea).as("area"),
        col("forest_pixels"),
        (col("forest_pixels") * lit(100.0) / col("pixel_count")).as("forest_pct"))
      .orderBy(col(zoneCol), col("bin"))
  }

  /** N2 — forest types × elevation (`ecological/forest_elevation.py`):
    * FIXED ascending bin edges; per (zone, elevation class) the share
    * of pixels carried by each forest type plus the all-types total —
    * the stacked-area-chart matrix, in long form with the type list
    * pivoted to columns (missing types → 0 %).
    *
    * Cells outside `[first, last)` are dropped, matching the
    * reference's per-bin masks.
    */
  def forestElevationMatrix(
      cells: DataFrame,
      zoneCol: String,
      elevCol: String,
      typeCol: String,
      edges: Seq[Double],
      types: Seq[String]): DataFrame = {
    require(edges.size >= 2 && edges.sliding(2).forall(p => p(0) < p(1)),
      "edges must be ascending")
    // fixed edge list → a CASE ladder, codegen'd, no join needed
    val bin = (0 until edges.size - 1).foldLeft(lit(null).cast("int")) {
      case (acc, i) =>
        when(col(elevCol) >= edges(i) && col(elevCol) < edges(i + 1), lit(i))
          .otherwise(acc)
    }
    val typed = cells
      .withColumn("bin", bin)
      .filter(col("bin").isNotNull)
      .groupBy(col(zoneCol), col("bin"))
      .agg(
        count(lit(1)).as("n_pixels"),
        (types.map(t =>
          count(when(col(typeCol) === t, 1)).as(s"n_$t")) :+
          count(when(col(typeCol).isin(types: _*), 1)).as("n_forest")): _*)
    typed.select(
      (Seq(col(zoneCol), col("bin"),
        element_at(
          // edge lookup by bin index — a literal array, no shuffle
          array(edges.map(lit): _*), col("bin") + 1).as("elev_lo"),
        element_at(array(edges.map(lit): _*), col("bin") + 2).as("elev_hi"),
        col("n_pixels")) ++
        types.map(t =>
          (col(s"n_$t") * lit(100.0) / col("n_pixels")).as(s"pct_$t")) :+
        (col("n_forest") * lit(100.0) / col("n_pixels")).as("pct_forest_total")): _*)
      .orderBy(col(zoneCol), col("bin"))
  }

  /** N3 — Holdridge life-zone split (`ecological/forest_holdridge.py`):
    * per (zone, life-zone) the forest and non-forest pixel share of the
    * zone's TOTAL valid pixels (the reference's
    * `zone_pixels / total_valid_pixels` pair, unrounded).
    */
  def holdridgeFractions(
      cells: DataFrame,
      zoneCol: String,
      lifeZoneCol: String,
      forestCol: String): DataFrame = {
    val w = Window.partitionBy(zoneCol)
    cells
      .groupBy(col(zoneCol), col(lifeZoneCol))
      .agg(
        count(lit(1)).as("n_pixels"),
        count(when(col(forestCol), 1)).as("n_forest"))
      .withColumn("zone_total", sum("n_pixels").over(w))
      .select(
        col(zoneCol), col(lifeZoneCol),
        (col("n_forest").cast("double") / col("zone_total")).as("forest_frac"),
        ((col("n_pixels") - col("n_forest")).cast("double") / col("zone_total"))
          .as("non_forest_frac"))
      .orderBy(col(zoneCol), col(lifeZoneCol))
  }

  /** N4 — fragmentation metrics (`ecological/fragmentation.py`): from a
    * patch table `(zone, patch_area, perimeter)` — the reference's
    * exploded multipolygon parts — compute per zone: patch count, total
    * forest area, effective mesh size `meff = Σa²/A_landscape`, largest
    * patch (+ index, % of landscape), and edge density
    * `Σperimeter/A_landscape`. Landscape areas ride in on a broadcast
    * dim `(zone, landscape_area)`.
    *
    * All sums go through exact decimal accumulation ([[Num.dsum]]) so
    * the metrics are reproducible under any partitioning.
    */
  def fragmentationMetrics(
      patches: DataFrame,
      landscape: DataFrame,
      zoneCol: String,
      areaCol: String,
      perimeterCol: String,
      landscapeAreaCol: String): DataFrame =
    patches
      .groupBy(col(zoneCol))
      .agg(
        count(lit(1)).as("patch_count"),
        Num.dsum(col(areaCol)).as("total_forest_area"),
        Num.dsum(col(areaCol) * col(areaCol)).as("sum_sq_area"),
        max(col(areaCol)).as("largest_patch"),
        Num.dsum(col(perimeterCol)).as("total_edge"))
      .join(broadcast(landscape), zoneCol)
      .select(
        col(zoneCol), col("patch_count"), col("total_forest_area"),
        (col("sum_sq_area") / col(landscapeAreaCol)).as("meff"),
        col("largest_patch"),
        (col("largest_patch") * lit(100.0) / col(landscapeAreaCol))
          .as("largest_patch_index"),
        (col("total_edge") / col(landscapeAreaCol)).as("edge_density"))
      .orderBy(col(zoneCol))

  /** N4b — patch size-class distribution (`fragmentation.py:288`):
    * count + area + % of forest area per size class, on explicit
    * ascending class edges with an open top class (`lo ≤ a < hi`).
    */
  def patchSizeClasses(
      patches: DataFrame,
      zoneCol: String,
      areaCol: String,
      edges: Seq[Double]): DataFrame = {
    val cls = edges.indices.foldLeft(lit(null).cast("int")) { case (acc, i) =>
      val lo = col(areaCol) >= edges(i)
      val in = if (i + 1 < edges.size) lo && col(areaCol) < edges(i + 1) else lo
      when(in, lit(i)).otherwise(acc)
    }
    val w = Window.partitionBy(zoneCol)
    patches
      .withColumn("size_class", cls)
      .filter(col("size_class").isNotNull)
      .groupBy(col(zoneCol), col("size_class"))
      .agg(count(lit(1)).as("n_patches"), Num.dsum(col(areaCol)).as("class_area"))
      // class_area is 4dp-exact, so the zone total re-sums through
      // decimal — window frame order must not leak into the doubles
      .withColumn("zone_area",
        sum(col("class_area").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .over(w).cast("double"))
      .select(
        col(zoneCol), col("size_class"), col("n_patches"), col("class_area"),
        (col("class_area") * lit(100.0) / col("zone_area")).as("pct_of_forest"))
      .orderBy(col(zoneCol), col("size_class"))
  }

  /** N6 — diversity indices (`ecological/custom_calculator.py`:
    * `shannon_entropy`, `pielou_evenness` — the reference's core
    * biodiversity metrics, plus richness and Simpson): per group over a
    * category column,
    *   richness S, total N, H = −Σ pᵢ·ln(pᵢ), J = H/ln(S),
    *   simpson = 1 − Σ pᵢ²  (pᵢ = category share).
    * The per-category counts collapse to ONE row per group before any
    * floating point happens, and the Σ folds run over the
    * category-sorted count array — a FIXED evaluation order, so the
    * transcendental sums are reproducible under any partitioning (the
    * same trick as the cosine fold; decimal sums can't help here
    * because ln() output is irrational).
    */
  def diversityIndices(
      cells: DataFrame,
      groupBy: Seq[String],
      categoryCol: String): DataFrame = {
    val counts = cells
      .groupBy((groupBy :+ categoryCol).map(col): _*)
      .agg(count(lit(1)).as("n"))
    val grouped = counts
      .groupBy(groupBy.map(col): _*)
      .agg(
        count(lit(1)).cast("int").as("richness"),
        sum("n").as("total"),
        // category-sorted counts → deterministic fold order
        transform(
          sort_array(collect_list(struct(col(categoryCol), col("n")))),
          s => s.getField("n")).as("__counts"))
    val p = (n: Column) => n.cast("double") / col("total").cast("double")
    grouped.select(
      (groupBy.map(col) :+ col("richness") :+ col("total") :+
        (-aggregate(col("__counts"), lit(0.0),
          (acc, n) => acc + p(n) * log(p(n)))).as("shannon") :+
        (lit(1.0) - aggregate(col("__counts"), lit(0.0),
          (acc, n) => acc + p(n) * p(n))).as("simpson")): _*)
      .withColumn("pielou",
        when(col("richness") > 1,
          col("shannon") / log(col("richness").cast("double"))))
      .orderBy(groupBy.map(col): _*)
  }

  /** N6b — the rest of `custom_calculator.py`'s operation set as plain
    * column expressions over array columns (`array_division`,
    * `array_multiplication`, `normalize_array`, `weighted_sum`,
    * `sum_array_slice`): each is a codegen'd higher-order function, no
    * UDF, usable on any `array<double>` column. Folds are sequential →
    * deterministic under any partitioning. */
  object SeriesOps {
    def divide(a: Column, b: Column): Column =
      zip_with(a, b, (x, y) => when(y =!= 0.0, x / y))
    def multiply(a: Column, b: Column): Column = zip_with(a, b, _ * _)
    def normalize(a: Column): Column = {
      val total = aggregate(a, lit(0.0), _ + _)
      transform(a, x => when(total =!= 0.0, x / total))
    }
    def weightedSum(a: Column, weights: Seq[Double]): Column =
      aggregate(
        zip_with(a, array(weights.map(lit): _*), _ * _), lit(0.0), _ + _)
    def sliceSum(a: Column, from: Int, len: Int): Column =
      aggregate(slice(a, from, len), lit(0.0), _ + _)
  }

  /** N5 — land-use breakdown (`ecological/land_use.py`): from a clipped
    * feature table `(zone, layer, category, area)`, the area per (zone,
    * layer, category) and its share of the zone's total area (a
    * broadcast `(zone, total_area)` dim, the reference's shape area).
    */
  def landUse(
      features: DataFrame,
      zoneTotals: DataFrame,
      zoneCol: String,
      layerCol: String,
      categoryCol: String,
      areaCol: String,
      totalAreaCol: String): DataFrame =
    features
      .groupBy(col(zoneCol), col(layerCol), col(categoryCol))
      .agg(count(lit(1)).as("n_features"), Num.dsum(col(areaCol)).as("area"))
      .join(broadcast(zoneTotals), zoneCol)
      .select(
        col(zoneCol), col(layerCol), col(categoryCol), col("n_features"),
        col("area"),
        (col("area") * lit(100.0) / col(totalAreaCol)).as("pct_of_zone"))
      .orderBy(col(zoneCol), col(layerCol), col(categoryCol))
}
