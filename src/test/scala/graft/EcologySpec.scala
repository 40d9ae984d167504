package graft

import graft.operators.Ecology

class EcologySpec extends SparkSpec {
  import spark.implicits._

  test("elevationProfile snaps bins to 100 and closes the top bin") {
    val cells = Seq(
      // zone 1: elevations 50..950 → bins snap to [0, 1000], width 100
      (1, 50.0, true), (1, 250.0, false), (1, 950.0, true), (1, 1000.0, true),
      // zone 2: single band
      (2, 110.0, false), (2, 190.0, false),
    ).toDF("zone", "elevation", "forest")
    val out = Ecology.elevationProfile(
      cells, "zone", "elevation", "forest", nBins = 10, pixelArea = 2.0)
      .collect()
    val z1 = out.filter(_.getInt(0) == 1)
    // 1000.0 == max edge → folded into last bin (numpy closed top edge)
    val top = z1.find(_.getAs[Int]("bin") == 9).get
    assert(top.getAs[Long]("pixel_count") == 2L)
    assert(top.getAs[Double]("elev_hi") == 1000.0)
    assert(top.getAs[Double]("area") == 4.0)
    val z2 = out.filter(_.getInt(0) == 2)
    // zone 2 snaps to [100, 200]: width 10, elevations land in bins 1 and 9
    assert(z2.map(_.getAs[Int]("bin")).toSet == Set(1, 9))
    assert(z2.forall(_.getAs[Double]("forest_pct") == 0.0))
  }

  test("forestElevationMatrix yields per-type percentages and total") {
    val cells = Seq(
      (1, 100.0, "core"), (1, 150.0, "none"), (1, 180.0, "mature"),
      (1, 450.0, "core"),
      (1, 2000.0, "core"), // outside edges → dropped
    ).toDF("zone", "elevation", "forest_type")
    val out = Ecology.forestElevationMatrix(
      cells, "zone", "elevation", "forest_type",
      edges = Seq(0.0, 300.0, 600.0), types = Seq("core", "mature", "secondary"))
      .collect()
    assert(out.length == 2)
    val bin0 = out.find(_.getAs[Int]("bin") == 0).get
    assert(bin0.getAs[Long]("n_pixels") == 3L)
    assert(math.abs(bin0.getAs[Double]("pct_core") - 100.0 / 3) < 1e-12)
    assert(bin0.getAs[Double]("pct_secondary") == 0.0)
    assert(math.abs(bin0.getAs[Double]("pct_forest_total") - 200.0 / 3) < 1e-12)
    val bin1 = out.find(_.getAs[Int]("bin") == 1).get
    assert(bin1.getAs[Double]("pct_forest_total") == 100.0)
    assert(bin1.getAs[Double]("elev_lo") == 300.0)
  }

  test("holdridgeFractions splits zone totals into forest and non-forest") {
    val cells = Seq(
      (1, 1, true), (1, 1, false), (1, 2, true), (1, 2, true),
    ).toDF("zone", "life_zone", "forest")
    val out = Ecology.holdridgeFractions(cells, "zone", "life_zone", "forest")
      .collect()
    val lz1 = out.find(_.getAs[Int]("life_zone") == 1).get
    assert(lz1.getAs[Double]("forest_frac") == 0.25)
    assert(lz1.getAs[Double]("non_forest_frac") == 0.25)
    val lz2 = out.find(_.getAs[Int]("life_zone") == 2).get
    assert(lz2.getAs[Double]("forest_frac") == 0.5)
    assert(lz2.getAs[Double]("non_forest_frac") == 0.0)
  }

  test("fragmentationMetrics computes meff, LPI and edge density") {
    val patches = Seq(
      (1, 10.0, 40.0), (1, 30.0, 80.0),
    ).toDF("zone", "patch_area", "perimeter")
    val landscape = Seq((1, 100.0)).toDF("zone", "landscape_area")
    val r = Ecology.fragmentationMetrics(
      patches, landscape, "zone", "patch_area", "perimeter", "landscape_area")
      .collect().head
    assert(r.getAs[Long]("patch_count") == 2L)
    assert(r.getAs[Double]("total_forest_area") == 40.0)
    assert(r.getAs[Double]("meff") == (100.0 + 900.0) / 100.0)
    assert(r.getAs[Double]("largest_patch_index") == 30.0)
    assert(r.getAs[Double]("edge_density") == 1.2)
  }

  test("patchSizeClasses bins with open top class and forest-share pct") {
    val patches = Seq(
      (1, 0.5), (1, 3.0), (1, 30.0),
    ).toDF("zone", "patch_area")
    val out = Ecology.patchSizeClasses(
      patches, "zone", "patch_area", edges = Seq(0.0, 1.0, 5.0, 10.0))
      .collect()
    // classes: [0,1) [1,5) [5,10) and >=10 open top
    assert(out.map(r => (r.getAs[Int]("size_class"), r.getAs[Long]("n_patches"))).toSet ==
      Set((0, 1L), (1, 1L), (3, 1L)))
    val top = out.find(_.getAs[Int]("size_class") == 3).get
    assert(math.abs(top.getAs[Double]("pct_of_forest") - 30.0 * 100 / 33.5) < 1e-9)
  }

  test("diversityIndices computes Shannon, Pielou and Simpson per zone") {
    // zone 1: categories a×2, b×2 → p = (0.5, 0.5)
    //   H = ln 2, J = 1, simpson = 0.5
    // zone 2: single category → H = 0, J undefined (null), simpson = 0
    val cells = Seq(
      (1, "a"), (1, "a"), (1, "b"), (1, "b"),
      (2, "a"), (2, "a"),
    ).toDF("zone", "cat")
    val out = Ecology.diversityIndices(cells, Seq("zone"), "cat")
      .collect().map(r => r.getInt(0) -> r).toMap
    val z1 = out(1)
    assert(z1.getAs[Int]("richness") == 2)
    assert(z1.getAs[Long]("total") == 4L)
    assert(math.abs(z1.getAs[Double]("shannon") - math.log(2)) < 1e-15)
    assert(math.abs(z1.getAs[Double]("pielou") - 1.0) < 1e-15)
    assert(z1.getAs[Double]("simpson") == 0.5)
    val z2 = out(2)
    assert(z2.getAs[Double]("shannon") == 0.0)
    assert(z2.isNullAt(z2.fieldIndex("pielou")))
    assert(z2.getAs[Double]("simpson") == 0.0)
  }

  test("SeriesOps array arithmetic matches hand computation") {
    import org.apache.spark.sql.functions.col
    val df = Seq((Seq(2.0, 4.0, 6.0), Seq(1.0, 0.0, 3.0))).toDF("a", "b")
    val r = df.select(
      Ecology.SeriesOps.divide(col("a"), col("b")).as("div"),
      Ecology.SeriesOps.multiply(col("a"), col("b")).as("mul"),
      Ecology.SeriesOps.normalize(col("a")).as("norm"),
      Ecology.SeriesOps.weightedSum(col("a"), Seq(0.5, 1.0, 2.0)).as("wsum"),
      Ecology.SeriesOps.sliceSum(col("a"), 2, 2).as("ssum")).collect().head
    assert(r.getSeq[Any](0) == Seq(2.0, null, 2.0)) // div-by-zero → null
    assert(r.getSeq[Double](1) == Seq(2.0, 0.0, 18.0))
    assert(r.getSeq[Double](2).map(x => math.round(x * 100) / 100.0) ==
      Seq(0.17, 0.33, 0.5))
    assert(r.getDouble(3) == 1.0 + 4.0 + 12.0)
    assert(r.getDouble(4) == 10.0)
  }

  test("landUse reports category areas as share of zone total") {
    val features = Seq(
      (1, "veg", "forest", 30.0), (1, "veg", "shrub", 20.0),
      (1, "tenure", "public", 50.0),
    ).toDF("zone", "layer", "category", "area")
    val totals = Seq((1, 200.0)).toDF("zone", "total_area")
    val out = Ecology.landUse(
      features, totals, "zone", "layer", "category", "area", "total_area")
      .collect()
    assert(out.length == 3)
    val forest = out.find(_.getAs[String]("category") == "forest").get
    assert(forest.getAs[Double]("pct_of_zone") == 15.0)
  }
}
