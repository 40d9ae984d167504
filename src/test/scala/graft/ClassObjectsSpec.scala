package graft

import org.apache.spark.sql.functions._
import graft.operators.ClassObjects

class ClassObjectsSpec extends SparkSpec {
  import spark.implicits._

  private def long =
    Seq(
      ("cover", "forest", 30.0), ("cover", "forest", 10.0), // duplicate rows collapse
      ("cover", "shrub", 20.0), ("cover", "urban", 5.0),
      ("height", "10", 2.0), ("height", "20", 6.0), ("height", "5", 1.0),
      ("cover2", "10", 50.0), ("cover2", "20", 80.0),
    ).toDF("class_object", "class_name", "class_value")

  test("binaryAggregator maps many classes onto few and zero-fills") {
    val out = ClassObjects.binaryAggregator(
      long, "cover",
      Map("forest" -> "natural", "shrub" -> "natural", "urban" -> "artificial",
        "water" -> "water"),
      label = "landcover").collect()
    assert(out.map(r => (r.getString(1), r.getDouble(2))).toSeq ==
      Seq(("artificial", 5.0), ("natural", 60.0), ("water", 0.0)))
    assert(out.forall(_.getString(0) == "landcover"))
  }

  test("categoriesMapper picks cells and zero-fills missing sources") {
    val out = ClassObjects.categoriesMapper(
      long, Seq(
        ("veg", "dense", "cover", "forest"),
        ("veg", "open", "cover", "shrub"),
        ("veg", "none", "cover", "missing_class"))).collect()
    assert(out.map(r => (r.getString(1), r.getDouble(2))).toSeq ==
      Seq(("dense", 40.0), ("none", 0.0), ("open", 20.0)))
  }

  test("fieldProfile unions provenance-tagged aggregates across sources") {
    val a = Seq((1.0), (3.0)).toDF("x")
    val b = Seq((10.0)).toDF("y")
    val out = ClassObjects.fieldProfile(Seq(
      ("alpha", a, Seq(("n", count(lit(1)), "count"), ("x_max", max(col("x")), "m"))),
      ("beta", b, Seq(("y_min", min(col("y")), "s"))))).collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getString(3))).toSeq ==
      Seq(("alpha", "n", 2.0, "count"), ("alpha", "x_max", 3.0, "m"),
        ("beta", "y_min", 10.0, "s")))
  }

  test("seriesExtractor orders by the numeric axis, not lexically") {
    val out = ClassObjects.seriesExtractor(long, "height", "size", "value").collect()
    assert(out.map(_.getDouble(0)).toSeq == Seq(5.0, 10.0, 20.0)) // not "10","20","5"
    assert(out.map(_.getDouble(1)).toSeq == Seq(1.0, 2.0, 6.0))
  }

  test("seriesMatrix scales and complements series over a shared axis") {
    val out = ClassObjects.seriesMatrix(
      long, Seq(
        ("h", "height", 10.0, false),
        ("c_inv", "cover2", 1.0, true))).collect()
    val at10 = out.find(_.getDouble(0) == 10.0).get
    assert(at10.getDouble(1) == 20.0) // 2*10
    assert(at10.getDouble(2) == 50.0) // 100-50
    val at5 = out.find(_.getDouble(0) == 5.0).get
    assert(at5.getDouble(2) == 100.0) // missing cover2 cell → 100-0
  }
}
