package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators._

/** Specs for the aggregation / distribution / extraction / analysis /
  * join transformer groups (SURVEY.md §2 A, B, D, E, H) on constructed
  * inputs with hand-computed expectations.
  */
class CoreOperatorsSpec extends SparkSpec {

  test("SparkEntry.entry flagship returns rows (the driver's smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  import spark.implicits._

  private val vals = Seq(
    ("g1", 1.0), ("g1", 2.0), ("g1", 3.0), ("g1", 4.0),
    ("g2", 10.0),
  ).toDF("g", "v")

  test("statisticalSummary: exact min/mean/max/median/std/count per group") {
    val out = Aggregations.statisticalSummary(vals, "v", Seq("g")).collect()
    val g1 = out.find(_.getString(0) == "g1").get
    assert(g1.getAs[Double]("min_val") == 1.0)
    assert(g1.getAs[Double]("mean_val") == 2.5)
    assert(g1.getAs[Double]("max_val") == 4.0)
    assert(g1.getAs[Double]("median_val") == 2.5)
    assert(math.abs(g1.getAs[Double]("std_val") - math.sqrt(5.0 / 3.0)) < 1e-12)
    val g2 = out.find(_.getString(0) == "g2").get
    assert(g2.isNullAt(g2.fieldIndex("std_val"))) // undefined for n=1
  }

  test("fieldAggregator: multi-source aggregates full-outer joined on key") {
    val a = Seq((1, 5.0), (1, 7.0), (2, 1.0)).toDF("k", "x")
    val b = Seq((2, "p"), (3, "q")).toDF("k", "y")
    val out = Aggregations.fieldAggregator(Seq(
      Aggregations.FieldSpec(a, "x", "x_sum", "sum"),
      Aggregations.FieldSpec(b, "y", "y_count", "count")), key = "k")
      .collect().map(r => (r.getInt(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(out == Seq(
      (1, Some(12.0), None), (2, Some(1.0), Some(1L)), (3, None, Some(1L))))
  }

  test("topRanking: frequency ranking with deterministic tie-break") {
    val df = Seq("a", "a", "b", "b", "c").map(("g", _)).toDF("g", "v")
    val out = Aggregations.topRanking(df, "v", Seq("g"), n = 2).collect()
    // a and b tie at 2 — tie broken by value asc → a rank 1, b rank 2
    assert(out.map(r => (r.getString(1), r.getInt(3))).toSeq ==
      Seq(("a", 1), ("b", 2)))
  }

  test("binaryCounter: true/false/null counts") {
    val df = Seq(("g", Some(1.0)), ("g", Some(-1.0)), ("g", None))
      .toDF("g", "v")
    val r = Aggregations.binaryCounter(df, col("v") > 0, Seq("g")).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((1L, 1L, 1L)))
  }

  test("binnedDistribution: zero-filled bins, last bin closed") {
    val df = Seq(("g", 0.0), ("g", 5.0), ("g", 10.0), ("g", 11.0), ("g", 20.0))
      .toDF("g", "v")
    val out = Distributions.binnedDistribution(
      df, "v", bins = Seq(0.0, 10.0, 20.0), groupBy = Seq("g")).collect()
    assert(out.length == 2)
    // [0,10): {0,5}; [10,20]: {10,11,20}
    assert(out.map(_.getAs[Long]("cnt")).toSeq == Seq(2L, 3L))
    assert(out.map(_.getAs[Double]("pct")).toSeq == Seq(40.0, 60.0))
  }

  test("categoricalDistribution: fixed order, zero-filled, out-of-list dropped") {
    val df = Seq(("g", "x"), ("g", "x"), ("g", "z")).toDF("g", "c")
    val out = Distributions.categoricalDistribution(
      df, "c", categories = Seq("x", "y"), groupBy = Seq("g")).collect()
    assert(out.map(r => (r.getString(1), r.getAs[Long]("cnt"))).toSeq ==
      Seq(("x", 2L), ("y", 0L))) // z not in list; pct uses in-list total
    assert(out.head.getAs[Double]("pct") == 100.0)
  }

  test("timeSeriesPresence: all 12 months, presence share of positive values") {
    val df = Seq(
      ("g", Timestamp.valueOf("2024-03-01 00:00:00"), 5.0),
      ("g", Timestamp.valueOf("2024-03-10 00:00:00"), 0.0),
    ).toDF("g", "t", "v")
    val out = Distributions.timeSeriesPresence(df, "t", "v", Seq("g")).collect()
    assert(out.length == 12)
    val march = out.find(_.getAs[Int]("month") == 3).get
    assert(march.getAs[Long]("n_rows") == 2L && march.getAs[Long]("n_present") == 1L)
    assert(march.getAs[Double]("presence_pct") == 50.0)
    assert(out.filter(_.getAs[Int]("month") != 3).forall(_.getAs[Long]("n_rows") == 0L))
  }

  test("directAttribute maps labels with raw-value fallback") {
    val df = Seq((1, "A"), (2, "B"), (3, "UNMAPPED")).toDF("id", "code")
    val out = Extraction.directAttribute(
      df, Seq("id"), "code", Map("A" -> "Alpha", "B" -> "Beta"), "label")
      .collect().map(_.getString(1)).toSeq
    assert(out == Seq("Alpha", "Beta", "UNMAPPED"))
  }

  test("multiColumnExtractor unpivots summed columns and derived formulas") {
    val df = Seq(("g", 1.0, 10.0), ("g", 2.0, 20.0)).toDF("g", "a", "b")
    val out = Extraction.multiColumnExtractor(
      df, Seq("g"), Seq("a", "b"), Seq("a_plus_b" -> (col("a") + col("b"))))
      .collect().map(r => (r.getString(1), r.getDouble(2))).toMap
    assert(out == Map("a" -> 3.0, "b" -> 30.0, "a_plus_b" -> 33.0))
  }

  test("seriesByAxis pivots and zero-fills; seriesRatio computes 1 - subset/total") {
    val long = Seq(
      ("tot", "ax1", 10.0), ("tot", "ax2", 4.0), ("sub", "ax1", 2.0),
    ).toDF("class_object", "class_name", "class_value")
    val ratio = Extraction.seriesRatio(long, "tot", "sub").collect()
    val byAxis = ratio.map(r => r.getString(0) ->
      (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(byAxis("ax1") == ((10.0, 2.0, 0.8)))
    assert(byAxis("ax2") == ((4.0, 0.0, 1.0)))
  }

  test("scatterAnalysis: perfect linear relation gives correlation 1") {
    val df = Seq(("g", 1.0, 2.0), ("g", 2.0, 4.0), ("g", 3.0, 6.0)).toDF("g", "x", "y")
    val r = Analysis.scatterAnalysis(df, "x", "y", Seq("g")).head()
    assert(r.getAs[Long]("n") == 3L)
    assert(math.abs(r.getAs[Double]("correlation") - 1.0) < 1e-12)
    assert(r.getAs[Double]("x_mean") == 2.0 && r.getAs[Double]("y_mean") == 4.0)
  }

  test("booleanComparison counts the 2x2 agreement table") {
    val df = Seq(("g", 1, 1), ("g", 1, 0), ("g", 0, 1), ("g", 0, 0), ("g", 1, 1))
      .toDF("g", "a", "b")
    val r = Analysis.booleanComparison(df, col("a") === 1, col("b") === 1, Seq("g")).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((2L, 1L, 1L, 1L)))
  }

  test("referenceStats keeps zero-fact reference rows") {
    val ref = Seq((1, "p1"), (2, "p2")).toDF("k", "name")
    val fact = Seq((1, 5.0), (1, 7.0)).toDF("k", "v")
    val out = Joins.referenceStats(
      ref, "k", Seq("name"), fact, "k",
      Seq(count(lit(1)).as("n"), Num.dsum(col("v")).as("v_sum")))
      .collect().map(r => (r.getInt(0), Option(r.get(2)), Option(r.get(3)))).toSeq
    assert(out == Seq((1, Some(2L), Some(12.0)), (2, None, None)))
  }

  test("nestedSet labels a small tree with correct lft/rght intervals") {
    val nodes = Seq(
      ("R", None, 0L), ("A", Some("R"), 1L), ("B", Some("R"), 2L),
      ("A1", Some("A"), 1L), ("A2", Some("A"), 2L),
    ).toDF("node_id", "parent_id", "sort_key")
    val out = Hierarchy.nestedSet(nodes)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(out("R") == ((1L, 10L)))
    assert(out("A") == ((2L, 7L)))
    assert(out("A1") == ((3L, 4L)))
    assert(out("A2") == ((5L, 6L)))
    assert(out("B") == ((8L, 9L)))
  }

  test("sketchProfile tracks exact distincts and quantiles within bounds") {
    val df = (1 to 2000).map(i => ("g", i % 500, i.toDouble)).toDF("g", "k", "v")
    val r = Aggregations.sketchProfile(
      df, "v", "k", Seq("g"), quantiles = Seq(0.5)).collect().head
    assert(r.getAs[Long]("cnt") == 2000L)
    val approxDistinct = r.getAs[Long]("approx_distinct")
    assert(math.abs(approxDistinct - 500L) <= 500 * 0.10) // 2×rsd guard
    val q50 = r.getAs[Double]("q50")
    assert(math.abs(q50 - 1000.0) <= 10.0)
  }

  test("quantileBins assigns deterministic equal-frequency bins per group") {
    val df = (1 to 8).map(i => ("g", i.toDouble, i.toLong)).toDF("g", "v", "id")
    val out = Distributions.quantileBins(df, Seq("g"), "v", "id", k = 4)
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet == Set(1, 2, 3, 4))
    assert(out(1) == ((2L, 1.0, 2.0)) && out(4) == ((2L, 7.0, 8.0)))
  }

  test("globalQuantileBins bins by quantile edges without a global window") {
    val df = (1 to 100).map(i => Tuple1(i.toDouble)).toDF("v")
    val out = Distributions.globalQuantileBins(df, "v", k = 4, exact = true)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // edges at 25.75/50.5/75.25 → bins of 25,25,25,25
    assert(out == Map(0 -> 25L, 1 -> 25L, 2 -> 25L, 3 -> 25L))
    // approx path keeps the same shape and lands within sketch error
    val approx = Distributions.globalQuantileBins(df, "v", k = 4)
      .collect().map(r => r.getLong(1))
    assert(approx.sum == 100L && approx.forall(n => n >= 20 && n <= 30))
  }

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val prev = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val next = Seq((2L, 20.0), (3L, 33.0), (4L, 40.0)).toDF("k", "v")
    val out = Joins.snapshotDiff(prev, next, Seq("k"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("refreshActions emits churn-proportional delete/upsert/skip actions") {
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c"), (5L, "dup")).toDF("k", "t")
    val next = Seq((2L, "b"), (3L, "cc"), (4L, "dup"), (5L, "dup"),
      (6L, "x"), (7L, "x")).toDF("k", "t")
    val out = Incremental.refreshActions(prev, next, "k", "t")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out == Map(
      1L -> ("removed", "delete"),          // gone from next
      3L -> ("changed", "upsert"),          // content rewrite, unique hash
      4L -> ("added", "skip_duplicate"),    // collides with untouched row 5
      6L -> ("added", "upsert"),            // batch-dup pair: min id kept
      7L -> ("added", "skip_duplicate")))   // batch-dup pair: rest skipped
    // unchanged rows (2, 5) produce no action at all
    assert(!out.contains(2L) && !out.contains(5L))
  }

  test("sketchRollup merges fine-grain sketches to accurate coarse counts") {
    // 3 days × 2 types; users overlap across days so the merged
    // distinct must dedupe ACROSS cells, not sum them
    val df = (1 to 900).map { i =>
      (s"d${i % 3}", if (i % 2 == 0) "click" else "view", (i % 150).toLong)
    }.toDF("day", "event_type", "user_id")
    val out = Aggregations.sketchRollup(df, Seq("day"), Seq("event_type"), "user_id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("click")._1 == 3L) // 3 day-cells merged
    // exact distinct users per type = 75; HLL at default lgk is ±~2%
    assert(math.abs(out("click")._2 - 75L) <= 5)
    assert(math.abs(out("view")._2 - 75L) <= 5)
    // determinism under re-partitioning (register-max state)
    val out2 = Aggregations.sketchRollup(
      df.repartition(13), Seq("day"), Seq("event_type"), "user_id")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out2("click") == out("click")._2 && out2("view") == out("view")._2)
  }

  test("tableProfile emits one row per column with null/unique ratios") {
    val df = Seq((1, Some("a")), (2, Some("a")), (3, None)).toDF("id", "v")
    val out = Aggregations.tableProfile(df, Seq("id", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val v = out("v")
    assert(v.getAs[Long]("n_rows") == 3L)
    assert(v.getAs[Long]("n_nulls") == 1L)
    assert(v.getAs[Long]("n_distinct") == 1L)
    assert(v.getAs[Double]("null_ratio") == 1.0 / 3.0)
    assert(out("id").getAs[Long]("n_distinct") == 3L)
    assert(out("id").getAs[String]("dtype") == "int")
  }

  test("saltedCollectList equals the direct collect under any salt count") {
    val df = (1 to 500).map(i => (if (i <= 450) "hot" else "cold", i.toLong))
      .toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sort_array(collect_list(col("v"))).as("v_list"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    for (salts <- Seq(1, 4, 16)) {
      val salted = Aggregations.saltedCollectList(
        df, Seq("k"), "v", saltBy = col("v"), salts = salts)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(salted == direct, s"salts=$salts")
    }
  }

  test("materializedPaths builds root-first pipe paths with levels") {
    val nodes = Seq(
      ("R", None, 0L), ("A", Some("R"), 1L), ("A1", Some("A"), 1L),
      ("B", Some("R"), 2L),
    ).toDF("node_id", "parent_id", "sort_key")
    val out = Hierarchy.materializedPaths(nodes)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out("R") == (("R", 0)))
    assert(out("A1") == (("R|A|A1", 2)))
    assert(out("B") == (("R|B", 1)))
  }

  test("exactPercentilesByValue matches Spark's percentile aggregate") {
    // heavy duplicates + uneven group sizes so interpolation brackets
    // land both inside and between histogram rows
    val rows = (0 until 997).map { i =>
      (s"g${i % 3}", ((i * 7919) % 50).toDouble / 3.0)
    }.toDF("g", "v")
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.95, 1.0)
    val ref = rows.groupBy("g").agg(
      percentile(col("v"), array(ps.map(lit): _*)).as("eq"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val got = Aggregations.exactPercentilesByValue(rows, "v", Seq("g"), ps)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (g, vs) =>
      vs.zip(ref(g)).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("columnRoles: name rules, value-based WKT, thresholds, nulls") {
    val df = Seq(
      (1L, "POINT(3 4)", "alice", "red", 10.5, true, Some("x")),
      (2L, "plain text", "bob", "red", 11.5, false, None),
      (3L, "POLYGON((0 0,1 1))", "carol", "blue", 12.5, true, Some("y")))
      .toDF("order_id", "boundary", "customer_name", "color", "amount", "ok", "note")
    val got = Analysis.columnRoles(df, df.columns.toSeq)
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(6), r.getBoolean(7), r.getBoolean(8), r.getBoolean(9),
          r.getString(10))).toMap
    // order_id: _id suffix -> identifier, wins over everything
    assert(got("order_id") === ((true, false, false, false, "identifier")))
    // boundary: NO geo name pattern — flagged purely by WKT values
    assert(got("boundary") === ((false, true, false, false, "geometry")))
    // customer_name: label pattern
    assert(got("customer_name") === ((false, false, false, true, "label")))
    // color: plain low-cardinality string
    assert(got("color") === ((false, false, false, false, "categorical")))
    // amount: numeric, 3 distinct <= 20 -> categorical branch
    assert(got("amount") === ((false, false, false, false, "categorical")))
    // ok: boolean -> flag
    assert(got("ok") === ((false, false, false, false, "flag")))
    // note has a null: n_nulls counted, no crash
    val note = Analysis.columnRoles(df, Seq("note"))
      .select("n_nulls", "n_distinct").head()
    assert(note.getLong(0) === 1L && note.getLong(1) === 2L)
    // a measure needs > 20 distinct values
    val wide = (1 to 50).map(i => i.toDouble).toDF("price")
    assert(Analysis.columnRoles(wide, Seq("price"))
      .select("role").head().getString(0) === "measure")
  }

  test("subtreeAggregate rolls facts up every ancestor") {
    val nodes = Seq(
      ("R", None, 0L), ("A", Some("R"), 1L), ("A1", Some("A"), 1L),
    ).toDF("node_id", "parent_id", "sort_key")
    val facts = Seq(("A1", 3.0), ("A1", 4.0), ("A", 10.0)).toDF("node", "v")
    val out = Hierarchy.subtreeAggregate(
      nodes, facts, "node",
      Seq(Num.dsum(col("v")).as("v_sum")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("A1" -> 7.0, "A" -> 17.0, "R" -> 17.0))
  }
}
