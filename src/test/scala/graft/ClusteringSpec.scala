package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, QuantKMeans}
import graft.operators.Clustering

/** K6/J9 — fixed-point k-means + SemDeDup semantic dedup
  * (operators/Clustering.scala, functions/KMeansQuant.scala). The
  * driver gate replays the whole pipeline in SQL; these specs pin the
  * pieces the gate exercises only end-to-end: the mergeable vector-sum
  * aggregate under repartitioning, Lloyd convergence on genuinely
  * clustered data, the empty-cell carry-over, the skew guard, and the
  * map-only codegen plan shape of the assignment stage.
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private val scale = Clustering.DefaultScale

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("quant_vec_sum is exact and partitioning-independent") {
    val rows = (0 until 97).map(i => (i.toLong, vec(i * 0.001, -i * 0.002, 0.5)))
    val expected = Array(
      rows.map(r => QuantKMeans.quantize(r._2(0).toDouble, scale)).sum,
      rows.map(r => QuantKMeans.quantize(r._2(1).toDouble, scale)).sum,
      rows.map(r => QuantKMeans.quantize(r._2(2).toDouble, scale)).sum)
    for (nPart <- Seq(1, 3, 7)) {
      val got = rows.toDF("id", "v").repartition(nPart)
        .agg(GraftFunctions.quant_vec_sum(col("v"), scale).as("s"))
        .head.getSeq[Long](0).toArray
      assert(got.sameElements(expected), s"nPart=$nPart")
    }
  }

  test("kmeans converges on clustered data: centroids land on the cluster points, inertia 0") {
    // Three tight clusters of IDENTICAL points; stride 30 samples ids
    // 0, 30, 60 — one seed inside each cluster — so after one Lloyd
    // round each centroid is the exact cluster point and every
    // distance is 0.
    val centers = Seq(vec(1.0, 0.0, 0.0), vec(0.0, 1.0, 0.0), vec(0.0, 0.0, 1.0))
    val rows = (0 until 90).map(i => (i.toLong, centers(i / 30)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Clustering.kmeans(df, "vec_id", "embedding", stride = 30, iters = 1)
      .collect()
    assert(out.length === 3)
    assert(out.forall(_.getAs[Long]("n_points") == 30L))
    assert(out.forall(_.getAs[Long]("inertia") == 0L))
    // centroid fingerprint = the quantized unit coordinate
    assert(out.forall(_.getAs[Long]("centroid_l1") == QuantKMeans.quantize(1.0, scale)))
  }

  test("Lloyd rounds do not worsen clustered inertia; empty cells carry their centroid") {
    // Two clusters with slight jitter plus one far-away seed that
    // captures nothing after the first update (its cell goes empty →
    // centroid carried over, still present in the codebook).
    val rows =
      (0 until 40).map(i => (i.toLong, vec(1.0 + (i % 5) * 0.01, 0.0))) ++
      (40 until 80).map(i => (i.toLong, vec(-1.0 - (i % 5) * 0.01, 0.0))) ++
      Seq((80L, vec(100.0, 100.0)))
    val df = rows.toDF("vec_id", "embedding")
    def inertia(iters: Int): Long =
      Clustering.kmeans(df, "vec_id", "embedding", stride = 40, iters = iters)
        .agg(sum("inertia")).head.getLong(0)
    // stride 40 seeds cells at ids 0, 40, 80
    val i0 = inertia(0)
    val i2 = inertia(2)
    assert(i2 <= i0, s"2 Lloyd rounds worsened inertia: $i0 -> $i2")
    val cb = Clustering.kmeansCodebook(df, "vec_id", "embedding", stride = 40, iters = 2)
    assert(cb.length === 3)
    // the far seed's cell holds only its own point, so its centroid
    // stays the quantized far point across rounds
    assert(cb(2)(0) === QuantKMeans.quantize(100.0, scale))
  }

  test("semanticDedup pairs near-identical vectors within learned cells") {
    // ids 0..9 spread across two clusters; 4 and 5 are near-identical
    // members of the first cluster → exactly that pair (plus any
    // same-cluster pair above threshold) must surface; a pair across
    // clusters must not.
    val rows = Seq(
      (0L, vec(1.0, 0.0)), (1L, vec(0.9, 0.1)), (2L, vec(-1.0, 0.0)),
      (3L, vec(-0.9, -0.1)), (4L, vec(0.95, 0.05)), (5L, vec(0.951, 0.049)))
    val df = rows.toDF("vec_id", "embedding")
    val pairs = Clustering.semanticDedup(
      df, "vec_id", "embedding", stride = 2, iters = 1, threshold = 0.99)
      .collect()
    val ids = pairs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(ids.contains((4L, 5L)))
    assert(pairs.forall(_.getAs[Double]("cosine") > 0.99))
    // cross-cluster (opposite-sign) pairs can never appear: cosine < 0
    assert(!ids.exists { case (a, b) => Set(a, b).intersect(Set(2L, 3L)).size == 1 })
  }

  test("clusterSample takes ceil(frac·n) per learned cell, deterministically") {
    // Two clusters of different sizes: frac 0.3 → ceil(0.3·30)=9 and
    // ceil(0.3·60)=18 rows; re-running yields the identical sample
    // (md5 order, no RNG).
    val rows =
      (0 until 30).map(i => (i.toLong, vec(1.0 + (i % 3) * 0.01, 0.0))) ++
      (30 until 90).map(i => (i.toLong, vec(-1.0 - (i % 3) * 0.01, 0.0)))
    val df = rows.toDF("vec_id", "embedding")
    // stride 45 seeds ids 0 and 45 — one per cluster
    def run() = Clustering.clusterSample(
      df, "vec_id", "embedding", stride = 45, iters = 1, frac = 0.3).collect()
    val s1 = run()
    val byCell = s1.groupBy(_.getAs[Int]("cell")).view.mapValues(_.length).toMap
    assert(byCell.values.toSet === Set(9, 18), byCell.toString)
    assert(s1.map(_.toString).sameElements(run().map(_.toString)))
  }

  test("semanticDedup pair-budget guard prices a mega-cell corpus up-front") {
    // 50 identical vectors → one cell → 50·49/2 = 1225 pairs; a budget
    // below that must fail BEFORE any pairwise work, with the actual
    // pair count and the hottest cell size in the message
    val rows = (0 until 50).map(i => (i.toLong, vec(1.0, 0.0)))
    val e = intercept[IllegalArgumentException] {
      Clustering.semanticDedup(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
        stride = 50, iters = 1, threshold = 0.5, pairBudget = 1000L)
    }
    assert(e.getMessage.contains("pair count 1225"), e.getMessage)
    assert(e.getMessage.contains("hottest cell has 50 rows"), e.getMessage)
    // the same corpus completes when the budget covers the pair count
    val ok = Clustering.semanticDedup(
      rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
      stride = 50, iters = 1, threshold = 0.5, pairBudget = 1225L)
    assert(ok.count() == 1225L)
  }

  test("assignment stage is map-only whole-stage codegen (no exchange before the partial agg)") {
    val path = s"/tmp/graft-clustering-spec-${java.util.UUID.randomUUID()}"
    (0 until 64).map(i => (i.toLong, vec(i * 0.1, 1.0 - i * 0.1)))
      .toDF("vec_id", "embedding").write.parquet(path)
    val df = spark.read.parquet(path)
    val cb = Clustering.kmeansCodebook(df, "vec_id", "embedding", stride = 16, iters = 0)
    val assigned = df.select(
      GraftFunctions.quant_nearest_cell(col("embedding"), cb, scale).as("cell"))
    val plan = assigned.queryExecution.executedPlan.toString
    // `*(1) Project [quant_nearest_cell(...)]` — the star marks the
    // WholeStageCodegen region; the assignment must sit inside one.
    assert(plan.contains("*(1) Project [quant_nearest_cell"), plan)
    assert(!plan.contains("Exchange"), s"assignment must not shuffle:\n$plan")
  }
}
