package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Similarity}

/** Retrieval-quality floors on a PLANTED-CLUSTER corpus.
  *
  * The driver gates replay the ANN algorithms verbatim (they catch
  * implementation drift, not retrieval quality), and the recall floors
  * in DedupSpec are capped by the near-uniform synthetic embeddings
  * (SURVEY §7.5.4). This spec closes that gap: a deterministic corpus
  * with real cluster structure — 20 well-separated centers, 100
  * members each, intra-cluster cosine ≈ 0.98, cross-cluster ≈ 0 — on
  * which a correct ANN index must score HIGH recall, not just
  * better-than-random. Ground truth is brute force, computed here.
  */
class ClusteredRecallSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private val nClusters = 20
  private val perCluster = 100

  /** Deterministic hash-style generator (the GLSL fract-sin trick) —
    * plain sin(c·a + d·b) centers are all phase shifts of ONE wave
    * (pairwise cosine ≈ cos Δφ, up to 0.59 measured), so each value
    * must be decorrelated individually. No RNG — stable across JVMs. */
  private def frand(a: Double, b: Double): Float = {
    val h = math.sin(a * 12.9898 + b * 78.233) * 43758.5453
    (2.0 * (h - math.floor(h)) - 1.0).toFloat
  }

  private lazy val corpus: DataFrame = {
    val rows = for {
      c <- 0 until nClusters
      j <- 0 until perCluster
      i = c * perCluster + j
    } yield (i.toLong, (0 until dim).map(d =>
      frand(c, d) + 0.2f * frand(i + 7919, d)).toArray)
    rows.toDF("vec_id", "embedding")
  }

  // one query per cluster for the first 8 clusters
  private lazy val queries: DataFrame =
    corpus.where(col("vec_id") % perCluster === 0 &&
      col("vec_id") < (8L * perCluster))

  private def recallVsBruteForce(approx: DataFrame): Array[Double] = {
    val bf = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 10)
    val hits = bf.join(approx.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "leftsemi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    bf.groupBy("query_id").agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("query_id"), "left")
      .select(coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_true"))
      .collect().map(_.getDouble(0))
  }

  test("clustered corpus really is clustered (sanity on the plant)") {
    val a = corpus.where(col("vec_id") === 0).collect()(0).getSeq[Float](1)
    val b = corpus.where(col("vec_id") === 1).collect()(0).getSeq[Float](1)
    val x = corpus.where(col("vec_id") === lit(perCluster)).collect()(0).getSeq[Float](1)
    def cos(u: Seq[Float], v: Seq[Float]): Double = {
      val d = u.zip(v).map { case (p, q) => p.toDouble * q }.sum
      d / math.sqrt(u.map(p => p.toDouble * p).sum * v.map(p => p.toDouble * p).sum)
    }
    assert(cos(a, b) > 0.9, s"intra-cluster cosine ${cos(a, b)}")
    assert(math.abs(cos(a, x)) < 0.3, s"cross-cluster cosine ${cos(a, x)}")
  }

  test("LSH recall@10 >= 0.8 per query on clustered data") {
    val lsh = Similarity.lshTopK(
      corpus, queries, "vec_id", "embedding",
      k = 10, nPlanes = 4, dim = dim, nTables = 16)
    val recalls = recallVsBruteForce(lsh)
    assert(recalls.length == 8 && recalls.forall(_ >= 0.8),
      s"clustered LSH recall floor broken: ${recalls.mkString(",")}")
  }

  test("sub-exhaustive IVF mean recall >= 0.7 on clustered data") {
    // stride 16 → 125 sampled centroids (~6 per cluster); probing 4
    // cells examines ~3% of the corpus, so high recall is only
    // reachable if assignment+probing actually respect the geometry
    val ivf = Similarity.ivfTopK(
      corpus, queries, "vec_id", "embedding",
      k = 10, centroidStride = 16, nProbe = 4)
    val recalls = recallVsBruteForce(ivf)
    val mean = recalls.sum / recalls.length
    assert(recalls.length == 8 && mean >= 0.7,
      s"clustered IVF mean recall $mean: ${recalls.mkString(",")}")
    assert(recalls.forall(_ > 0.0))
  }

  test("SemDeDup finds >= 0.8 of true near-dup pairs on clustered data") {
    // ground truth: ALL pairs with cosine >= threshold (brute force
    // over the corpus — clusters make this the intra-cluster pair set)
    val th = 0.95
    val e = corpus.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)
    val withNorm = e.withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val truth = withNorm.as("a").join(withNorm.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .where(dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")) >= th)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
    val nTruth = truth.count()
    assert(nTruth > 1000L, s"plant produced too few true pairs: $nTruth")
    // k ≈ true cluster count (stride 100 → 20 centroids): SemDeDup's
    // recall is structurally capped at ~1/cells-per-cluster (pairs
    // split across cells are never compared), so over-sharding the
    // space — e.g. stride 16 → ~6 cells per cluster — caps it near
    // 0.2 regardless of implementation quality. The prescription IS
    // the knob: pick k near the corpus's natural cluster count.
    val found = Clustering.semanticDedup(
      corpus, "vec_id", "embedding", stride = 100, iters = 2, threshold = th)
    val nFound = truth.join(
      found.selectExpr("least(id_a, id_b) AS id_a", "greatest(id_a, id_b) AS id_b"),
      Seq("id_a", "id_b"), "leftsemi").count()
    val rate = nFound.toDouble / nTruth
    assert(rate >= 0.8, s"SemDeDup found $nFound of $nTruth true pairs ($rate)")
  }

  test("int8 scalar quantization: recall@10 >= 0.8 vs exact float L2") {
    // ground truth under the SAME metric (L2, the SQ8 contract):
    // quantization fidelity is the claim, not metric equivalence
    val e = corpus.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val l2 = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (s, x) => s + x)
    val q = e.where(col("vec_id") % perCluster === 0 && col("vec_id") < (8L * perCluster))
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val truth = e.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        l2(col("qv"), col("v")).as("d"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("d").asc, col("neighbor_id"))))
      .where(col("rank") <= 10)
    val approx = Similarity.int8TopK(
      corpus, "vec_id", "embedding",
      col("vec_id") % perCluster === 0 && col("vec_id") < (8L * perCluster), k = 10)
    val hits = truth.join(approx.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "leftsemi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    val recalls = truth.groupBy("query_id").agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("query_id"), "left")
      .select(coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_true"))
      .collect().map(_.getDouble(0))
    val mean = recalls.sum / recalls.length
    assert(recalls.length == 8 && mean >= 0.8,
      s"int8 mean recall $mean: ${recalls.mkString(",")}")
  }

  test("int8 codes are bounded and the stats aggregate matches an explode replay") {
    val codes = Similarity.int8Quantize(corpus, "vec_id", "embedding")
    val bad = codes.where(exists(col("code"),
      c => c < 0L || c > 255L)).count()
    assert(bad === 0L, "codes out of [0,255]")
    // VecMinMax vs the dim-explode groupBy it replaces
    val agg = corpus.agg(
      graft.functions.GraftFunctions.vec_min_max(col("embedding")).as("s"))
      .select(col("s.mins").as("mins"), col("s.maxs").as("maxs"))
      .collect().head
    val exploded = corpus
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i")
      .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
      .orderBy("i").collect()
    val mins = agg.getSeq[Double](0)
    val maxs = agg.getSeq[Double](1)
    assert(exploded.length === mins.length)
    exploded.foreach { r =>
      val i = r.getInt(0)
      assert(r.getDouble(1) === mins(i) && r.getDouble(2) === maxs(i))
    }
  }
}
