package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, QuantKMeans}

/** K6 — distributed fixed-point k-means + SemDeDup-style semantic
  * dedup over the embedding corpus (SURVEY.md §2 K6/J9; the
  * cluster-then-dedup recipe of Abbas et al. 2023, "SemDeDup: Data-
  * efficient learning at web-scale through semantic deduplication").
  *
  * Reference scope: the reference engine clusters/aggregates entities
  * by learned grouping in its ML suggesters (out of scope); this is
  * the LLM-pipeline mandate's curation-side clustering — cluster
  * balance stats for corpus shaping and within-cluster near-dup
  * pruning at the scale where label-blocked J5 has no labels.
  *
  * Shape per Lloyd round (and why it survives 100 TB):
  *  - INIT: deterministic stride sample (`id % stride == 0`, the IVF
  *    codebook recipe — no RNG, stable across runs), pulled ONCE to the
  *    driver under the same hard `maxCentroids` cap as
  *    [[Similarity.ivfTopK]] (a codebook collect, not a data collect).
  *  - ASSIGN: one map-only pass — the codebook rides into the scan as
  *    a referenced `long[][]` inside the codegen'd
  *    [[graft.functions.QuantNearestCell]]; zero exchange.
  *  - UPDATE: one partial-aggregated `groupBy(cell)` — the mergeable
  *    [[graft.functions.QuantVecSum]] buffer is a `long[dim]`, so the
  *    exchange is k×dim longs per map partition, independent of corpus
  *    size; the ≤k result rows collect to the driver (bounded, like
  *    the init sample) and become the next codebook.
  *
  * All cross-row arithmetic is integer (see [[QuantKMeans]] — floats
  * quantize once to a 2^20 grid), so results are EXACT and independent
  * of partitioning/merge order, which is what lets the whole
  * iteration — init, assignment, elementwise mean update with
  * empty-cell carry-over, reassignment, inertia — replay verbatim as
  * the DuckDB oracle. Empty cells keep their previous centroid
  * (standard Lloyd convention). The centroid-update division is
  * `floor(sum/count + 0.5)` in IEEE double: exact for |sum| < 2^53,
  * and both engines perform the identical conversion above it.
  */
object Clustering {

  /** 2^20 — coordinate grid for embedding-range ([-4, 4]) vectors. */
  val DefaultScale: Double = 1048576.0

  /** Fit: `iters` Lloyd rounds from the stride-sampled init; returns
    * the final integer codebook (cell ordinal = array index). */
  def kmeansCodebook(
      emb: DataFrame, idCol: String, vecCol: String,
      stride: Long, iters: Int,
      scale: Double = DefaultScale, maxCentroids: Int = 4096): Array[Array[Long]] = {
    val sampled = emb
      .where(pmod(col(idCol), lit(stride)) === 0)
      .select(col(idCol), col(vecCol).cast("array<double>"))
      .orderBy(col(idCol))
      .limit(maxCentroids + 1)
      .collect()
    require(sampled.nonEmpty, "kmeansCodebook: stride sampled zero centroids")
    require(sampled.length <= maxCentroids,
      s"kmeansCodebook: > $maxCentroids centroids sampled — raise the stride " +
        "(codebook must stay driver/broadcast sized)")
    var codebook: Array[Array[Long]] = sampled.map(
      _.getSeq[Double](1).toArray.map(QuantKMeans.quantize(_, scale)))
    var t = 0
    while (t < iters) {
      val upd = emb
        .select(GraftFunctions.quant_nearest_cell(col(vecCol), codebook, scale).as("cell"),
          col(vecCol).as("v"))
        .groupBy("cell")
        .agg(count(lit(1)).as("n"), GraftFunctions.quant_vec_sum(col("v"), scale).as("s"))
        .collect() // ≤ k rows — bounded by the codebook size, not the data
      val next = codebook.map(_.clone())
      upd.foreach { r =>
        val cell = r.getInt(0)
        val n = r.getLong(1)
        next(cell) = r.getSeq[Long](2).toArray.map(s =>
          math.floor(s.toDouble / n + 0.5).toLong)
      }
      codebook = next
      t += 1
    }
    codebook
  }

  /** K6 — per-cell clustering profile after `iters` Lloyd rounds:
    * point count, exact integer inertia (Σ squared grid L2 to the
    * assigned centroid), and centroid fingerprints (L1 norm + first
    * coordinate) that pin the codebook itself under the gate. */
  def kmeans(
      emb: DataFrame, idCol: String, vecCol: String,
      stride: Long, iters: Int,
      scale: Double = DefaultScale, maxCentroids: Int = 4096): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cb = kmeansCodebook(emb, idCol, vecCol, stride, iters, scale, maxCentroids)
    val cbDf = cb.zipWithIndex.map { case (c, i) =>
      (i, c.map(math.abs).sum, c(0))
    }.toSeq.toDF("cell", "centroid_l1", "centroid_c0")
    emb
      .select(
        GraftFunctions.quant_nearest_cell(col(vecCol), cb, scale).as("cell"),
        GraftFunctions.quant_nearest_dist(col(vecCol), cb, scale).as("dist"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_points"), sum(col("dist")).as("inertia"))
      .join(broadcast(cbDf), "cell")
      .select(col("cell"), col("n_points"), col("inertia"),
        col("centroid_l1"), col("centroid_c0"))
      .orderBy("cell")
  }

  /** K6b — cluster-balanced deterministic sampling: the
    * [[Curation.stratifiedSample]] recipe (ceil(frac·n) per stratum
    * ordered by md5(id) — engine-portable pseudo-random, one shuffle)
    * with the LEARNED k-means cells as the strata. This is the
    * SemDeDup-adjacent corpus-shaping step: uniform-per-cluster
    * sampling flattens the corpus's semantic density instead of its
    * source mix. Adds one map-only assignment pass in front of the
    * sampler's single window shuffle. */
  def clusterSample(
      emb: DataFrame, idCol: String, vecCol: String,
      stride: Long, iters: Int, frac: Double,
      scale: Double = DefaultScale, maxCentroids: Int = 4096): DataFrame = {
    val cb = kmeansCodebook(emb, idCol, vecCol, stride, iters, scale, maxCentroids)
    val cells = emb.select(
      col(idCol).as("vec_id"),
      GraftFunctions.quant_nearest_cell(col(vecCol), cb, scale).as("cell"))
    Curation.stratifiedSample(cells, Seq("cell"), "vec_id", frac)
  }

  /** J9 — semantic dedup (SemDeDup): cluster-blocked embedding-cosine
    * near-dup pairs. Same pair semantics as [[Dedup.embeddingNearDup]]
    * but blocked by the k-means cell instead of a provided label — the
    * path that exists when no labels do.
    *
    * The guard is a PAIR budget, not a row cap: the work this operator
    * actually schedules is Σ over cells of n·(n−1)/2 cosine
    * evaluations, and a row cap admits quadratically more of it than
    * it appears to (a cell at a 100k cap is ~5×10⁹ pairs on its own).
    * One aggregate over the per-cell counts prices the whole job
    * up-front and fails loudly — with the total pair count and the
    * hottest cell — when it exceeds `pairBudget`. The remedy is a
    * smaller stride (more cells), which is also what SemDeDup
    * prescribes at scale (k ~ √N keeps cells ~√N and Σ pairs ~N^1.5).
    * The default budget (10⁹ pairs ≈ minutes of vectorized cosine on
    * one node) is completable anywhere; raising it is a deliberate
    * caller decision, never a silent degradation. */
  def semanticDedup(
      emb: DataFrame, idCol: String, vecCol: String,
      stride: Long, iters: Int, threshold: Double,
      scale: Double = DefaultScale, maxCentroids: Int = 4096,
      pairBudget: Long = 1000000000L): DataFrame = {
    val cb = kmeansCodebook(emb, idCol, vecCol, stride, iters, scale, maxCentroids)
    val cells = emb.select(
      col(idCol).as("vec_id"), col(vecCol).as("emb"),
      GraftFunctions.quant_nearest_cell(col(vecCol), cb, scale).as("cell"))
    // decimal accumulation: per-cell pair counts are n·(n−1)/2 in
    // long range only while n < ~4.3e9; the SUM across cells could
    // overflow long well before the budget check sees it
    val price = cells.groupBy("cell").count()
      .agg(
        coalesce(sum(col("count").cast("decimal(38,0)") *
          (col("count") - 1)), lit(0).cast("decimal(38,0)"))
          .as("pairs2x"),
        coalesce(max(col("count")), lit(0L)).as("hottest"))
      .collect()(0)
    // n·(n−1) is even, so halving in exact BigDecimal never truncates
    val pairs = price.getDecimal(0).toBigInteger
      .divide(java.math.BigInteger.TWO)
    require(pairs.compareTo(java.math.BigInteger.valueOf(pairBudget)) <= 0,
      s"semanticDedup: blocked pair count $pairs exceeds pairBudget=" +
        s"$pairBudget (hottest cell has ${price.getLong(1)} rows) — " +
        "lower the stride to split hot cells or raise the budget")
    cells.as("a").join(cells.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.cell").as("cell"),
        col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        GraftFunctions.cosine_sim(col("a.emb"), col("b.emb")).as("cosine"))
      .where(col("cosine") > threshold)
      .orderBy("id_a", "id_b")
  }
}
