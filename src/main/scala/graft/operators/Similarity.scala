package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2 K). Two paths:
  *
  *  - brute force (K1): exact baseline — broadcast the (small) query
  *    set over the corpus scan; the corpus is never shuffled, the
  *    only shuffle is the per-query top-k window.
  *  - random-hyperplane LSH (K2): the scale path — bucket the corpus
  *    once by sign-pattern against `nPlanes` fixed hyperplanes
  *    (deterministic splitmix64 weights, no RNG state), then search
  *    only within the query's bucket. Corpus bucketing is a single
  *    narrow projection; re-usable across query batches via
  *    `repartition($"bucket")` + cache at cluster scale.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplane weights in [−1, 1]
    * (splitmix64 finalizer of (plane, dim) — stable across runs and
    * executors, no broadcast of RNG state needed). */
  private[graft] def planeWeights(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map { p =>
      (0 until dim).map { i =>
        var z = ((p.toLong << 32) | i.toLong) + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        z.toDouble / Long.MaxValue.toDouble
      }
    }

  /** Sign-pattern LSH bucket id (0 until 2^nPlanes) of a vector column. */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int): Column =
    planeWeights(nPlanes, dim).zipWithIndex.map { case (w, p) =>
      when(VectorOps.dotD(vec, typedLit(w)) > 0, lit(1L << (nPlanes - 1 - p)))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** K1 — exact cosine top-k: every query against the full corpus.
    * `queries` must be small (it is broadcast); the corpus side stays
    * a partition-parallel scan with no shuffle before the top-k. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        graft.functions.GraftFunctions.cosine_sim(col("qv"), col("cv")).as("cosine"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  /** K2b — IVF (inverted-file) ANN: a coarse quantizer built from
    * deterministically sampled corpus vectors (`id % stride == 0` —
    * no RNG, stable across runs), each corpus vector assigned to its
    * nearest centroid cell, queries probing their `nProbe` nearest
    * cells. The cell assignment is a broadcast argmin (corpus never
    * shuffles until the per-vector reduce); at cluster scale the
    * assigned corpus is written `partitionBy(cell)` once and reused
    * across query batches. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroidStride: Long, nProbe: Int): DataFrame = {
    val cos = graft.functions.GraftFunctions.cosine_sim _
    val centroids = corpus
      .where(pmod(col(idCol), lit(centroidStride)) === 0)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))
    def assign(df: DataFrame, outId: String, outVec: String, probes: Int): DataFrame =
      df.select(col(idCol).as(outId), col(vecCol).as(outVec))
        .crossJoin(broadcast(centroids))
        .withColumn("cdist", -cos(col(outVec), col("centroid_vec")))
        .withColumn("crank", row_number().over(
          Window.partitionBy(col(outId)).orderBy(col("cdist"), col("centroid_id"))))
        .where(col("crank") <= probes)
        .select(col(outId), col(outVec), col("centroid_id").as("cell"))
    val cells = assign(corpus, "neighbor_id", "cv", probes = 1)
    val probed = assign(queries, "query_id", "qv", probes = nProbe)
    cells.join(probed, "cell")
      .where(col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        cos(col("qv"), col("cv")).as("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  /** K2 — LSH-bucketed ANN: candidates are corpus vectors in the
    * query's bucket; exact cosine + top-k within the bucket. Recall
    * trades off against nPlanes (bucket count 2^nPlanes); multi-table
    * probing = union over several `lshBucket` seeds. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nPlanes: Int, dim: Int): DataFrame = {
    val bucket = (v: Column) => lshBucket(v, nPlanes, dim)
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      bucket(col(vecCol)).as("bucket"))
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv"),
      bucket(col(vecCol)).as("bucket"))
    c.join(broadcast(q), "bucket")
      .where(col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        graft.functions.GraftFunctions.cosine_sim(col("qv"), col("cv")).as("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }
}
