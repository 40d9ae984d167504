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
    * cells.
    *
    * The corpus-side cell assignment is a per-row FOLD over a
    * broadcast array of all centroids — argmin by (distance,
    * centroid_id) — so the corpus never exchanges at all: no
    * crossJoin row expansion, no window, no groupBy. At cluster
    * scale the assigned corpus is written `partitionBy(cell)` once
    * and reused across query batches; the query side (small by
    * contract) keeps the rank window over its broadcast expansion
    * because it needs the nProbe nearest cells, not just the
    * nearest. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroidStride: Long, nProbe: Int): DataFrame = {
    val cos = graft.functions.GraftFunctions.cosine_sim _
    val centroids = corpus
      .where(pmod(col(idCol), lit(centroidStride)) === 0)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))
    // 1-row dim (all centroids as one sorted array) — stays a broadcast
    val centArr = centroids.agg(sort_array(
      collect_list(struct(col("centroid_id"), col("centroid_vec")))).as("cents"))
    // lexicographic running argmin over (cdist, centroid_id); the array
    // is sorted by centroid_id, so strict-< keeps the lowest id on ties —
    // identical ordering to ROW_NUMBER() OVER (ORDER BY cdist, centroid_id)
    def nearestCell(vec: Column): Column =
      aggregate(
        col("cents"),
        struct(
          lit(Double.PositiveInfinity).as("cdist"),
          lit(null).cast("long").as("cell")),
        (acc, c) => {
          val d = -cos(vec, c.getField("centroid_vec"))
          when(d < acc.getField("cdist"),
            struct(d.as("cdist"),
              c.getField("centroid_id").cast("long").as("cell")))
            .otherwise(acc)
        }).getField("cell")
    val cells = corpus.crossJoin(broadcast(centArr))
      .select(
        col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        nearestCell(col(vecCol)).as("cell"))
    val probed = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("cdist", -cos(col("qv"), col("centroid_vec")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cdist"), col("centroid_id"))))
      .where(col("crank") <= nProbe)
      .select(col("query_id"), col("qv"), col("centroid_id").cast("long").as("cell"))
    cells.join(broadcast(probed), "cell")
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
