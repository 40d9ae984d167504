package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Product-quantization ANN (SURVEY.md §2 K4). */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int) = (0L until n.toLong).map { i =>
    (i, (0 until dim).map(d => math.sin(i * 31 + d * 7).toFloat))
  }.toDF("vec_id", "embedding")

  test("stride-1 PQ is exact: ADC ranking equals true squared-L2 ranking") {
    // with every corpus vector in the codebook, each subvector encodes
    // to itself — zero quantization error, so the asymmetric distance
    // IS the exact squared L2 and the top-k must match a reference
    // brute force bit-for-bit on membership and order
    val dim = 16
    val df = vecs(40, dim).cache()
    val rows = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      s
    }
    val want = rows.filter(_._1 < 3).flatMap { case (qid, qv) =>
      rows.filter(_._1 != qid)
        .map { case (nid, nv) => (qid, nid, l2(qv, nv)) }
        .sortBy { case (_, nid, d) => (d, nid) }
        .take(5).zipWithIndex
        .map { case ((q, n, _), i) => (q, i + 1, n) }
    }.toSet
    val got = Similarity.pqTopK(
      df, df.where(col("vec_id") < 3), "vec_id", "embedding",
      k = 5, m = 4, centroidStride = 1, maxCentroids = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("coarse codebook PQ still beats random ranking on the real corpus") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.where(col("vec_id") < 8)
    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 10)
    val pq = Similarity.pqTopK(
      emb, q, "vec_id", "embedding", k = 10, m = 8, centroidStride = 16)
    val hits = bf.join(pq.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "leftsemi").count()
    val total = bf.count()
    // random top-10 of ~500 would overlap the true top-10 at ~2%;
    // even a coarse 32-centroid codebook must do far better
    assert(hits.toDouble / total > 0.15,
      s"PQ recall ${hits.toDouble / total} no better than random")
  }

  test("codes are bounded by the codebook size and encoding is deterministic") {
    val df = vecs(60, 16)
    val sampled = df.where(pmod(col("vec_id"), lit(10)) === 0).count()
    val enc1 = Similarity.pqTopK(
      df, df.where(col("vec_id") < 2), "vec_id", "embedding",
      k = 3, m = 4, centroidStride = 10, maxCentroids = 64).collect()
    val enc2 = Similarity.pqTopK(
      df, df.where(col("vec_id") < 2), "vec_id", "embedding",
      k = 3, m = 4, centroidStride = 10, maxCentroids = 64).collect()
    assert(enc1.map(_.toSeq).toSeq == enc2.map(_.toSeq).toSeq)
    assert(sampled > 1) // the coarse config is a genuine quantizer here
  }

  test("ivfPqTopK output is the PQ ranking restricted to probed cells") {
    // with nProbe covering every cell, IVF-PQ degenerates to plain PQ
    // (same codebook strides) — the composition adds pruning, never a
    // different score
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.where(col("vec_id") < 4)
    val nCells = emb.where(pmod(col("vec_id"), lit(16)) === 0).count().toInt
    val full = Similarity.ivfPqTopK(
      emb, q, "vec_id", "embedding", k = 10, m = 8,
      cellStride = 16, pqStride = 16, nProbe = nCells)
      .collect().map(_.toSeq)
    val pq = Similarity.pqTopK(
      emb, q, "vec_id", "embedding", k = 10, m = 8, centroidStride = 16,
      maxCentroids = 4096)
      .collect().map(_.toSeq)
    assert(full.toSeq == pq.toSeq)
    // partial probing returns a contiguous-ranked per-query subset
    val pruned = Similarity.ivfPqTopK(
      emb, q, "vec_id", "embedding", k = 10, m = 8,
      cellStride = 16, pqStride = 16, nProbe = 2).collect()
    pruned.groupBy(_.getLong(0)).values.foreach { rows =>
      assert(rows.map(_.getInt(1)).toSeq.sorted == (1 to rows.length).toSeq)
    }
    // and every pruned result row appears in the unpruned candidate
    // scoring with the same distance
    val fullDist = Similarity.ivfPqTopK(
      emb, q, "vec_id", "embedding", k = 1000, m = 8,
      cellStride = 16, pqStride = 16, nProbe = nCells)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    pruned.foreach { r =>
      assert(fullDist((r.getLong(0), r.getLong(2))) == r.getDouble(3))
    }
  }

  test("indivisible subspace layout and oversized codebooks fail loudly") {
    val df = vecs(30, 10)
    val e1 = intercept[IllegalArgumentException](Similarity.pqTopK(
      df, df.where(col("vec_id") < 2), "vec_id", "embedding",
      k = 3, m = 4, centroidStride = 5))
    assert(e1.getMessage.contains("not divisible"))
    val e2 = intercept[IllegalArgumentException](Similarity.pqTopK(
      df, df.where(col("vec_id") < 2), "vec_id", "embedding",
      k = 3, m = 5, centroidStride = 1, maxCentroids = 8))
    assert(e2.getMessage.contains("centroids sampled"))
  }
}
