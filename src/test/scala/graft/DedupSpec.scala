package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, VectorOps}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away today"
  private val docs = Seq(
    (1L, base, "s0"),
    (2L, base, "s0"), // exact dup of 1
    (3L, base.replace("today", "tonight"), "s0"), // near dup of 1
    (4L, "completely different words about spark shuffles and joins entirely", "s0"),
    (5L, "another unrelated document mentioning catalyst optimizer rules only", "s1"),
  ).toDF("doc_id", "text", "source")

  test("exactDuplicates groups identical texts and keeps min id") {
    val out = Dedup.exactDuplicates(docs, "doc_id", "text").collect()
    assert(out.length == 4) // 5 docs, one exact-dup pair
    val dup = out.filter(_.getAs[Long]("n_docs") == 2)
    assert(dup.length == 1 && dup.head.getAs[Long]("keep_id") == 1L)
  }

  test("minhashCandidates surfaces exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val keys = pairs.map(p => (p._1, p._2))
    assert(keys.contains((1L, 2L))) // exact dup: est jaccard 1.0
    assert(pairs.find(p => (p._1, p._2) == ((1L, 2L))).get._3 == 1.0)
    assert(keys.contains((1L, 3L)) || keys.contains((2L, 3L))) // near dup
    assert(!keys.exists(p => p._1 == 4L || p._2 == 4L || p._2 == 5L))
  }

  test("simhash is deterministic, equal for equal text, near for near text") {
    val sims = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(1L) == sims(2L))
    assert(java.lang.Long.bitCount(sims(1L) ^ sims(3L)) <= 8)
    assert(java.lang.Long.bitCount(sims(1L) ^ sims(4L)) > 8)
  }

  test("simhashPairs pigeonhole finds all pairs within hamming 3") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // hamming 0 must always be found
  }

  test("ngramJaccardPairs computes exact blocked jaccard") {
    val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", n = 3, minJaccard = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out(((1L, 2L))) == 1.0)
    assert(out.contains((1L, 3L)) && out(((1L, 3L))) < 1.0)
    assert(!out.keys.exists(p => p._1 == 5L || p._2 == 5L)) // other block
  }

  test("keepCanonical drops non-canonical members and keeps singletons") {
    import spark.implicits._
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x"), (7L, "solo")).toDF("doc_id", "text")
    // cluster {1,2,3} with component=min=1; doc 7 unclustered
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("node", "component")
    val kept = Dedup.keepCanonical(docs, clusters, "doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 7L))
  }

  test("spanDedup reports cross-doc duplicated windows with doc and occurrence counts") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f"),   // "a b c" at pos 0
      (2L, "x a b c y z"),   // "a b c" at pos 1
      (3L, "a b c a b c w"), // "a b c" twice in ONE doc
      (4L, "p q")            // too short for any window
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(df, "doc_id", "text", spanLen = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // only the cross-doc span survives; 3 docs, 4 total occurrences
    assert(out == Map("a b c" -> ((3L, 4L))))
    // within-doc-only repeats don't qualify
    val solo = Seq((9L, "m n o m n o")).toDF("doc_id", "text")
    assert(Dedup.spanDedup(solo, "doc_id", "text", spanLen = 3).count() == 0)
  }

  test("spanScrub keeps the corpus-wide first occurrence and cuts the rest") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f"),   // "a b c" first occurrence (doc 1, pos 0) — kept
      (2L, "x a b c y z"),   // non-first occurrence — cut
      (3L, "a b c a b c w"), // BOTH occurrences non-first — cut, overlap-safe
      (4L, "p q")            // shorter than the span — untouched
    ).toDF("doc_id", "text")
    val out = Dedup.spanScrub(df, "doc_id", "text", spanLen = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == (("a b c d e f", 6L, 0L)))
    assert(out(2L) == (("x y z", 3L, 3L)))
    assert(out(3L) == (("w", 1L, 6L)))
    assert(out(4L) == (("p q", 2L, 0L)))
  }

  test("spanScrub removes a fully-duplicated doc down to empty text") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val out = Dedup.spanScrub(df, "doc_id", "text", spanLen = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == (("a b c", 3L, 0L)))
    assert(out(2L) == (("", 0L, 3L)))
  }

  test("embeddingNearDup finds parallel vectors within a block") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f), 0),
      (2L, Seq(0.99f, 0.01f, 0.0f), 0),
      (3L, Seq(0.0f, 1.0f, 0.0f), 0),
      (4L, Seq(1.0f, 0.0f, 0.0f), 1), // same direction but other block
    ).toDF("vec_id", "embedding", "label")
    val out = Dedup.embeddingNearDup(vecs, "vec_id", "embedding", "label", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L)))
  }

  test("cosineD matches an exact hand computation") {
    val df = Seq((Seq(3.0f, 4.0f), Seq(4.0f, 3.0f))).toDF("a", "b")
    val c = df.select(VectorOps.cosineD(col("a"), col("b"))).head.getDouble(0)
    assert(math.abs(c - 24.0 / 25.0) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine desc and excludes self") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(0.5f, 0.5f)),
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(
      vecs, vecs.where(col("vec_id") === 0), "vec_id", "embedding", k = 2).collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 3L))
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 2))
  }

  test("ivfTopK recovers brute-force top-k when probing enough cells") {
    val dim = 8
    val vecs = (0L until 60L).map { i =>
      (i, (0 until dim).map(d => math.sin(i * 31 + d).toFloat))
    }.toDF("vec_id", "embedding").cache()
    val exact = Similarity.bruteForceTopK(
      vecs, vecs.where(col("vec_id") < 3), "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // stride 10 → 6 centroids; probing all 6 cells makes IVF exhaustive,
    // so it must reproduce the exact top-k (rank ties broken identically)
    val ivf = Similarity.ivfTopK(
      vecs, vecs.where(col("vec_id") < 3), "vec_id", "embedding",
      k = 3, centroidStride = 10, nProbe = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ivf == exact)
    // narrow probing returns a per-query contiguous-ranked subset
    val narrow = Similarity.ivfTopK(
      vecs, vecs.where(col("vec_id") < 3), "vec_id", "embedding",
      k = 3, centroidStride = 10, nProbe = 1).collect()
    narrow.groupBy(_.getLong(0)).values.foreach { rows =>
      assert(rows.map(_.getInt(1)).toSeq.sorted == (1 to rows.length).toSeq)
    }
  }

  test("lshTopK returns a subset of brute-force results for same bucket") {
    val dim = 8
    val vecs = (0L until 50L).map { i =>
      (i, (0 until dim).map(d => math.sin(i * 31 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Similarity.lshTopK(
      vecs, vecs.where(col("vec_id") < 3), "vec_id", "embedding",
      k = 5, nPlanes = 2, dim = dim).collect()
    assert(out.nonEmpty)
    // every returned neighbor shares the query's bucket → cosine computed
    // exactly; ranks are 1..k without gaps per query
    val byQ = out.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).toSeq.sorted == (1 to rows.length).toSeq)
    }
  }

  test("production LSH config keeps recall@10 >= 0.5 on the real corpus") {
    // the driver gate is now a verbatim replay (it catches implementation
    // drift); THIS holds the algorithmic recall floor the round-6 gate
    // asserted, against the independently-verified brute-force baseline
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.where(col("vec_id") < 8)
    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 10)
    val lsh = Similarity.lshTopK(
      emb, q, "vec_id", "embedding", k = 10, nPlanes = 4, dim = 64, nTables = 16)
    val hits = bf.join(lsh.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "leftsemi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    val recalls = bf.groupBy("query_id").agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("query_id"), "left")
      .select(coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_true"))
      .collect().map(_.getDouble(0))
    assert(recalls.length == 8 && recalls.forall(_ >= 0.5))
  }

  test("gated sub-exhaustive IVF config beats the random-subset recall baseline") {
    // On the near-uniform synthetic corpus, probing nProbe of nCells
    // cells examines ~nProbe/nCells of the corpus, so a BROKEN probe
    // (effectively random candidates) recalls ≈ that fraction. The
    // q_ann_ivf_probe config (stride 16 → 32 cells, nProbe 4 = 12.5%)
    // must do strictly better on average, improve when widened, and
    // never miss a query entirely. (The driver gate hash-verifies the
    // exact result; this holds the algorithmic floor.)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val nCells = emb.where(pmod(col("vec_id"), lit(16)) === 0).count()
    assert(nCells > 4, s"probe config not sub-exhaustive: $nCells cells")
    val q = emb.where(col("vec_id") < 8)
    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 10)
    def meanRecall(nProbe: Int): (Double, Array[Double]) = {
      val ivf = Similarity.ivfTopK(
        emb, q, "vec_id", "embedding", k = 10, centroidStride = 16, nProbe = nProbe)
      val hits = bf.join(ivf.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "leftsemi")
        .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
      val recalls = bf.groupBy("query_id").agg(count(lit(1)).as("n_true"))
        .join(hits, Seq("query_id"), "left")
        .select(coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_true"))
        .collect().map(_.getDouble(0))
      (recalls.sum / recalls.length, recalls)
    }
    val (mean4, recalls4) = meanRecall(4)
    assert(recalls4.length == 8 && recalls4.forall(_ > 0.0))
    assert(mean4 > 4.0 / nCells, s"mean recall $mean4 no better than random subset")
    val (mean16, _) = meanRecall(16)
    assert(mean16 >= mean4, s"widening the probe lowered recall: $mean4 -> $mean16")
  }

  test("connectedComponents resolves multi-hop chains to the min label") {
    // chain 1-2-3-4 (diameter 3, needs >1 propagation round) + pair 10-11
    val edges = Seq((2L, 1L), (3L, 2L), (4L, 3L), (11L, 10L)).toDF("src", "dst")
    val out = Dedup.connectedComponents(edges, "src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents converges on a chain far deeper than the round budget") {
    // path 0-1-2-…-120: plain min-propagation would need 120 rounds;
    // pointer jumping must finish within the default 25.
    // driverThreshold = 0 forces the DISTRIBUTED loop (the default
    // would take the driver union-find fast path at this size).
    val edges = (1L to 120L).map(i => (i, i - 1)).toDF("src", "dst")
    val out = Dedup.connectedComponents(
      edges, "src", "dst", driverThreshold = 0).collect()
    assert(out.length == 121)
    assert(out.forall(_.getLong(1) == 0L))
  }

  test("connectedComponents driver fast path matches the distributed loop") {
    // randomized graph: 300 nodes, 250 edges drawn deterministically —
    // mixed component shapes (stars, chains, isolated pairs)
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(250)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter { case (a, b) => a != b }
      .toDF("src", "dst")
    val fast = Dedup.connectedComponents(edges, "src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val dist = Dedup.connectedComponents(
      edges, "src", "dst", driverThreshold = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fast == dist)
    assert(fast.nonEmpty)
  }

  test("connectedComponents merges components across edge sources") {
    // two stars 1<-2, 1<-3 and 5<-6 joined by bridge 3-5 → one component
    val edges = Seq((2L, 1L), (3L, 1L), (6L, 5L), (5L, 3L)).toDF("src", "dst")
    val out = Dedup.connectedComponents(edges, "src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.values.toSet == Set(1L))
    assert(out.keySet == Set(1L, 2L, 3L, 5L, 6L))
  }
}
