package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup}

/** Skew-resilience property tests (round-7 hardening): pathological
  * corpora — a mega-duplicate cluster, a hot LSH band bucket, a hot
  * domain — must flow through the dedup/curation family with BOUNDED
  * per-task expansion. Each test fails if the protective mechanism
  * (maxBucket cap, pigeonhole cap, partial window group limit) is
  * removed.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def megaCorpus = {
    // 300 identical boilerplate docs (one mega near-dup cluster that is
    // ALSO one mega band bucket), plus one genuine near-dup pair and
    // background docs
    val boiler = (0L until 300L).map(i =>
      (i, "the exact same boilerplate text repeated across the corpus every time"))
    val nearDup = Seq(
      (1000L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1001L, "alpha beta gamma delta epsilon zeta eta iota"))
    val noise = (2000L until 2050L).map(i =>
      (i, s"unique document $i with words w${i}a w${i}b w${i}c w${i}d w${i}e"))
    (boiler ++ nearDup ++ noise).toDF("doc_id", "text")
  }

  test("J2: the maxBucket cap bounds mega-bucket pair expansion") {
    // with the cap, the 300-doc identical cluster (300 shared buckets ×
    // C(300,2) ≈ 45k pairs per band without it) contributes NOTHING to
    // the candidate set — exact dedup owns identical docs — while the
    // genuine near-dup pair still surfaces through its banding
    val cands = Dedup.minhashCandidates(
      megaCorpus, "doc_id", "text", maxBucket = 100).collect()
    val ids = cands.map(r => (r.getLong(0), r.getLong(1)))
    assert(ids.contains((1000L, 1001L)), "legit near-dup pair lost")
    assert(!ids.exists { case (a, b) => a < 300L && b < 300L },
      "mega-cluster pairs leaked past the cap")
    // removing the cap (maxBucket = corpus size) is exactly the blow-up
    // the cap prevents: the same miner emits tens of thousands of pairs
    val uncapped = Dedup.minhashCandidates(
      megaCorpus, "doc_id", "text", maxBucket = 100000).count()
    assert(uncapped > 40000L, s"expected mega-bucket blow-up, got $uncapped")
    // and the cluster the cap dropped is exactly what exact dedup owns
    val exact = Dedup.exactDuplicates(megaCorpus, "doc_id", "text")
      .where(col("n_docs") > 1).collect()
    assert(exact.length == 1 && exact.head.getLong(1) == 300L)
  }

  test("the skew cap fires its loud observed metric exactly when it bites") {
    import org.apache.spark.sql.execution.QueryExecution
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith(graft.operators.CapMetrics.namePrefix))
            captured.add((name, row.getLong(0), row.getLong(1)))
        }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    def await(pred: Iterable[(String, Long, Long)] => Boolean): Unit = {
      val deadline = System.currentTimeMillis + 20000
      import scala.jdk.CollectionConverters._
      while (!pred(captured.asScala) && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      assert(pred(captured.asScala), s"metric never arrived; got $captured")
    }
    try {
      // 5 identical fingerprints, cap 3 → all 4 chunk buckets over cap:
      // 4 dropped buckets, 4 × C(5,2) = 40 dropped pairs, zero output
      val fp = (1L to 5L).map(i => (i, 7L, 7L)).toDF("doc_id", "hi", "lo")
      assert(Dedup.mineHammingPairs(fp, maxHamming = 3, maxBucket = 3).count() === 0L)
      await(_.exists { case (n, b, p) =>
        n.startsWith(graft.operators.CapMetrics.namePrefix + "hamming") &&
          b == 4L && p == 40L })
      // under the cap the metric reads zero — it fires EXACTLY when it bites
      captured.clear()
      assert(Dedup.mineHammingPairs(fp, maxHamming = 3, maxBucket = 100).count() === 10L)
      await(_.exists { case (n, b, p) =>
        n.startsWith(graft.operators.CapMetrics.namePrefix + "hamming") &&
          b == 0L && p == 0L })
      // the minhash miner reports through the same channel
      captured.clear()
      graft.operators.Dedup.minhashCandidates(
        megaCorpus, "doc_id", "text", maxBucket = 100).collect()
      await(_.exists { case (n, b, _) =>
        n.startsWith(graft.operators.CapMetrics.namePrefix + "minhash") && b > 0L })
    } finally spark.listenerManager.unregister(listener)
  }

  test("J3: the pigeonhole bucket cap bounds identical-fingerprint chunks") {
    val pairs = Dedup.simhashPairs(
      megaCorpus, "doc_id", "text", maxHamming = 3, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!pairs.exists { case (a, b) => a < 300L && b < 300L },
      "mega-cluster pairs leaked past the simhash cap")
    val uncapped = Dedup.simhashPairs(
      megaCorpus, "doc_id", "text", maxHamming = 3, maxBucket = 100000).count()
    assert(uncapped > 40000L, s"expected pigeonhole blow-up, got $uncapped")
  }

  test("J6: connected components converge on a mega-star plus deep chain") {
    // one hub with 3000 spokes (hot groupBy key) feeding a 60-deep
    // chain: min-label propagation with pointer jumping must converge
    // within the default round budget and label everything with the hub
    val star = (1L to 3000L).map(i => (i, 0L))
    val chain = (3001L to 3060L).map(i => (i, i - 1))
    val edges = (star ++ chain).toDF("src", "dst")
    val comp = Dedup.connectedComponents(edges, "src", "dst")
    assert(comp.where(col("component") =!= 0L).count() == 0L)
    assert(comp.count() == 3061L)
  }

  test("J10: span dedup stays count-shaped on a mega-duplicated span — no pair blow-up") {
    // 300 identical docs share every window; output must be one row
    // per distinct span with n_docs=300 (counts, never materialized
    // pairs — a pairwise formulation would emit ~45k rows per span)
    val out = Dedup.spanDedup(megaCorpus, "doc_id", "text", spanLen = 5)
    val rows = out.collect()
    val boilerRows = rows.filter(_.getLong(1) == 300L)
    assert(boilerRows.nonEmpty) // the mega span IS reported...
    assert(rows.length < 50)    // ...as aggregate rows, not pairs
    boilerRows.foreach(r => assert(r.getLong(2) == 300L))
    // and the plan aggregates with a map-side partial over the 128-bit
    // window hashes; the only join is the survivors-only span-string
    // re-derivation (an equi-join — never pairwise/cartesian), so the
    // exploded window mass itself is never joined
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("partial_"))
    assert(!plan.toLowerCase.contains("nestedloop"))
    assert(!plan.toLowerCase.contains("cartesian"))
    assert(plan.contains("key=[__h1") && !plan.contains("key=[span"),
      "dup decision must key on window hashes, not span strings")
  }

  test("Q3: hot-domain top-k keeps the bounded-heap partial limit in the plan") {
    // 50k rows in ONE domain vs 10-row domains: the thing that makes
    // this survive a hot domain at scale is WindowGroupLimit(Partial)
    // BEFORE the exchange — only ~k rows per map partition per domain
    // shuffle, instead of the full hot domain. Assert the plan carries
    // it (fails if the rank filter stops being pushable) and the result
    // is the exact top-k.
    val hot = (0L until 50000L).map(i => ("hot.example", i % 977, i))
    val cold = (0L until 10L).map(i => ("cold.example", i, 100000L + i))
    val df = (hot ++ cold).toDF("domain", "score", "doc_id").repartition(16)
    val top = Curation.domainTopK(df, "domain", "score", "doc_id", k = 5)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"partial group limit missing:\n$plan")
    val got = top.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val wantHot = hot.sortBy { case (_, s, id) => (-s, id) }.take(5)
      .map { case (d, s, id) => (d, s.toLong, id) }
    assert(got.filter(_._1 == "hot.example").toSeq == wantHot)
    assert(got.count(_._1 == "cold.example") == 5)
  }
}
