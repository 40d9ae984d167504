package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** J17 — distributed suffix-array ranks (prefix doubling) and
  * variable-length duplicated-span detection, held against LITERAL
  * single-node references:
  *
  *  - [[Dedup.suffixRanks]] vs an in-memory sort of every per-doc
  *    suffix (dense rank = 1 + count of strictly-smaller distinct
  *    suffixes) — the definitional oracle, no doubling anywhere.
  *  - [[Dedup.spanDedupVar]] vs brute-force "every maximal region of
  *    positions lying inside SOME duplicated substring of length ≥
  *    minLen" — the suffix-array formulation of Lee et al. 2021,
  *    enumerated cubically. This pins the windowed-cover + island
  *    implementation to the suffix-array semantics it claims.
  */
class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  /** Definitional suffix ranks: all (doc, pos) suffixes sorted
    * token-lexicographically (prefix-first), dense-ranked. */
  private def refSuffixRanks(
      docs: Seq[(Long, String)]): Map[(Long, Long), Long] = {
    val sufs = docs.flatMap { case (id, text) =>
      val toks = text.split(" ", -1).toSeq
      toks.indices.map(p => ((id, p.toLong), toks.drop(p)))
    }
    implicit val ord: Ordering[Seq[String]] = Ordering.Implicits.seqOrdering
    val distinctSorted = sufs.map(_._2).distinct.sorted
    val rank = distinctSorted.zipWithIndex.map { case (s, i) => s -> (i + 1L) }.toMap
    sufs.map { case (k, s) => k -> rank(s) }.toMap
  }

  /** Brute-force Lee et al. coverage: doc position p is covered iff it
    * lies inside SOME substring of length ≥ minLen occurring in ≥
    * minDocs distinct docs; returns per-doc maximal covered regions as
    * (doc, start, len). Substrings of length > minLen duplicated ⇒
    * their minLen sub-windows duplicated too, so enumerating exactly
    * length-minLen windows is the definitional reduction — but we
    * enumerate ALL lengths up to the doc to keep this a literal
    * transcription of the paper's criterion, not of our optimization. */
  private def refMaximalRegions(
      docs: Seq[(Long, String)], minLen: Int,
      minDocs: Int): Seq[(Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    // substring -> set of docs containing it, all lengths >= minLen
    val occ = collection.mutable.Map.empty[Seq[String], collection.mutable.Set[Long]]
    for ((id, ts) <- toks; start <- ts.indices; len <- minLen to (ts.length - start)) {
      occ.getOrElseUpdate(ts.slice(start, start + len), collection.mutable.Set()) += id
    }
    val dup = occ.filter(_._2.size >= minDocs).keySet
    docs.flatMap { case (id, _) =>
      val ts = toks(id)
      val covered = Array.fill(ts.length)(false)
      for (start <- ts.indices; len <- minLen to (ts.length - start)
           if dup.contains(ts.slice(start, start + len));
           p <- start until (start + len)) covered(p) = true
      // maximal runs of covered positions
      val out = collection.mutable.Buffer.empty[(Long, Long, Long)]
      var i = 0
      while (i < ts.length) {
        if (covered(i)) {
          var j = i
          while (j < ts.length && covered(j)) j += 1
          out += ((id, i.toLong, (j - i).toLong))
          i = j
        } else i += 1
      }
      out
    }
  }

  private val boiler = (1 to 60).map(i => s"bp$i").mkString(" ")
  private val edited = { // single-token edit in the middle (token 31)
    val t = (1 to 60).map(i => s"bp$i").toArray
    t(30) = "EDITED"
    t.mkString(" ")
  }
  private def noise(seed: Int, n: Int): String =
    (0 until n).map(i => s"w${(seed * 31 + i * 7) % 23}x$seed").mkString(" ")

  private val corpus: Seq[(Long, String)] = Seq(
    1L -> s"${noise(1, 11)} $boiler ${noise(2, 9)}",
    2L -> s"${noise(3, 5)} $boiler",
    3L -> s"${noise(4, 7)} $edited ${noise(5, 6)}",
    4L -> noise(6, 40),
    5L -> s"${noise(7, 3)} shared tail tokens here now",
    6L -> s"${noise(8, 4)} shared tail tokens here now")

  test("suffixRanks equals the definitional sorted-suffix dense rank") {
    val df = corpus.toDF("doc_id", "text")
    val got = Dedup.suffixRanks(df, "doc_id", "text", rounds = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val ref = refSuffixRanks(corpus)
    assert(got.size === ref.size)
    ref.foreach { case (k, v) =>
      assert(got(k) === v, s"suffix rank mismatch at (doc,pos)=$k") }
  }

  test("early all-distinct exit is a fixpoint: rounds=8 == rounds=20") {
    val df = corpus.toDF("doc_id", "text")
    val a = Dedup.suffixRanks(df, "doc_id", "text", rounds = 8)
      .orderBy("doc_id", "pos").collect().toSeq
    val b = Dedup.suffixRanks(df, "doc_id", "text", rounds = 20)
      .orderBy("doc_id", "pos").collect().toSeq
    assert(a === b)
  }

  test("identical cross-doc suffixes share a rank (ties never separate)") {
    val df = corpus.toDF("doc_id", "text")
    val got = Dedup.suffixRanks(df, "doc_id", "text", rounds = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // docs 5 and 6 end with the same 5 tokens: every aligned tail
    // suffix pair must carry the SAME rank
    val len5 = corpus.find(_._1 == 5L).get._2.split(" ").length
    val len6 = corpus.find(_._1 == 6L).get._2.split(" ").length
    (1 to 5).foreach { back =>
      assert(got((5L, (len5 - back).toLong)) === got((6L, (len6 - back).toLong)))
    }
  }

  test("suffixRanks refuses docs longer than 2^rounds, loudly") {
    val long = Seq(1L -> (1 to 300).map(i => s"t$i").mkString(" ")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Dedup.suffixRanks(long, "doc_id", "text", rounds = 8)
    }
    assert(ex.getMessage.contains("2^8"))
  }

  test("spanDedupVar matches brute-force maximal duplicated regions") {
    val df = corpus.toDF("doc_id", "text")
    val got = Dedup.spanDedupVar(df, "doc_id", "text", minLen = 8)
      .select("doc_id", "span_start", "span_len")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val ref = refMaximalRegions(corpus, minLen = 8, minDocs = 2).sorted
    assert(got === ref)
  }

  test("variable-length report: true extents that fixed windows cannot express") {
    val df = corpus.toDF("doc_id", "text")
    val rows = Dedup.spanDedupVar(df, "doc_id", "text", minLen = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // clean boilerplate copies: ONE maximal 60-token span each
    val d2 = rows.filter(_._1 == 2L)
    assert(d2.length === 1 && d2.head._3 === 60L)
    assert(d2.head._4 === boiler)
    // the edited copy: exactly TWO maximal segments (the 30 tokens
    // before the edit, the 29 after), extents a fixed-8-gram report
    // cannot state
    val d3 = rows.filter(_._1 == 3L).sortBy(_._2)
    assert(d3.length === 2)
    assert(d3.map(_._3).toSeq === Seq(30L, 29L))
    assert(d3(0)._4 === (1 to 30).map(i => s"bp$i").mkString(" "))
    assert(d3(1)._4 === (32 to 60).map(i => s"bp$i").mkString(" "))
    // J10's fixed-window view of the same corpus: dozens of 8-gram
    // fragments, none reporting a 60- or 30-token extent
    val j10 = Dedup.spanDedup(df, "doc_id", "text", spanLen = 8)
      .collect().map(_.getString(0))
    assert(j10.length > 40 && j10.forall(_.split(" ").length == 8))
    // pure-noise doc is untouched
    assert(!rows.exists(_._1 == 4L))
  }

  test("doubling rounds release superseded blocks deterministically") {
    val sc = spark.sparkContext
    val df = corpus.toDF("doc_id", "text")
    val before = sc.getPersistentRDDs.size
    val out = Dedup.suffixRanks(df, "doc_id", "text", rounds = 8)
    out.count()
    // only the FINAL level's blocks may remain pinned: every superseded
    // doubling round released explicitly (round 13 relied on a
    // System.gc() nudge for ContextCleaner to reclaim them)
    val after = sc.getPersistentRDDs.size
    assert(after <= before + 1, s"pinned RDDs grew $before -> $after")
  }

  test("spanScrubVar keeps the first copy contiguous where spanScrub over-cuts") {
    // W1 = P1..P8 first occurs in doc 2; W2 = P2..P9 first occurs in
    // doc 1 — the two overlapping windows have firsts in DIFFERENT
    // docs, so fixed-window J12 cuts W2's non-first coverage [1,9) out
    // of doc 2 and fragments the supposedly-kept first occurrence of
    // W1 down to one token. Variable-length semantics protect it.
    val ps = (1 to 9).map(i => s"P$i")
    val docs = Seq(
      1L -> ("z " + ps.drop(1).mkString(" ")),
      2L -> ps.mkString(" "),
      3L -> (ps.take(8).mkString(" ") + " q")).toDF("doc_id", "text")
    val fixed = Dedup.spanScrub(docs, "doc_id", "text", spanLen = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fixed(2L) === "P1") // the over-cut: first copy fragmented
    val v = Dedup.spanScrubVar(docs, "doc_id", "text", minLen = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byId = v.map(t => t._1 -> t).toMap
    // doc 1 holds W2's first occurrence: fully intact
    assert(byId(1L) === ((1L, "z " + ps.drop(1).mkString(" "), 9L, 0L)))
    // doc 2 keeps W1's first occurrence CONTIGUOUS; only P9 (part of
    // the non-first W2 occurrence, outside W1's protection) is cut
    assert(byId(2L) === ((2L, ps.take(8).mkString(" "), 8L, 1L)))
    // doc 3's pure non-first copy is cut whole
    assert(byId(3L) === ((3L, "q", 1L, 8L)))
  }

  test("spanScrubVar: internally-edited boilerplate rebuilds to its true remainder") {
    val df = corpus.toDF("doc_id", "text")
    val v = Dedup.spanScrubVar(df, "doc_id", "text", minLen = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1 holds every first occurrence: intact
    assert(v(1L)._1 === corpus.find(_._1 == 1L).get._2 && v(1L)._3 === 0L)
    // doc 2 (pure copy): the whole 60-token boilerplate cut
    assert(v(2L) === ((noise(3, 5), 5L, 60L)))
    // doc 3 (internal edit): BOTH unedited segments cut whole, the
    // edit token and surrounding noise kept — 59 tokens removed
    assert(v(3L) === ((s"${noise(4, 7)} EDITED ${noise(5, 6)}", 14L, 59L)))
    // conservation: kept + removed == source tokens, every doc
    corpus.foreach { case (id, text) =>
      assert(v(id)._2 + v(id)._3 === text.split(" ", -1).length.toLong)
    }
  }

  /** Brute-force longest duplicated substring per doc: the max length
    * of a token run occurring at ≥ 2 (doc, pos) positions corpus-wide
    * (within-doc repeats count — the Lee et al. criterion). */
  private def refLongestDup(docs: Seq[(Long, String)]): Map[Long, Long] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val occ = collection.mutable.Map.empty[Seq[String], Int]
    for ((_, ts) <- toks; s <- ts.indices; e <- (s + 1) to ts.length)
      occ(ts.slice(s, e)) = occ.getOrElse(ts.slice(s, e), 0) + 1
    docs.map { case (id, _) =>
      val ts = toks(id)
      val best = (for {
        s <- ts.indices; e <- (s + 1) to ts.length
        if occ(ts.slice(s, e)) >= 2
      } yield e - s).foldLeft(0)(math.max)
      id -> best.toLong
    }.toMap
  }

  test("longestDuplicate matches brute force and certifies its source") {
    val df = corpus.toDF("doc_id", "text")
    val rows = Dedup.longestDuplicate(df, "doc_id", "text", rounds = 8).collect()
    val ref = refLongestDup(corpus)
    val toks = corpus.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    rows.foreach { r =>
      val (id, len, pos) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(len === ref(id), s"doc $id longest-dup length")
      if (len > 0) {
        val run = toks(id).slice(pos.toInt, (pos + len).toInt)
        assert(r.getString(5) === run.mkString(" "))
        // the reported source is a REAL other occurrence of the run
        val (sd, sp) = (r.getLong(3), r.getLong(4))
        assert((sd, sp) !== ((id, pos)))
        assert(toks(sd).slice(sp.toInt, (sp + len).toInt) === run,
          s"doc $id: certified source ($sd,$sp) does not carry the run")
      } else assert(r.isNullAt(3) && r.isNullAt(4) && r.getString(5) === "")
    }
    // J17b tie-in: a cross-doc duplicated region implies longest dup
    // >= 8; conversely a doc with longest dup >= 8 and NO within-doc
    // repeat of that length must carry a J17b region (J17c counts
    // within-doc repeats — doc 4's periodic noise has them — J17b is
    // cross-doc by construction)
    val varDocs = Dedup.spanDedupVar(df, "doc_id", "text", minLen = 8)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val withinDup: Map[Long, Long] = corpus.map { case (id, t) =>
      val ts = t.split(" ", -1).toSeq
      val occ = collection.mutable.Map.empty[Seq[String], Int]
      for (s <- ts.indices; e <- (s + 1) to ts.length)
        occ(ts.slice(s, e)) = occ.getOrElse(ts.slice(s, e), 0) + 1
      id -> (for {
        s <- ts.indices; e <- (s + 1) to ts.length
        if occ(ts.slice(s, e)) >= 2
      } yield e - s).foldLeft(0)(math.max).toLong
    }.toMap
    rows.foreach { r =>
      val (id, len) = (r.getLong(0), r.getLong(1))
      if (varDocs.contains(id))
        assert(len >= 8L, s"doc $id: J17b region without a >=8 dup run")
      if (len >= 8L && withinDup(id) < 8L)
        assert(varDocs.contains(id),
          s"doc $id: cross-doc >=8 dup run but no J17b region")
    }
  }

  test("hot rank group: one suffix class spanning the whole corpus " +
      "(rankGroupAnnotate streams, never buffers the group)") {
    // Degenerate corpus for the round-15 verdict's OOM class: many docs
    // with IDENTICAL text, so every suffix class holds one member per
    // doc and the rank groups never separate — the largest group spans
    // `hot` rows. The streaming two-cursor rankGroupAnnotate must
    // produce the same report as the buffered shape did (pinned here
    // against brute force), holding O(1) rows per partition.
    val hot = 400
    val hotText = (1 to 24).map(i => s"h$i").mkString(" ")
    val hotCorpus = (1L to hot.toLong).map(id => (id, hotText)) ++
      Seq((hot + 1L, "unique tail tokens zz yy xx"))
    val df = hotCorpus.toDF("doc_id", "text").repartition(7)
    val rows = Dedup.longestDuplicate(df, "doc_id", "text", rounds = 8)
      .collect()
    assert(rows.length === hot + 1)
    val ref = refLongestDup(hotCorpus)
    rows.foreach { r =>
      assert(r.getLong(1) === ref(r.getLong(0)),
        s"doc ${r.getLong(0)} longest-dup length under hot rank groups")
    }
    // every identical doc's longest dup is its full 24-token text at
    // pos 0, certified from a DIFFERENT (doc, pos)
    rows.filter(_.getLong(0) <= hot).foreach { r =>
      assert(r.getLong(1) === 24L && r.getLong(2) === 0L)
      assert((r.getLong(3), r.getLong(4)) !== ((r.getLong(0), 0L)))
    }
  }

  test("rankGroupAnnotate equals the groupBy reference on a skewed " +
      "range-partitioned level") {
    // direct contract check of the streaming annotator: occupancy +
    // two struct-min members per rank group, attached to every row —
    // on an input honoring its invariant (equal ranks contiguous
    // inside one range partition — the contract pinRanked provides),
    // with one hot group, one mid-sized group, and a singleton tail.
    val rows = (1L to 500L).map { i =>
      val r = if (i <= 300) 1L else if (i <= 310) 2L else 2L + (i - 310)
      (i, i * 3 % 97, r) // (doc_id, pos, rank)
    }
    val fin = rows.toDF("doc_id", "pos", "r")
      .repartitionByRange(5, col("r"))
      .sortWithinPartitions("r")
    val got = Dedup.rankGroupAnnotate(fin)
      .select("doc_id", "pos", "r", "cnt", "f1.doc_id", "f1.pos",
        "f2.doc_id", "f2.pos")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        (x.getLong(4), x.getLong(5)),
        if (x.isNullAt(6)) null else (x.getLong(6), x.getLong(7))))
    assert(got.length === 500)
    val byRank = rows.groupBy(_._3)
    got.foreach { case (d, p, r, cnt, f1, f2) =>
      val grp = byRank(r).map(x => (x._1, x._2)).sorted
      assert(cnt === grp.length.toLong, s"rank $r occupancy")
      assert(f1 === grp.head, s"rank $r struct-min")
      if (grp.length >= 2) assert(f2 === grp(1), s"rank $r second min")
      else assert(f2 === null)
      assert(rows.contains((d, p, r)))
    }
  }

  test("spanDedupVar covered positions equal spanScrub's removal cover") {
    // the scrub (J12) and the variable-length report (J17b) must agree
    // on WHICH positions are duplicated: every position inside a J17b
    // span of doc d is exactly a position J12 counts as covered
    // (modulo J12 keeping the corpus-wide first occurrence — so compare
    // against the UNION of covered+kept, i.e. token count minus
    // survivors of a scrub run with the first-occurrence carve-out
    // disabled is not directly observable; instead recompute coverage
    // from the J17b spans and check n_removed <= coverage per doc).
    val df = corpus.toDF("doc_id", "text")
    val spanCover = Dedup.spanDedupVar(df, "doc_id", "text", minLen = 8)
      .groupBy("doc_id").agg(sum("span_len").as("covered"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scrub = Dedup.spanScrub(df, "doc_id", "text", spanLen = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    scrub.foreach { case (d, removed) =>
      assert(removed <= spanCover.getOrElse(d, 0L),
        s"doc $d: scrub removed $removed > covered ${spanCover.getOrElse(d, 0L)}")
    }
  }
}
