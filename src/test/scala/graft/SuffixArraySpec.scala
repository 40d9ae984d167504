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
