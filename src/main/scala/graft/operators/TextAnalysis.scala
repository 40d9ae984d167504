package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text-analysis operators for LLM training-data pipelines
  * (SURVEY.md §2 L): quality scoring, language ID, token stats,
  * fingerprinting. All pure column expressions (whole-stage codegen,
  * no UDFs) so they stream through a 100 TB corpus scan with no
  * shuffle at all — the only shuffle in the fingerprint query is the
  * final collapse groupBy.
  */
object TextAnalysis {

  val stopEn = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
  val stopFr = Seq("le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans")
  val stopDe = Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "mit")
  val stopEs = Seq("el", "la", "de", "y", "un", "una", "es", "que", "por", "con")

  private def tokens(text: Column): Column = split(text, " ")

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(typedLit(words), t)))

  /** Per-document quality features + a deterministic composite score.
    * Mirrors the length/punctuation/stopword heuristics used by
    * public web-corpus quality filters. */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    val nChars = length(text).cast("long")
    val nTokens = size(toks).cast("long")
    // one byte pass for both class counts (the regexp_replace pair
    // cost two full regex scans + two replacement strings per doc just
    // to read off lengths); both field references CSE to one eval
    val cc = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.AsciiClassCounts(
        org.apache.spark.sql.graft.ColumnBridge.expression(text)))
    val nAlnum = cc.getField("n_alnum")
    val nDigits = cc.getField("n_digits")
    val stopRatio =
      hitCount(toks, stopEn).cast(DoubleType) / nTokens.cast(DoubleType)
    val alnumRatio = nAlnum.cast(DoubleType) / nChars.cast(DoubleType)
    val digitRatio = nDigits.cast(DoubleType) / nChars.cast(DoubleType)
    val avgTokLen =
      (nChars - (nTokens - 1)).cast(DoubleType) / nTokens.cast(DoubleType)
    val score =
      least(nTokens.cast(DoubleType) / lit(100.0), lit(1.0)) * lit(0.4) +
        stopRatio * lit(0.3) +
        least(avgTokLen / lit(10.0), lit(1.0)) * lit(0.3)
    df.select(
      col(idCol),
      nChars.as("n_chars"),
      nTokens.as("n_tokens"),
      alnumRatio.as("alnum_ratio"),
      digitRatio.as("digit_ratio"),
      stopRatio.as("stopword_ratio"),
      score.as("quality_score"))
      .orderBy(col(idCol))
  }

  /** Stopword-hit language scoring (en/fr/de/es) with a fixed
    * tie-break priority — the classic n-gram/stopword heuristic
    * language ID, as one codegen'd expression. */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val sEn = hitCount(toks, stopEn)
    val sFr = hitCount(toks, stopFr)
    val sDe = hitCount(toks, stopDe)
    val sEs = hitCount(toks, stopEs)
    val lang =
      when(sEn >= sFr && sEn >= sDe && sEn >= sEs, "en")
        .when(sFr >= sDe && sFr >= sEs, "fr")
        .when(sDe >= sEs, "de")
        .otherwise("es")
    df.select(
      col(idCol),
      sEn.cast("long").as("score_en"), sFr.cast("long").as("score_fr"),
      sDe.cast("long").as("score_de"), sEs.cast("long").as("score_es"),
      lang.as("lang_pred"))
      .orderBy(col(idCol))
  }

  /** Token counting: whitespace tokens, regex word tokens, distinct
    * tokens — the inputs to dedup shingling and BPE budgeting. */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.select(
      col(idCol),
      size(toks).cast("long").as("n_ws_tokens"),
      // \A..\z, not ^..$: Java's $ also matches before a FINAL line
      // terminator (\n, \r, NEL U+0085, U+2028/9), so "word"
      // would count as alpha here while an RE2/strict consumer of the
      // same data disagrees. \z anchors to end-of-input only — the
      // strict "every char is [a-z]" semantics this column claims.
      size(filter(toks, t => t.rlike("\\A[a-z]+\\z"))).cast("long").as("n_alpha_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct_tokens"))
      .orderBy(col(idCol))
  }

  /** Normalized sorted-distinct-word fingerprint (the "key collapse"
    * canonicalization): documents with the same word set share a
    * fingerprint. Returns one row per fingerprint with its cluster
    * size and canonical (min) id. */
  /** L8 — n-gram LM fluency scoring (the CCNet/KenLM filtering stage,
    * Wenzek et al. 2020: score every candidate document under a
    * language model fit on a high-quality reference corpus, and keep
    * the fluent head — the standard web-corpus quality pass BESIDE
    * heuristic signals (Q1/Q15) and domain matching (Q16)).
    *
    * Model: bigram conditional with add-half smoothing,
    * `p(w2|w1) = (2·c(w1w2)+1) / (2·c(w1·)+V)` where `c(w1·)` counts
    * reference bigrams starting with w1 and V is the reference
    * vocabulary size. Per this repo's exact-arithmetic contract the
    * per-bigram LOG surprisal is replaced by the quantized LINEAR
    * likelihood `q = floor(p·grid + 0.5)` (ONE correctly-rounded IEEE
    * division per bigram TYPE — integer everywhere else), and the doc
    * score is `mean(q)` over its bigram tokens — monotone in the same
    * evidence, exactly replayable in any engine. Back-off: unseen
    * (w1,w2) with seen prefix scores the prefix's smoothed floor;
    * unseen prefix scores the vocabulary floor.
    *
    * Shape: model ∝ reference bigram types (one agg); the candidate
    * side is one gram-stream pass with two equi-joins against the
    * model tables and a per-doc sum — the Q16 posture, shuffle ∝
    * corpus grams, nothing driver-side. */
  def lmFluency(
      df: DataFrame, idCol: String, textCol: String, refPred: Column,
      grid: Long = 1L << 20): DataFrame = {
    def bigrams(d: DataFrame, cols: Column*): DataFrame = d
      .withColumn("__toks", split(col(textCol), " "))
      .where(size(col("__toks")) >= 2)
      .select(cols :+ explode(
        graft.functions.HashFunctions.string_ngrams(col("__toks"), 2))
        .as("gram"): _*)
      .withColumn("w1", split(col("gram"), " ").getItem(0))
    val ref = bigrams(df.where(refPred))
    // ONE bounded driver value (a single long — the Lloyd-collect
    // pattern): attaching it as a 1-row broadcast cross join would put
    // a nested-loop join on the corpus-wide gram stream instead
    val v: Long = df.where(refPred)
      .select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .agg(count_distinct(col("w"))).head().getLong(0)
    require(v > 0, "lmFluency: the reference slice has no words to fit on")
    val prefix = ref.groupBy("w1").agg(count(lit(1)).as("c1"))
    val model = ref.groupBy("gram", "w1").agg(count(lit(1)).as("c12"))
      .join(prefix, "w1")
      .select(col("gram"),
        floor(
          (lit(2L) * col("c12") + lit(1L)).cast(DoubleType) /
            (lit(2L) * col("c1") + lit(v)).cast(DoubleType) *
            lit(grid.toDouble) + lit(0.5)).cast("long").as("q"))
    val prefixFloor = prefix
      .select(col("w1"),
        floor(
          lit(1.0) / (lit(2L) * col("c1") + lit(v)).cast(DoubleType) *
            lit(grid.toDouble) + lit(0.5)).cast("long").as("q1"))
    val q0 = math.floor(1.0 / v.toDouble * grid.toDouble + 0.5).toLong
    val cand = bigrams(df.where(!refPred), col(idCol))
    cand
      .join(model, Seq("gram"), "left_outer")
      .join(prefixFloor, Seq("w1"), "left_outer")
      .select(col(idCol),
        coalesce(col("q"), col("q1"), lit(q0)).as("qe"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("qe")).as("score_sum"))
      .select(col(idCol), col("n_bigrams"), col("score_sum"),
        (col("score_sum").cast(DoubleType) /
          col("n_bigrams").cast(DoubleType)).as("fluency"))
      .orderBy(col(idCol))
  }

  /** L12 — the CCNet SELECTION step (Wenzek et al. 2020 §4.3): corpus
    * split into head/middle/tail thirds by LM fluency, so downstream
    * mixing can keep the head, resample the middle, drop the tail.
    *
    * Buckets come from VALUE thresholds, not per-row ranks: the
    * distinct-fluency histogram folds once (exchange ∝ distinct score
    * classes — the A6 exact-comparator posture; at cluster scale feed
    * the two edges from the A6 quantile sketch instead and skip the
    * histogram entirely), cumulative counts in descending-fluency
    * order pick the boundary VALUES at integer ranks ceil(n/3) and
    * ceil(2n/3) (pure integer arithmetic — `(n+2) div 3`), and the
    * 1-row edge frame broadcasts back over the scored corpus for a
    * map-side CASE. Docs sharing a fluency value share a bucket (the
    * straddling value folds into the earlier bucket) — deterministic
    * on every engine, no rank tie-break needed. */
  def fluencyBuckets(
      df: DataFrame, idCol: String, textCol: String, refPred: Column,
      grid: Long = 1L << 20): DataFrame = {
    // consumed by BOTH the histogram and the final assignment — pay
    // the gram-stream joins once (the shared-checkpoint pattern)
    val fl = lmFluency(df, idCol, textCol, refPred, grid).localCheckpoint(true)
    val counts = fl.groupBy(col("fluency").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val staged = counts
      .withColumn("__cum", sum(col("__c")).over(
        Window.orderBy(col("__v").desc)))
      .withColumn("__n", sum(col("__c")).over(
        Window.partitionBy()))
    val edges = staged.agg(
      max(when(col("__cum") >= expr("(__n + 2) div 3"), col("__v"))).as("__b1"),
      max(when(col("__cum") >= expr("(2 * __n + 2) div 3"), col("__v"))).as("__b2"))
    fl.crossJoin(broadcast(edges))
      .select(col(idCol), col("n_bigrams"), col("score_sum"), col("fluency"),
        when(col("fluency") >= col("__b1"), lit("head"))
          .when(col("fluency") >= col("__b2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
      .orderBy(col(idCol))
  }

  def fingerprintClusters(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = md5(
      array_join(array_sort(array_distinct(tokens(lower(col(textCol))))), " ")
        .cast("binary"))
    df.select(col(idCol), fp.as("fingerprint"))
      .groupBy("fingerprint")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("canonical_id"))
      .orderBy("fingerprint")
  }
}
