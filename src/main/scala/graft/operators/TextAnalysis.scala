package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
      size(filter(toks, t => t.rlike("^[a-z]+$"))).cast("long").as("n_alpha_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct_tokens"))
      .orderBy(col(idCol))
  }

  /** Normalized sorted-distinct-word fingerprint (the "key collapse"
    * canonicalization): documents with the same word set share a
    * fingerprint. Returns one row per fingerprint with its cluster
    * size and canonical (min) id. */
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
