package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Q18 — a LEARNED document-quality classifier: hashed bag-of-words
  * features + a hard-sigmoid logistic unit trained by full-batch
  * gradient descent, then served as one stateless scoring expression.
  * This is the "quality classifier" stage of a production LLM data
  * pipeline (GPT-3's WebText-vs-CommonCrawl LR filter, Brown et al.
  * 2020 §A; fineweb-edu's learned quality scorer): fit on a small
  * curated seed (label 1) vs the wild corpus (label 0), then keep the
  * wild documents the model scores as seed-like. It complements the
  * engine's HEURISTIC filters (Q15 Gopher thresholds, Q1 signals) and
  * the distribution-matching sampler (Q16 DSIR) with a trained
  * discriminative cut.
  *
  * Exact-arithmetic contract (the repo's cross-engine determinism
  * rule, taken one step further than Q16/L8): there is NO floating
  * point anywhere — features are md5-hashed token buckets, the model
  * is an integer weight vector at grid scale `S = 2^20`, the logistic
  * is the hard sigmoid `pS(m) = (clamp(m + 2S, 0, 4S)) >> 2` (exact:
  * the clamped numerator is nonnegative, so the shift IS floor
  * division by 4 in any engine), the per-epoch update is
  * `w_b <- clamp(w_b - floorDiv(g_b, 4n), ±2S)` with floorDiv spelled
  * via a nonnegative-offset trick so Spark's `div`, DuckDB's `//` and
  * Java's Math.floorDiv all agree, and the keep decision is the
  * integer comparison `2·pS >= S` (p >= 0.5). A DuckDB oracle replays
  * the ENTIRE training loop epoch-by-epoch in unrolled CTEs and must
  * reproduce every margin bit-exactly.
  *
  * Plan economics (the 100 TB shape): the corpus tokenizes ONCE into a
  * checkpointed slim frame `(id, y, barr)` — one row per document, an
  * int-array of its distinct feature buckets (≤ min(|doc|, B+1),
  * intercept bucket B appended). Each epoch is ONE map pass over that
  * frame: the margin is a codegen'd `aggregate` over the bucket array
  * against a broadcast weight-array LITERAL (array element_at — O(1)
  * per lookup, no join, no shuffle on document keys), and the gradient
  * is `explode(barr) -> groupBy(bucket) -> sum(e)` whose exchange is
  * ≤ partitions × (B+1) partial rows — bytes ∝ the bucket count, never
  * the corpus. The per-epoch driver collect is exactly B+1 rows
  * (bounded by `require`, the codebook-collect house style). Scoring
  * is a pure per-row expression — [[scoreExpr]] — reusable verbatim on
  * unbounded streams (stateless, no state store).
  *
  * Overflow bounds (all documented, all inside BIGINT): |w| ≤ 2S=2^21,
  * |margin| ≤ (B+1)·2S ≤ 2^33 at B=4096; |e| ≤ S; |g| ≤ n·S and the
  * offset numerator ≤ 5nS — safe for n up to 2^40 documents.
  */
object Classifier {

  /** Grid scale: integer weights represent w/S reals. */
  val S: Long = 1L << 20

  /** Weight clip: |w| ≤ 2S (keeps every margin term in the hard
    * sigmoid's dynamic range and every product inside BIGINT). */
  val Clip: Long = 2 * S

  /** md5-derived feature bucket of one token — identical in any engine
    * with md5 (the Q16 idiom). */
  def tokenBucket(tok: Column, buckets: Int): Column =
    (conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % buckets).cast("int")

  /** The slim per-document feature frame `(id, y, barr)`: distinct
    * hashed buckets of the whitespace tokens, intercept bucket
    * `buckets` appended (every document has it, so zero-token rows
    * still carry the bias feature). One tokenize pass; fixed-width
    * output ∝ documents. */
  private[graft] def featureFrame(
      df: DataFrame, idCol: String, textCol: String, labelPred: Column,
      buckets: Int): DataFrame =
    df.select(
      col(idCol).as("__id"),
      labelPred.cast("boolean").as("__y"),
      concat(
        array_distinct(transform(
          split(col(textCol), " "), t => tokenBucket(t, buckets))),
        array(lit(buckets))).as("__barr"))

  /** Margin of one document under integer weights: Σ_{b ∈ barr} w_b,
    * an `aggregate` fold against an array LITERAL (no join). */
  private def marginCol(barr: Column, w: Array[Long]): Column =
    aggregate(barr, lit(0L),
      (acc, b) => acc + element_at(typedlit(w.toSeq), b + lit(1)))

  /** Hard-sigmoid probability at grid scale: (clamp(m+2S,0,4S)) >> 2.
    * The clamped numerator is nonnegative, so the arithmetic shift is
    * exact floor division by 4 in Spark, DuckDB and the JVM alike. */
  private[graft] def probS(m: Column): Column =
    shiftright(greatest(lit(0L), least(lit(4 * S), m + lit(2 * S))), 2)

  /** Fit integer weights (size buckets+1; index `buckets` = bias) by
    * `epochs` rounds of full-batch GD over ALL rows of `df` (label =
    * `labelPred`). Each epoch: one map pass + one ≤(B+1)-row exchange
    * + one (B+1)-row driver collect. */
  def fit(
      df: DataFrame, idCol: String, textCol: String, labelPred: Column,
      buckets: Int = 64, epochs: Int = 4): Array[Long] = {
    require(buckets >= 1 && buckets <= 4096,
      s"qualityClassifier: need 1..4096 buckets, got $buckets")
    require(epochs >= 1 && epochs <= 64,
      s"qualityClassifier: need 1..64 epochs, got $epochs")
    // ONE tokenize pass; everything downstream re-reads the slim
    // checkpointed frame (id, y, barr) — executor-resident.
    val feat = featureFrame(df, idCol, textCol, labelPred, buckets)
      .localCheckpoint(true)
    val n = feat.count()
    require(n >= 1, "qualityClassifier: empty training corpus")
    val w = Array.fill(buckets + 1)(0L)
    try for (_ <- 1 to epochs) {
      val e = (probS(marginCol(col("__barr"), w)) -
        when(col("__y"), lit(S)).otherwise(lit(0L))).as("__e")
      // gradient: explode the bucket array against the per-doc error;
      // partial aggregation collapses to ≤ B+1 rows per partition
      // before the ONE tiny exchange. Driver collect = B+1 rows.
      val grads = feat.select(e, explode(col("__barr")).as("__b"))
        .groupBy(col("__b")).agg(sum(col("__e")).as("__g"))
        .collect()
      // w_b <- clamp(w_b - floorDiv(g_b, 4n), ±Clip); buckets with no
      // occurrences have g = 0 and stay put on both engines.
      grads.foreach { r =>
        val b = r.getInt(0); val g = r.getLong(1)
        val d = Math.floorDiv(g, 4L * n)
        w(b) = Math.max(-Clip, Math.min(Clip, w(b) - d))
      }
    } finally feat.unpersist()
    w
  }

  /** The stateless scoring expression for FITTED weights: margin,
    * reusable verbatim on batch frames and unbounded streams (pure
    * per-row compute — tokenize, hash, distinct, fold; no join, no
    * state). */
  def scoreExpr(textCol: Column, w: Array[Long], buckets: Int): Column =
    aggregate(
      concat(
        array_distinct(transform(
          split(textCol, " "), t => tokenBucket(t, buckets))),
        array(lit(buckets))),
      lit(0L),
      (acc, b) => acc + element_at(typedlit(w.toSeq), b + lit(1)))

  /** Fit on ALL documents (seed = `labelPred` rows), then score and
    * cut the WILD side (`NOT labelPred`): `(id, margin, score, kept)`
    * per candidate, `kept = p >= 0.5`, ordered by id. The gate shape:
    * train + serve in one call, scoring as one map-only pass. */
  def trainAndScore(
      df: DataFrame, idCol: String, textCol: String, labelPred: Column,
      buckets: Int = 64, epochs: Int = 4): DataFrame = {
    val w = fit(df, idCol, textCol, labelPred, buckets, epochs)
    val m = scoreExpr(col(textCol), w, buckets).as("margin")
    df.where(!labelPred)
      .select(col(idCol), m)
      .select(
        col(idCol), col("margin"),
        probS(col("margin")).as("score"),
        (probS(col("margin")) * lit(2L) >= lit(S)).as("kept"))
      .orderBy(idCol)
  }
}
