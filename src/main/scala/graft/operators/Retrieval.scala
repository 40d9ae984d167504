package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse + hybrid retrieval over a document corpus — the query-time
  * twin of the curation stack (SURVEY.md §2 L/K): BM25 keyword
  * scoring and reciprocal-rank fusion of a sparse and a dense (ANN)
  * ranking, the standard first-stage retriever pair in RAG and
  * training-data attribution pipelines.
  *
  * Determinism contract (the same one [[Curation.tfidfTopTerms]]
  * documents): no `ln` — libm `log` differs in the last ulp across
  * engines and can flip ranks. BM25's idf uses the RATIONAL form
  * `(N − df + 0.5)/(df + 0.5)` rewritten over exact integers as
  * `(2(N − df) + 1)/(2 df + 1)` — ONE correctly-rounded IEEE division
  * — and every other factor is a fixed left-associated chain of
  * IEEE `+ * /` over exact integer casts, so Spark and any
  * correctly-rounding engine produce bit-identical doubles.
  *
  * Scale shape (100 TB corpus, small query set): doc length is a
  * map-side projection on the corpus scan; term frequencies only
  * materialize for documents containing a query term (the `IN` filter
  * prunes before the (doc, term) shuffle); per-term df and corpus
  * stats are tiny broadcast sides; the final top-k is
  * `TakeOrderedAndProject` (per-partition heads, no global sort, no
  * single-partition window).
  */
object Retrieval {

  /** Per-document BM25 scores against a FIXED ordered term set.
    * Returns one row per document containing ≥ 1 query term:
    * `(idCol, dl, score)`. Cross-term summation is a left-associated
    * fixed-order `+` chain over the pivoted per-term scores (a
    * float SUM's partial-aggregation order is engine- and
    * partition-dependent; a pivot over a fixed small term set is not).
    */
  /** `(idCol, dl, __hits)` hit projection of the corpus — one scan,
    * query terms filtered per row. */
  private[graft] def hitBase(
      df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    val toks = split(col(textCol), " ")
    df.select(col(idCol), size(toks).cast("long").as("dl"),
      filter(toks, t => array_contains(typedLit(terms), t)).as("__hits"))
  }

  /** `(idCol, dl, term, tf)` posting counts — the hit filter sits
    * DIRECTLY on the corpus scan, so only documents containing a
    * query term reach the one posting exchange (plan-audited). */
  private[graft] def postingCounts(base: DataFrame, idCol: String): DataFrame =
    base.where(size(col("__hits")) > 0)
      .select(col(idCol), col("dl"), explode(col("__hits")).as("term"))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

  def bm25Scores(
      df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.size <= 32,
      s"bm25Scores: need 1..32 query terms, got ${terms.size}")
    val oneMinusB = 1.0 - b
    val k1p1 = k1 + 1.0
    // one corpus scan: id, doc length, query-term hits only
    val base = hitBase(df, idCol, textCol, terms)
    val stats = base.agg(
      count(lit(1)).as("n"), sum(col("dl")).as("tot"))
    // The posting table feeds TWO consumers (the document-frequency
    // aggregate and the scored join); Spark has no common-subplan
    // reuse once the consumers prune differently, so without
    // materialization the hit-filtered corpus scan AND the posting
    // exchange run twice (plan-audited: ReuseExchange does not fire
    // because the df side drops the count). One eager localCheckpoint
    // pins it — size ∝ matching postings (docs containing a query
    // term × distinct query terms), tiny at any corpus scale.
    val tf = postingCounts(base, idCol).localCheckpoint(true)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val avgdl = col("tot").cast("double") / col("n").cast("double")
    val idf = (lit(2L) * (col("n") - col("df")) + lit(1L)).cast("double") /
      (lit(2L) * col("df") + lit(1L)).cast("double")
    val denom = col("tf").cast("double") +
      lit(k1) * (lit(oneMinusB) + lit(b) * col("dl").cast("double") / avgdl)
    val scored = tf
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("dl"), col("term"),
        (idf * (col("tf").cast("double") * lit(k1p1) / denom)).as("__s"))
    val pivots = terms.zipWithIndex.map { case (t, i) =>
      coalesce(max(when(col("term") === t, col("__s"))), lit(0.0)).as(s"__s$i")
    }
    scored.groupBy(col(idCol), col("dl"))
      .agg(pivots.head, pivots.tail: _*)
      .select(col(idCol), col("dl"),
        terms.indices.map(i => col(s"__s$i"): Column)
          .reduceLeft(_ + _).as("score"))
  }

  /** BM25 top-k retrieval: ranked `(idCol, dl, score, rank)`. The
    * global head is `orderBy(...).limit(k)` — Spark plans it as
    * `TakeOrderedAndProject` (bounded per-partition heaps merged on
    * the driver), so no stage ever sees more than k rows; the rank
    * window then runs over ≤ k rows. */
  def bm25TopK(
      df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val top = bm25Scores(df, idCol, textCol, terms, k1, b)
      .orderBy(col("score").desc, col(idCol)).limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col(idCol))))
      .orderBy("rank")
  }

  /** Reciprocal-rank fusion of N ranked lists: `Σ 1/(rrfK + rank_i)`
    * over the lists containing the doc, summed in LIST ORDER (fixed
    * left-associated `+` chain — see the class determinism note).
    * Each input must carry `(idCol, rankCol)`; lists are expected to
    * be small top-n heads (they are broadcast through the outer
    * joins), so fusion cost is ∝ Σ list sizes, independent of corpus
    * size. Returns the fused top-k `(idCol, rank_1.., rrf, rank)`. */
  def rrfFuse(
      lists: Seq[DataFrame], idCol: String, rankCol: String,
      rrfK: Int, k: Int): DataFrame = {
    require(lists.size >= 2, "rrfFuse: need at least two rankings")
    val named = lists.zipWithIndex.map { case (l, i) =>
      l.select(col(idCol), col(rankCol).as(s"rank_$i"))
    }
    val joined = named.reduceLeft((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val rrf = lists.indices.map { i =>
      coalesce(lit(1.0) / (lit(rrfK.toLong) + col(s"rank_$i")).cast("double"),
        lit(0.0)): Column
    }.reduceLeft(_ + _)
    val top = joined.withColumn("rrf", rrf)
      .orderBy(col("rrf").desc, col(idCol)).limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("rrf").desc, col(idCol))))
      .orderBy("rank")
  }

  /** Dense top-n: exact cosine of one stored query vector against the
    * corpus, as a ranked list shaped for [[rrfFuse]]. The corpus scan
    * carries no shuffle before the `TakeOrderedAndProject` head. */
  def denseTopN(
      emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, n: Int): DataFrame = {
    val q = broadcast(emb.where(col(idCol) === queryId)
      .select(col(vecCol).as("__qv")))
    val top = emb.where(col(idCol) =!= queryId)
      .crossJoin(q)
      .select(col(idCol),
        graft.functions.GraftFunctions.cosine_sim(col("__qv"), col(vecCol))
          .as("cosine"))
      .orderBy(col("cosine").desc, col(idCol)).limit(n)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("cosine").desc, col(idCol))))
      .orderBy("rank")
  }
}
