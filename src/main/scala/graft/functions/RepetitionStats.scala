package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All Gopher-repetition integer counts of a token array in ONE
  * compiled pass (SURVEY.md §2 Q1): word count, distinct-word count,
  * max word multiplicity, max bigram multiplicity, and character sum —
  * the integer numerators/denominators
  * [[graft.operators.Curation.repetitionSignals]] turns into its
  * exact-ratio fractions. Null array elements are skipped exactly as a
  * composed `filter(x -> x IS NOT NULL)` pre-step would remove them
  * (neighbors of a removed null become bigram-adjacent) — the
  * expression is SQL-registered, so user arrays may carry nulls.
  *
  * Why an expression: the composed form needed four higher-order
  * functions per document (`zip_with` bigrams, `filter`, `aggregate`
  * char-sum — all CodegenFallback: one interpreted lambda invocation
  * per token) plus two sort-based multiplicity passes. Here the whole
  * signal set is a single O(L) hash-count pass per row, invoked as one
  * compiled static call inside whole-stage codegen.
  *
  * Parity contract (CurationSpec asserts equality with the composed
  * column algebra): multiplicities count occurrences exactly like
  * sort+longest-run; bigrams are adjacent pairs joined by one space
  * (`concat_ws(" ", w_i, w_{i+1})`); `char_sum` counts CHARACTERS
  * (`length()` semantics, not bytes). `top_bigram` is 0 when the array
  * has fewer than two tokens (the operator maps that to null share).
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def prettyName: String = "repetition_stats"
  override def dataType: DataType = RepetitionStats.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    RepetitionStats.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.RepetitionStats.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {

  val schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_word", IntegerType, nullable = false),
    StructField("top_bigram", IntegerType, nullable = false),
    StructField("char_sum", LongType, nullable = false)))

  /** One hash-count pass; called from generated code (static helper —
    * the standard pattern for keeping non-trivial per-row logic inside
    * a whole-stage-codegen pipeline without emitting it inline). */
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val words = new java.util.HashMap[UTF8String, Integer]()
    val bigrams = new java.util.HashMap[UTF8String, Integer]()
    val space = UTF8String.fromString(" ")
    var charSum = 0L
    var topWord = 0
    var topBigram = 0
    var prev: UTF8String = null
    var nWords = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i)
        nWords += 1
        charSum += w.numChars()
        val wc = words.merge(w, 1, (a, b) => a + b)
        if (wc > topWord) topWord = wc
        if (prev != null) {
          val bg = UTF8String.concat(prev, space, w)
          val bc = bigrams.merge(bg, 1, (a, b) => a + b)
          if (bc > topBigram) topBigram = bc
        }
        prev = w
      } // null element: skipped like filter(); prev survives, so the
        // neighbors of a removed null pair up, same as the filtered array
      i += 1
    }
    InternalRow(nWords, words.size, topWord, topBigram, charSum)
  }

  /** The Gopher keep decision from one stats pass — called by
    * [[GopherKeep]]'s generated code. Fraction arithmetic is the SAME
    * IEEE cast-and-divide the projected signal columns use, so the
    * predicate and the emitted signals can never disagree. */
  def gopherKeep(
      arr: ArrayData, minWords: Int, minDistinctFrac: Double,
      maxTopShare: Double): Boolean = {
    val st = compute(arr)
    val n = st.getInt(0)
    n >= minWords &&
      st.getInt(1).toDouble / n.toDouble >= minDistinctFrac &&
      st.getInt(2).toDouble / n.toDouble <= maxTopShare
  }
}

/** Gopher-threshold keep predicate in ONE expression (SURVEY.md §2
  * Q15). Why not compose `repetition_stats(...).field` comparisons:
  * predicate pushdown substitutes the projected aliases into the
  * Filter, and `FilterExec` does NOT run subexpression elimination —
  * each of the five struct references re-runs the whole O(L) stats
  * pass per row (measured 3.4× on the filter query at sf1). This
  * expression keeps the filter at exactly one stats pass per row no
  * matter where the optimizer moves it. */
case class GopherKeep(
    child: Expression, minWords: Int, minDistinctFrac: Double,
    maxTopShare: Double) extends UnaryExpression {

  require(minWords >= 1, s"gopher_keep: need minWords >= 1, got $minWords")

  override def prettyName: String = "gopher_keep"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    RepetitionStats.gopherKeep(
      v.asInstanceOf[ArrayData], minWords, minDistinctFrac, maxTopShare)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.RepetitionStats.gopherKeep(" +
        s"$a, $minWords, $minDistinctFrac, $maxTopShare);")

  override protected def withNewChildInternal(newChild: Expression): GopherKeep =
    copy(child = newChild)
}
