package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass PII scrub (SURVEY.md §2 Q12): all redaction patterns are
  * compiled into a single ordered alternation `(p1)|(p2)|...` and the
  * text is scanned ONCE — each match appends its branch's marker and
  * bumps its branch's count. The composed form
  * ([[graft.operators.Curation.piiScrub]]) runs `regexp_count` +
  * `regexp_replace` per pattern — 2·P full regex scans and P−1
  * intermediate string materializations per document; this expression
  * does the same work in one scan and one output string, invoked as
  * one compiled call inside whole-stage codegen. At a 100 TB corpus
  * the scrub is a pure map stage, so the per-row constant IS the
  * operator's entire cost.
  *
  * Semantics: java.util.regex and RE2 both resolve alternations
  * leftmost-first (earlier position wins; at equal positions the
  * earlier BRANCH wins), so on texts where no two patterns' matches
  * overlap — every real corpus; PiiScrubSpec asserts parity with the
  * sequential form on the gate corpus and on generated text — the
  * result is identical to the sequential multi-pass scrub. On
  * pathological overlaps the two differ by design: sequential gives
  * pattern 1 priority even when a later-listed pattern matches at an
  * earlier position; the fused scan redacts in strict position order
  * (the spec pins an example). Patterns must stay in the RE2 ∩
  * java.util.regex dialect and must not match the empty string
  * (checked at construction).
  */
case class PiiScrubAll(child: Expression, patterns: Seq[(String, String, String)])
    extends UnaryExpression {

  require(patterns.nonEmpty, "pii_scrub_all: need at least one pattern")

  override def prettyName: String = "pii_scrub_all"

  override def dataType: DataType = StructType(
    StructField("scrubbed", StringType, nullable = false) +:
      patterns.map { case (nm, _, _) =>
        StructField(s"n_$nm", IntegerType, nullable = false)
      })

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  @transient private lazy val scrubber =
    new PiiScrubber(patterns.map { case (_, re, repl) => Array(re, repl) }.toArray)

  override def nullSafeEval(v: Any): Any =
    scrubber.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scrubber", scrubber,
      classOf[PiiScrubber].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): PiiScrubAll =
    copy(child = newChild)
}

/** The compiled scanner behind [[PiiScrubAll]] — one instance per
  * expression, shipped to tasks as a codegen reference object (the
  * SignBuckets pattern); the combined Pattern compiles lazily on each
  * executor. `pats(i) = [regex, replacement]`. */
class PiiScrubber(pats: Array[Array[String]]) extends Serializable {
  import java.util.regex.Pattern

  /** Top-level group index of each branch: patterns carry their own
    * inner groups, so branch i's wrapping group sits after all the
    * groups of branches 0..i-1. */
  @transient private lazy val branchGroup: Array[Int] = {
    val idx = new Array[Int](pats.length)
    var g = 1
    var i = 0
    while (i < pats.length) {
      idx(i) = g
      g += 1 + Pattern.compile(pats(i)(0)).matcher("").groupCount()
      i += 1
    }
    idx
  }

  @transient private lazy val combined: Pattern = {
    pats.foreach { p =>
      require(!Pattern.compile(p(0)).matcher("").find(),
        s"pii_scrub_all: pattern '${p(0)}' matches the empty string")
    }
    Pattern.compile(pats.map(p => "(" + p(0) + ")").mkString("|"))
  }

  def compute(u: UTF8String): InternalRow = {
    val s = u.toString
    val counts = new Array[Int](pats.length)
    val m = combined.matcher(s)
    var sb: java.lang.StringBuilder = null
    var last = 0
    while (m.find()) {
      var b = 0
      while (m.start(branchGroup(b)) < 0) b += 1
      counts(b) += 1
      if (sb == null) sb = new java.lang.StringBuilder(s.length)
      sb.append(s, last, m.start()).append(pats(b)(1))
      last = m.end()
    }
    val out = new Array[Any](1 + pats.length)
    out(0) =
      if (sb == null) u
      else UTF8String.fromString(sb.append(s, last, s.length).toString)
    var i = 0
    while (i < pats.length) { out(i + 1) = counts(i); i += 1 }
    new GenericInternalRow(out)
  }
}
