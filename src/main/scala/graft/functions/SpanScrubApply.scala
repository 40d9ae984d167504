package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rebuild one document with covered token positions cut — the merge
  * walk behind [[graft.operators.Dedup.spanCoverRebuild]]: given the
  * token array and the SORTED array of positions to remove, emit
  * `struct(text_clean, n_kept)` where text_clean is the surviving
  * tokens joined by single spaces in position order (an empty cover
  * keeps every token — the call site coalesces a join miss to empty).
  * One O(len + |cover|) walk per row replaces the round-14 shape's
  * full token posexplode, (doc, tpos) anti-join exchange, and per-doc
  * collect_list + sort_array (guide §2.3: the only thing that ever
  * shuffles now is the cover mass, never the corpus tokens).
  * Out-of-range cover positions are ignored (the cover is engine-built
  * from in-range window offsets). */
case class SpanScrubApply(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<bigint>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("text_clean", StringType, nullable = false),
    StructField("n_kept", LongType, nullable = false)))
  override def prettyName: String = "span_scrub_apply"

  override protected def nullSafeEval(toks: Any, cov: Any): Any =
    SpanScrubApply.compute(
      toks.asInstanceOf[ArrayData], cov.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, c) =>
      s"graft.functions.SpanScrubApply$$.MODULE$$.compute($t, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanScrubApply =
    copy(left = newLeft, right = newRight)
}

object SpanScrubApply {
  def compute(toks: ArrayData, cov: ArrayData): GenericInternalRow = {
    val n = toks.numElements()
    val m = cov.numElements()
    var kept = 0L
    var bytes = 0
    // first pass: sizes (cover is sorted; walk both)
    var ci = 0
    var i = 0
    while (i < n) {
      while (ci < m && cov.getLong(ci) < i) ci += 1
      val covered = ci < m && cov.getLong(ci) == i
      if (!covered) {
        val t = toks.getUTF8String(i)
        bytes += (if (t == null) 0 else t.numBytes()) + 1
        kept += 1
      }
      i += 1
    }
    val out = new Array[Byte](math.max(bytes - 1, 0))
    var off = 0
    ci = 0; i = 0
    while (i < n) {
      while (ci < m && cov.getLong(ci) < i) ci += 1
      val covered = ci < m && cov.getLong(ci) == i
      if (!covered) {
        if (off > 0) { out(off) = ' '; off += 1 }
        val t = toks.getUTF8String(i)
        if (t != null) {
          t.writeToMemory(out, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
          off += t.numBytes()
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](UTF8String.fromBytes(out), kept))
  }

  def span_scrub_apply(toks: Column, cov: Column): Column =
    ColumnBridge.column(SpanScrubApply(
      ColumnBridge.expression(toks), ColumnBridge.expression(cov)))
}
