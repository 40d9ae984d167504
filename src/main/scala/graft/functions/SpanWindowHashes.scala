package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow => GRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** The 128-bit span-hash pairs of every n-token window, fused: for
  * window w, `h1 = xxhash64(concat_ws(" ", toks[w..w+n-1]))` and
  * `h2 = xxhash64(window, 1)` — BIT-IDENTICAL to the
  * `string_ngrams` → `xxhash64` column chain the span family used
  * through round 15 (spec-held parity): the window bytes stream into a
  * reused thread-local buffer (token byte slices joined by 0x20,
  * concat_ws's null-skip mirrored) and hash through the SAME XXH64
  * the xxhash64 expression calls, with seed 42 and the h2 int-chain.
  * No per-window UTF8String materialization, no second hash pass over
  * the window string (guide §1.2 step 2). Windows than can't fill
  * (fewer than n tokens) yield an empty array; callers filter those
  * docs out beforehand, as with string_ngrams. */
case class SpanWindowHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "span_window_hashes: n >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "span_window_hashes"

  override def nullSafeEval(input: Any): Any =
    SpanWindowHashes.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.SpanWindowHashes$$.MODULE$$" +
        s".compute($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): SpanWindowHashes =
    copy(child = newChild)
}

object SpanWindowHashes {
  private val bufTL: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](1 << 12))

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val size = toks.numElements()
    val wins = size - n + 1
    if (wins <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](wins)
    var w = 0
    while (w < wins) {
      var buf = bufTL.get()
      var len = 0
      var sep = false
      var j = 0
      while (j < n) {
        val t = toks.getUTF8String(w + j)
        if (t != null) { // concat_ws skips nulls AND their separator
          val tb = t.numBytes()
          if (len + tb + 1 > buf.length) {
            buf = java.util.Arrays.copyOf(
              buf, math.max(buf.length * 2, len + tb + 1))
            bufTL.set(buf)
          }
          if (sep) { buf(len) = 0x20; len += 1 }
          t.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + len)
          len += tb
          sep = true
        }
        j += 1
      }
      val h1 = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      val h2 = XXH64.hashInt(1, h1)
      out(w) = new GRow(Array[Any](h1, h2))
      w += 1
    }
    new GenericArrayData(out)
  }

  def span_window_hashes(toks: Column, n: Int): Column =
    ColumnBridge.column(SpanWindowHashes(ColumnBridge.expression(toks), n))
}
