package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fixed-point k-means primitives (SURVEY.md §2 K6) — the arithmetic
  * backbone of [[graft.operators.Clustering]].
  *
  * Why fixed-point: Lloyd's centroid update is a cross-row float mean,
  * and cross-row float summation is fold-order-sensitive — a
  * distributed partial-agg sum and a single-threaded oracle would
  * round differently, so the gate could never hash-compare. Quantizing
  * every coordinate ONCE to an integer grid (`q = floor(x·scale+0.5)`,
  * one IEEE multiply-by-power-of-two + add + floor, bit-identical in
  * any engine) moves all cross-row arithmetic into the integer domain:
  * sums are exact and order-free, distances are exact longs, and the
  * whole iteration replays verbatim in SQL. Quantized/integer k-means
  * is standard practice at billion-vector scale (PQ codebooks are the
  * same idea per-subspace); at scale 2^20 the grid error is ~1e-6 per
  * coordinate — far below any clustering-relevant signal.
  *
  * Overflow bounds (64-dim, |x| ≤ ~2 ⇒ |q| ≤ ~2^21): per-pair squared
  * diff ≤ 2^44, per-vector distance ≤ 2^50, exact in long; per-cell
  * coordinate sums stay exact in long up to ~2^42 rows per cell.
  */
object QuantKMeans {
  /** The shared quantization formula — ONE definition used by the
    * expressions below, the driver-side codebook math, and (verbatim
    * as SQL) the DuckDB oracle. */
  def quantize(x: Double, scale: Double): Long =
    math.floor(x * scale + 0.5).toLong

  /** Interpreted (bestCell, bestDist) sweep shared by both eval paths:
    * fused quantize + integer-L2 argmin over the codebook. Dimensions
    * beyond the shared prefix `min(n, c.length)` are ignored (the
    * [[NearestCentroidIndex]] length contract); null elements
    * quantize to 0 (matching [[QuantVecSum]]'s null-skip — quantize(0)
    * is also 0, so the two paths agree); ties → lowest ordinal
    * (strict `<` update, ascending scan). */
  def sweep(v: Any, isFloat: Boolean, centroids: Array[Array[Long]], scale: Double): (Int, Long) = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        q(i) = quantize(x, scale)
      }
      i += 1
    }
    var best = 0
    var bestDist = Long.MaxValue
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      val m = math.min(n, c.length)
      var d = 0L
      var k = 0
      while (k < m) {
        val diff = q(k) - c(k)
        d += diff * diff
        k += 1
      }
      if (d < bestDist) { bestDist = d; best = j }
      j += 1
    }
    (best, bestDist)
  }

  /** Generated code for the same sweep; `emit(cellVar, distVar)`
    * writes the result. Driver-side helper only — the generated Java
    * carries no reference back to this object. */
  def genSweep(
      ctx: CodegenContext, a: String, isFloat: Boolean,
      centroids: Array[Array[Long]], scale: Double)(
      emit: (String, String) => String): String = {
    val mat = ctx.addReferenceObj("centroids", centroids, "long[][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    val n = ctx.freshName("n")
    val q = ctx.freshName("q")
    val best = ctx.freshName("best")
    val bestDist = ctx.freshName("bestDist")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val k = ctx.freshName("k")
    val c = ctx.freshName("c")
    val m = ctx.freshName("m")
    val d = ctx.freshName("d")
    val diff = ctx.freshName("diff")
    s"""
       |final int $n = $a.numElements();
       |final long[] $q = new long[$n];
       |for (int $i = 0; $i < $n; $i++) {
       |  if (!$a.isNullAt($i)) {
       |    $q[$i] = (long) java.lang.Math.floor(((double) $a.$get($i)) * $scale + 0.5);
       |  }
       |}
       |int $best = 0;
       |long $bestDist = Long.MAX_VALUE;
       |for (int $j = 0; $j < $mat.length; $j++) {
       |  final long[] $c = $mat[$j];
       |  final int $m = java.lang.Math.min($n, $c.length);
       |  long $d = 0L;
       |  for (int $k = 0; $k < $m; $k++) {
       |    final long $diff = $q[$k] - $c[$k];
       |    $d += $diff * $diff;
       |  }
       |  if ($d < $bestDist) { $bestDist = $d; $best = $j; }
       |}
       |${emit(best, bestDist)}
     """.stripMargin
  }

  private[functions] def checkVecType(prettyName: String, dt: DataType): TypeCheckResult =
    dt match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
    }
}

/** Cell ordinal of the nearest centroid in the quantized-integer L2
  * metric — the k-means assignment step as one codegen'd map-only
  * expression against a driver-side `long[][]` codebook (same
  * broadcast-of-literals plumbing as [[NearestCentroidIndex]]; zero
  * exchange). */
case class QuantNearestCell(
    child: Expression, centroids: Array[Array[Long]], scale: Double)
    extends UnaryExpression {

  require(centroids.nonEmpty, "quant_nearest_cell: empty codebook")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "quant_nearest_cell"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    QuantKMeans.checkVecType(prettyName, child.dataType)

  override def nullSafeEval(v: Any): Any =
    QuantKMeans.sweep(v, elemIsFloat, centroids, scale)._1

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      QuantKMeans.genSweep(ctx, a, elemIsFloat, centroids, scale)(
        (cell, _) => s"${ev.value} = $cell;"))

  override protected def withNewChildInternal(newChild: Expression): QuantNearestCell =
    copy(child = newChild)
}

/** Squared integer L2 distance to the nearest centroid — the per-point
  * inertia contribution, exact in long. */
case class QuantNearestDist(
    child: Expression, centroids: Array[Array[Long]], scale: Double)
    extends UnaryExpression {

  require(centroids.nonEmpty, "quant_nearest_dist: empty codebook")

  override def dataType: DataType = LongType
  override def prettyName: String = "quant_nearest_dist"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    QuantKMeans.checkVecType(prettyName, child.dataType)

  override def nullSafeEval(v: Any): Any =
    QuantKMeans.sweep(v, elemIsFloat, centroids, scale)._2

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      QuantKMeans.genSweep(ctx, a, elemIsFloat, centroids, scale)(
        (_, dist) => s"${ev.value} = $dist;"))

  override protected def withNewChildInternal(newChild: Expression): QuantNearestDist =
    copy(child = newChild)
}

/** Elementwise quantized coordinate sum over a vector column — the
  * k-means centroid-update numerator as ONE mergeable aggregate:
  * buffer is a `long[dim]`, update quantizes and adds (exact, so the
  * result is independent of partitioning and merge order), merge is an
  * elementwise add, exchange is one dim-length array per (cell ×
  * partition). Null vectors are skipped; a longer vector grows the
  * buffer (shorter ones contribute to their prefix — the same length
  * contract as the assignment sweep). */
case class QuantVecSum(
    child: Expression,
    scale: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  override def prettyName: String = "quant_vec_sum"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    QuantKMeans.checkVecType(prettyName, child.dataType)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def grown(buf: Array[Long], n: Int): Array[Long] =
    if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val isFloat = elemIsFloat
    val out = grown(buf, n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        out(i) += QuantKMeans.quantize(x, scale)
      }
      i += 1
    }
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = grown(a, b.length)
    var i = 0
    while (i < b.length) { out(i) += b(i); i += 1 }
    out
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantVecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantVecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantVecSum =
    copy(child = newChild)
}
