package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encode (SURVEY.md §2 K4): an embedding column
  * → its `m` subspace code indices against a codebook held as
  * `double[m][k][dsub]` (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search" — the standard compressed representation
  * for web-scale embedding stores: 64 floats → m bytes).
  *
  * Per subspace j, the code is the argmin squared-L2 centroid of the
  * subvector `v[j·dsub … (j+1)·dsub)`; ties break to the LOWEST
  * centroid index (strict `<` update over an ascending scan), and the
  * distance accumulates `(x−c)²` terms in element order — the IEEE
  * contract the DuckDB gate oracle replays. Vectors shorter than
  * `m·dsub` treat missing elements as 0 (subvector padding); NaN
  * poisons every distance of its subspace → code 0 there.
  *
  * Why an expression: corpus-side encoding must be a MAP-ONLY stage
  * (the same argument as [[NearestCentroidIndex]]) — the codebook
  * rides into each task as one referenced object (~m·k·dsub doubles,
  * a few MB at any sane config) and the whole encode is a fused
  * primitive loop inside whole-stage codegen, zero exchange.
  */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(codebook.nonEmpty && codebook.forall(_.nonEmpty),
    "pq_encode: empty codebook")

  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      PqEncode.encode(v.asInstanceOf[ArrayData], codebook, elemIsFloat))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("codebook", codebook, "double[][][]")
    val isFloat = if (elemIsFloat) "true" else "false"
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.PqEncode.encode($a, $cb, $isFloat));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** Shared by interpreted eval and generated code. */
  def encode(arr: ArrayData, cb: Array[Array[Array[Double]]], isFloat: Boolean): Array[Int] = {
    val n = arr.numElements()
    val m = cb.length
    val out = new Array[Int](m)
    var j = 0
    var base = 0
    while (j < m) {
      val centroids = cb(j)
      val dsub = centroids(0).length
      var best = 0
      var bestDist = Double.PositiveInfinity
      var c = 0
      while (c < centroids.length) {
        val cent = centroids(c)
        var dist = 0.0
        var i = 0
        while (i < dsub) {
          val x =
            if (base + i >= n || arr.isNullAt(base + i)) 0.0
            else if (isFloat) arr.getFloat(base + i).toDouble
            else arr.getDouble(base + i)
          val d = x - cent(i)
          dist += d * d
          i += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      out(j) = best
      base += dsub
      j += 1
    }
    out
  }
}

/** Asymmetric-distance (ADC) scoring for PQ codes: given a row's code
  * array and a per-query distance table `dtab[m][k]` (squared-L2 of
  * the query's subvector to every centroid, precomputed once per
  * query), the approximate squared distance is `Σ_j dtab[j][code_j]`
  * — m array lookups per candidate, the whole point of searching in
  * the compressed domain. Codegen'd so the scoring join stays one
  * fused stage; out-of-range codes fail loudly (a corrupt code must
  * not silently score 0). */
case class PqAdcScore(codes: Expression, dtab: Expression)
    extends BinaryExpression {

  override def left: Expression = codes
  override def right: Expression = dtab

  override def prettyName: String = "pq_adc_score"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, dtab.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<array<double>>), got $other")
    }

  override def nullSafeEval(cv: Any, tv: Any): Any =
    PqAdcScore.score(cv.asInstanceOf[ArrayData], tv.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) =>
      s"${ev.value} = graft.functions.PqAdcScore.score($c, $t);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    PqAdcScore(newLeft, newRight)
}

object PqAdcScore {
  def score(codes: ArrayData, dtab: ArrayData): Double = {
    val m = math.min(codes.numElements(), dtab.numElements())
    var s = 0.0
    var j = 0
    while (j < m) {
      // loud on null slots too: an unsafe-array null reads as a raw 0
      // and would silently score centroid 0, which the contract bans
      if (codes.isNullAt(j) || dtab.isNullAt(j)) {
        throw new IllegalArgumentException(
          s"pq_adc_score: null code or distance-table row at subspace $j")
      }
      val row = dtab.getArray(j)
      val c = codes.getInt(j)
      if (c < 0 || c >= row.numElements()) {
        throw new IllegalArgumentException(
          s"pq_adc_score: code $c out of range for ${row.numElements()} centroids")
      }
      if (row.isNullAt(c)) {
        throw new IllegalArgumentException(
          s"pq_adc_score: null distance-table entry at subspace $j, code $c")
      }
      s += row.getDouble(c)
      j += 1
    }
    s
  }
}
