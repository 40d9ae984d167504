package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native multi-table random-hyperplane LSH bucketing (SURVEY.md §2
  * K2): all `nTables` sign-pattern bucket ids of an embedding column in
  * ONE pass, against a plane matrix held as a plain `double[][]`
  * (`nTables·nPlanes` rows — row `t·nPlanes + p` is table t's plane p).
  *
  * Why an expression and not column algebra: the composed form — one
  * `functions.aggregate` dot-product fold per (table, plane) — is
  * CodegenFallback, so a 16-table × 4-plane config runs 64 interpreted
  * lambda folds per corpus vector, each allocating a `zip_with`
  * intermediate array. Here the plane matrix rides into each task as
  * one referenced object (`ctx.addReferenceObj`, the same
  * broadcast-of-literals plumbing as [[NearestCentroidIndex]]) and the
  * whole bucketing is a fused primitive double loop inside whole-stage
  * codegen — a map-only stage over the corpus, zero exchange.
  *
  * Bit-parity contract with the HOF reference path
  * (`Similarity.lshBucket`, kept for SimilaritySpec's equality test):
  * bucket(t) = Σ_p (dot(v, plane) > 0 ? 1L << (nPlanes−1−p) : 0) with
  * dots accumulated in double in element order — identical IEEE
  * arithmetic, so buckets are bit-equal. NaN elements poison a dot to
  * NaN, `NaN > 0` is false in both paths; vectors whose length differs
  * from the plane dimension (including empty) land in bucket 0 of
  * every table in both paths — the HOF `zip_with` null-pads the
  * shorter side, nulling the whole dot, and this expression mirrors
  * that by treating any length-mismatched dot as 0.
  */
case class SignBuckets(child: Expression, planes: Array[Array[Double]], nPlanes: Int)
    extends UnaryExpression {

  require(nPlanes > 0 && nPlanes < 63, s"sign_buckets: bad nPlanes $nPlanes")
  require(planes.nonEmpty && planes.length % nPlanes == 0,
    s"sign_buckets: ${planes.length} plane rows not a multiple of nPlanes=$nPlanes")

  private def nTables: Int = planes.length / nPlanes

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_buckets"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val isFloat = elemIsFloat
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        val w = planes(t * nPlanes + p)
        var dot = 0.0
        if (n == w.length) { // mismatch → dot 0 (HOF zip_with null→0 parity)
          var i = 0
          while (i < n) {
            // null elements contribute 0 (QuantVecSum convention; the
            // generic-array path would otherwise NPE)
            if (!arr.isNullAt(i)) {
              dot += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)) * w(i)
            }
            i += 1
          }
        }
        if (dot > 0) bucket += 1L << (nPlanes - 1 - p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("planes", planes, "double[][]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val w = ctx.freshName("w")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      val i = ctx.freshName("i")
      s"""
         |final int $n = $a.numElements();
         |final long[] $out = new long[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  long $bucket = 0L;
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    final double[] $w = $mat[$t * $nPlanes + $p];
         |    double $dot = 0.0;
         |    if ($n == $w.length) {
         |      for (int $i = 0; $i < $n; $i++) {
         |        if (!$a.isNullAt($i)) {
         |          $dot += ((double) $a.$get($i)) * $w[$i];
         |        }
         |      }
         |    }
         |    if ($dot > 0) $bucket += 1L << (${nPlanes} - 1 - $p);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignBuckets =
    copy(child = newChild)
}
