package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native coarse-quantizer assignment for IVF ANN (SURVEY.md §2 K3):
  * index of the nearest centroid (max cosine) for an embedding column,
  * against a small codebook held as a plain `double[][]`.
  *
  * Design (and why not a join): the corpus side of IVF must assign a
  * cell to every vector WITHOUT exchanging the corpus — a crossJoin
  * against a centroid dim expands rows |corpus|×|centroids| before the
  * per-row argmin collapses them, and a `functions.aggregate` fold over
  * a broadcast array is CodegenFallback (interpreted lambda per
  * row×centroid — the round-4 defect). This expression is the codegen
  * path: the codebook rides into each task as one referenced object
  * (`ctx.addReferenceObj`, standard broadcast-of-literals plumbing; at
  * the 4096×64-double cap that is ~2 MB, far below executor memory),
  * and the per-row cost is one fused primitive double loop inside
  * whole-stage codegen. Assignment is a map-only stage: zero exchange.
  *
  * Centroid rows must be L2-normalized by the caller: for normalized c,
  * `argmax_j dot(v, c_j) = argmax_j cos(v, c_j)` for every v (the
  * 1/|v| factor is constant across j), so the fold never divides.
  *
  * Determinism contract (aligned with brute-force K1 so IVF is a
  * strict recall-refinement of it, never a silent semantic fork):
  *  - ties → lowest centroid index (strict `>` update, ascending scan);
  *  - zero vectors (all dots 0 = initial tie) and NaN-poisoned vectors
  *    (every comparison false) both assign cell 0 deterministically —
  *    they stay IN the index and surface with NaN cosine exactly as
  *    they do in brute force, instead of silently dropping (the
  *    round-4 null-cell defect).
  */
case class NearestCentroidIndex(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  require(centroids.nonEmpty, "nearest_centroid: empty codebook")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

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
    var best = 0
    var bestScore = Double.NegativeInfinity
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      val m = math.min(n, c.length)
      var dot = 0.0
      var i = 0
      while (i < m) {
        // null elements contribute 0 (QuantVecSum convention; the
        // generic-array path would otherwise NPE)
        if (!arr.isNullAt(i)) {
          dot += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)) * c(i)
        }
        i += 1
      }
      if (dot > bestScore) { bestScore = dot; best = j }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val m = ctx.freshName("m")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = $a.numElements();
         |int $best = 0;
         |double $bestScore = Double.NEGATIVE_INFINITY;
         |for (int $j = 0; $j < $mat.length; $j++) {
         |  final double[] $c = $mat[$j];
         |  final int $m = java.lang.Math.min($n, $c.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      $dot += ((double) $a.$get($i)) * $c[$i];
         |    }
         |  }
         |  if ($dot > $bestScore) { $bestScore = $dot; $best = $j; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidIndex =
    copy(child = newChild)
}
