package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Elementwise min/max over a vector column as ONE mergeable
  * aggregate — the stats pass of scalar (int8) embedding quantization.
  * Buffer is a pair of `double[dim]`; update folds each row's
  * coordinates in, merge is elementwise — exact (float→double widening
  * and double comparisons are lossless), so the result is independent
  * of partitioning and merge order, and the exchange is two dim-length
  * arrays per partition instead of a dim×N explode shuffle. Null
  * vectors are skipped; null elements leave their dim untouched; a
  * longer vector grows the buffer (±∞ fill on the new tail).
  */
case class VecMinMax(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[(Array[Double], Array[Double])]
  with UnaryLike[Expression] {

  override def prettyName: String = "vec_min_max"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("mins", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("maxs", ArrayType(DoubleType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    QuantKMeans.checkVecType(prettyName, child.dataType)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): (Array[Double], Array[Double]) =
    (Array.emptyDoubleArray, Array.emptyDoubleArray)

  private def grown(buf: Array[Double], n: Int, fill: Double): Array[Double] = {
    if (buf.length >= n) return buf
    val out = java.util.Arrays.copyOf(buf, n)
    java.util.Arrays.fill(out, buf.length, n, fill)
    out
  }

  override def update(
      buf: (Array[Double], Array[Double]),
      input: InternalRow): (Array[Double], Array[Double]) = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val isFloat = elemIsFloat
    val mins = grown(buf._1, n, Double.PositiveInfinity)
    val maxs = grown(buf._2, n, Double.NegativeInfinity)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        if (x < mins(i)) mins(i) = x
        if (x > maxs(i)) maxs(i) = x
      }
      i += 1
    }
    (mins, maxs)
  }

  override def merge(
      a: (Array[Double], Array[Double]),
      b: (Array[Double], Array[Double])): (Array[Double], Array[Double]) = {
    val mins = grown(a._1, b._1.length, Double.PositiveInfinity)
    val maxs = grown(a._2, b._2.length, Double.NegativeInfinity)
    var i = 0
    while (i < b._1.length) {
      if (b._1(i) < mins(i)) mins(i) = b._1(i)
      if (b._2(i) > maxs(i)) maxs(i) = b._2(i)
      i += 1
    }
    (mins, maxs)
  }

  override def eval(buf: (Array[Double], Array[Double])): Any =
    new GenericInternalRow(Array[Any](
      new GenericArrayData(buf._1), new GenericArrayData(buf._2)))

  override def serialize(buf: (Array[Double], Array[Double])): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf._1.length)
    var i = 0
    while (i < buf._1.length) { out.writeDouble(buf._1(i)); i += 1 }
    i = 0
    while (i < buf._2.length) { out.writeDouble(buf._2(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): (Array[Double], Array[Double]) = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val mins = new Array[Double](n)
    val maxs = new Array[Double](n)
    var i = 0
    while (i < n) { mins(i) = in.readDouble(); i += 1 }
    i = 0
    while (i < n) { maxs(i) = in.readDouble(); i += 1 }
    (mins, maxs)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMinMax =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMinMax =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecMinMax =
    copy(child = newChild)
}
