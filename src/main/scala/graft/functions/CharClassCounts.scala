package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ASCII alphanumeric / digit counts of a string in ONE byte pass
  * (SURVEY.md §2 L1). Replaces the
  * `length(regexp_replace(text, "[^a-zA-Z0-9]", ""))` /
  * `length(regexp_replace(text, "[^0-9]", ""))` pair — two full
  * java-regex scans PLUS two replacement-string materializations per
  * document just to read off two counts. Byte iteration is exact on
  * any UTF-8 input: continuation bytes are >= 0x80 and can never
  * match an ASCII class, and `length()` counted matched ASCII chars
  * 1:1 with their bytes. */
case class AsciiClassCounts(child: Expression) extends UnaryExpression {

  override def prettyName: String = "ascii_class_counts"

  override def dataType: DataType = AsciiClassCounts.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    AsciiClassCounts.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.AsciiClassCounts.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): AsciiClassCounts =
    copy(child = newChild)
}

object AsciiClassCounts {

  val schema: StructType = StructType(Seq(
    StructField("n_alnum", LongType, nullable = false),
    StructField("n_digits", LongType, nullable = false)))

  def compute(u: UTF8String): InternalRow = {
    val n = u.numBytes()
    var alnum = 0L
    var digits = 0L
    var i = 0
    while (i < n) {
      val b = u.getByte(i)
      if (b >= '0' && b <= '9') { alnum += 1; digits += 1 }
      else if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) alnum += 1
      i += 1
    }
    new GenericInternalRow(Array[Any](alnum, digits))
  }
}
