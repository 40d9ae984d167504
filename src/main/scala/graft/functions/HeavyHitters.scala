package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra-Gries heavy-hitters sketch over a string-array
  * column (SURVEY.md §2 Q10) — the bounded-memory scale path for
  * corpus top-k terms, next to [[graft.operators.Curation.ngramTopK]]'s
  * exact explode→shuffle formulation.
  *
  * Why this shape at 100 TB: the exact path exchanges one row per
  * distinct term per map partition (vocabulary-sized partial maps); a
  * web-scale shingle vocabulary makes that exchange itself the
  * bottleneck. This aggregate folds each document's term ARRAY into a
  * fixed-`capacity` counter map per partition — no token explode, no
  * vocabulary-sized state — and the only exchange is one ≤`capacity`
  * sketch per partition, merged associatively (Agarwal et al. 2012,
  * "Mergeable Summaries": combine counters, subtract the
  * (capacity+1)-th largest count, drop ≤0).
  *
  * Guarantees (standard MG, independent of partitioning/merge order):
  * with N total terms, every estimate satisfies
  * `true − N/capacity ≤ est ≤ true`, and any term with
  * `true > N/capacity` survives the sketch. When the distinct-term
  * count never exceeds `capacity`, no decrement ever fires and every
  * estimate is EXACT — which makes the sketch gateable against the
  * exact oracle on bounded-vocabulary corpora (the driver corpus:
  * ~930 distinct bigrams vs capacity 4096).
  *
  * eval returns `array<struct<term, est>>` sorted (est desc, term asc)
  * — deterministic given the sketch contents.
  */
case class HeavyHitters(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(capacity > 0, "heavy_hitters: capacity must be positive")

  override def prettyName: String = "heavy_hitters"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType), StructField("est", LongType))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  /** Classic MG update: known term +1; room → insert at 1; full → the
    * implicit new counter and every stored one decrement together
    * (amortized O(1): each decrement round is paid for by the inserts
    * that filled the map). */
  private def add(buf: java.util.HashMap[String, Long], term: String): Unit = {
    val cur = buf.get(term)
    if (cur != 0L || buf.containsKey(term)) buf.put(term, cur + 1L)
    else if (buf.size < capacity) buf.put(term, 1L)
    else {
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  override def update(
      buf: java.util.HashMap[String, Long], input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) add(buf, arr.getUTF8String(i).toString)
        i += 1
      }
    }
    buf
  }

  /** Mergeable-summaries merge: counter-wise sum, then if over
    * capacity subtract the (capacity+1)-th largest count from all and
    * drop the non-positive — at most `capacity` strictly-greater
    * counters can remain, and the subtraction keeps the one-sided
    * error bound additive across merges. */
  override def merge(
      a: java.util.HashMap[String, Long],
      b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a.get(e.getKey)
      a.put(e.getKey, cur + e.getValue)
    }
    if (a.size > capacity) {
      val counts = new Array[Long](a.size)
      var i = 0
      val vit = a.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1) // (capacity+1)-th largest
      val eit = a.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
      }
    }
    a
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    // Tie-break on UTF8String (UTF-8 byte order) — Java String `<` is
    // UTF-16 code-unit order and diverges from Spark's / the oracle's
    // binary collation on supplementary-plane characters.
    val entries = new Array[(UTF8String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); entries(i) = (UTF8String.fromString(e.getKey), e.getValue); i += 1
    }
    scala.util.Sorting.stableSort(
      entries, (x: (UTF8String, Long), y: (UTF8String, Long)) =>
        x._2 > y._2 || (x._2 == y._2 && x._1.compareTo(y._1) < 0))
    new GenericArrayData(entries.map { case (t, c) => InternalRow(t, c) })
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHitters =
    copy(child = newChild)
}
