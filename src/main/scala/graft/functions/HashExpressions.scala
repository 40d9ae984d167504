package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native sketch expressions (SURVEY.md §4): MinHash signatures and
  * SimHash fingerprints as fused primitive loops with `doGenCode`.
  *
  * The higher-order-function formulations in [[graft.operators.Dedup]]
  * are semantically identical but evaluate one interpreted lambda per
  * (element × hash-id) — ~6k boxed calls per document, which measured
  * as the dominant cost of J2/J3 at sf0.1. These expressions hash each
  * element's bytes ONCE (XXH64, seed 42 — exactly Spark's `xxhash64`)
  * and derive the per-function family members by chaining cheap
  * integer hashes, all inside whole-stage codegen.
  *
  * Hash-chain contract (asserted bit-equal to the HOF forms in
  * `HashExpressionsSpec`): element hash `he = hashUTF8String(e, 42)`;
  * member h = `hashInt(h, hashLong(he, 42))` — the same chain Spark's
  * `xxhash64(he, h)` evaluates.
  */
abstract class TokenSketchExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }
}

/** MinHash signature of a shingle array (`array<string>`, or
  * `array<long>` of pre-hashed shingles from [[ShingleHashes]]):
  * `numHashes` minima. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType | LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> or array<long>, got ${t.catalogString}")
  }

  private def stringElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == StringType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val strs = stringElems
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      // skip null shingles (filter parity — the generic-array path
      // would otherwise NPE inside the hash)
      if (!arr.isNullAt(i)) {
        val eh =
          if (strs) XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
          else XXH64.hashLong(arr.getLong(i), 42L)
        val base = XXH64.hashLong(eh, 42L)
        var h = 0
        while (h < numHashes) {
          val v = XXH64.hashInt(h, base)
          if (v < mins(h)) mins(h) = v
          h += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val base = ctx.freshName("base")
      val v = ctx.freshName("v")
      val n = ctx.freshName("n")
      val elemHash =
        if (stringElems) s"$xxh.hashUTF8String($arr.getUTF8String($i), 42L)"
        else s"$xxh.hashLong($arr.getLong($i), 42L)"
      s"""
         |final int $n = $arr.numElements();
         |final long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) continue;
         |  final long $base = $xxh.hashLong($elemHash, 42L);
         |  for (int $h = 0; $h < $numHashes; $h++) {
         |    final long $v = $xxh.hashInt($h, $base);
         |    if ($v < $mins[$h]) $mins[$h] = $v;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array: per-bit ±1 parity votes, folded
  * MSB-first ((acc<<1)|bit over ascending bit ids). */
case class SimHash64(child: Expression) extends TokenSketchExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      // skip null tokens (filter parity; vote aggregation is
      // order-insensitive so skipping == filtering first)
      if (!arr.isNullAt(i)) {
        val base = XXH64.hashLong(XXH64.hashUTF8String(arr.getUTF8String(i), 42L), 42L)
        var b = 0
        while (b < 64) {
          votes(b) += (XXH64.hashInt(b, base) & 1L) * 2L - 1L
          b += 1
        }
      }
      i += 1
    }
    var acc = 0L
    var b = 0
    while (b < 64) { acc = (acc << 1) | (if (votes(b) > 0) 1L else 0L); b += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val base = ctx.freshName("base")
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      s"""
         |final int $n = $arr.numElements();
         |final long[] $votes = new long[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) continue;
         |  final long $base = $xxh.hashLong($xxh.hashUTF8String($arr.getUTF8String($i), 42L), 42L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $votes[$b] += ($xxh.hashInt($b, $base) & 1L) * 2L - 1L;
         |  }
         |}
         |long $acc = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  $acc = ($acc << 1) | ($votes[$b] > 0 ? 1L : 0L);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Shared md5-simhash kernel (ThreadLocal digest — MessageDigest is
  * not thread-safe and instantiation per token would dominate).
  * Bit b of the result = sign of the per-token ±1 votes taken from bit
  * b of the md5 digest's last 8 bytes little-endian — exactly DuckDB's
  * `md5_number_lower`, which is the whole point: any engine with an
  * md5 primitive can replay the fingerprint bit-for-bit (the J3
  * oracle does). Called from both interpreted eval and generated code
  * (Scala object = static forwarder on the class). */
object Md5SimHashUtil {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // skip null tokens (filter parity; votes are order-insensitive)
      if (!arr.isNullAt(i)) {
        val m = md.get()
        m.reset()
        val digest = m.digest(arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < 8) {
          val dj = digest(8 + j)
          var k = 0
          while (k < 8) {
            votes(8 * j + k) += ((dj >> k) & 1) * 2 - 1
            k += 1
          }
          j += 1
        }
      }
      i += 1
    }
    var acc = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) acc |= 1L << b; b += 1 }
    acc
  }
}

/** Engine-portable 64-bit SimHash over md5 token hashes (see
  * [[Md5SimHashUtil]]): packed fingerprint with bit b = vote sign of
  * md5_number_lower bit b. The xxhash [[SimHash64]] stays the
  * production default (~3× cheaper); this variant exists so a
  * cross-engine oracle can recompute fingerprints exactly. */
case class SimHashMd5(child: Expression) extends TokenSketchExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_md5"

  override def nullSafeEval(input: Any): Any =
    Md5SimHashUtil.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.Md5SimHashUtil.simhash64($arr);")

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(child = newChild)
}

/** Distinct hashed word n-gram shingles of a token array, as one fused
  * loop: token bytes hash once, shingle ids chain the n member token
  * hashes (`chain_j = hashLong(tokHash_j, chain_{j-1})`, seed 42), the
  * result is sorted-distinct. Replaces build-string → hash-string →
  * array_distinct (three interpreted passes with per-shingle string
  * allocation) in the J2/J4 front end; shingle identity differs from
  * the string form but the SETS correspond 1:1 (collision p≈n²/2⁶⁴),
  * which is all Jaccard/MinHash consume. */
case class ShingleHashes(child: Expression, n: Int) extends TokenSketchExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    // compact null tokens away first (filter-adjacency parity, the
    // RepetitionStats convention), then window over the kept tokens
    val tokHash = new Array[Long](len)
    var m = 0
    var i = 0
    while (i < len) {
      if (!arr.isNullAt(i)) {
        tokHash(m) = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        m += 1
      }
      i += 1
    }
    if (m < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](m - n + 1)
    i = 0
    while (i <= m - n) {
      var chain = 42L
      var j = 0
      while (j < n) { chain = XXH64.hashLong(tokHash(i + j), chain); j += 1 }
      out(i) = chain
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    i = 0
    while (i < out.length) {
      if (i == 0 || out(i) != out(i - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val uad = "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData"
    nullSafeCodeGen(ctx, ev, arr => {
      val len = ctx.freshName("len")
      val th = ctx.freshName("tokHash")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val w = ctx.freshName("w")
      val chain = ctx.freshName("chain")
      val m = ctx.freshName("kept")
      s"""
         |final int $len = $arr.numElements();
         |final long[] $th = new long[$len];
         |int $m = 0;
         |for (int $i = 0; $i < $len; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    $th[$m++] = $xxh.hashUTF8String($arr.getUTF8String($i), 42L);
         |  }
         |}
         |if ($m < $n) {
         |  ${ev.value} = $uad.fromPrimitiveArray(new long[0]);
         |} else {
         |  long[] $out = new long[$m - $n + 1];
         |  for (int $i = 0; $i <= $m - $n; $i++) {
         |    long $chain = 42L;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $chain = $xxh.hashLong($th[$i + $j], $chain);
         |    }
         |    $out[$i] = $chain;
         |  }
         |  java.util.Arrays.sort($out);
         |  int $w = 0;
         |  for (int $i = 0; $i < $out.length; $i++) {
         |    if ($i == 0 || $out[$i] != $out[$i - 1]) { $out[$w] = $out[$i]; $w++; }
         |  }
         |  ${ev.value} = $uad.fromPrimitiveArray(java.util.Arrays.copyOf($out, $w));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Max element multiplicity of a string array (the mode's count): one
  * fused sort + run scan. Replaces the interpreted struct-state HOF
  * fold in repetition-signal scoring (per-element InternalRow
  * allocation, no codegen) with a primitive loop inside whole-stage
  * codegen. Null elements are ignored. */
case class MaxMultiplicity(child: Expression) extends TokenSketchExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "max_multiplicity"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val a = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { a(m) = arr.getUTF8String(i); m += 1 }
      i += 1
    }
    java.util.Arrays.sort(a, 0, m,
      java.util.Comparator.naturalOrder[org.apache.spark.unsafe.types.UTF8String]())
    var best = 0
    var run = 0
    i = 0
    while (i < m) {
      run = if (i > 0 && a(i) == a(i - 1)) run + 1 else 1
      if (run > best) best = run
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val utf8 = "org.apache.spark.unsafe.types.UTF8String"
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val a = ctx.freshName("a")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val run = ctx.freshName("run")
      s"""
         |final int $n = $arr.numElements();
         |final $utf8[] $a = new $utf8[$n];
         |int $m = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) { $a[$m] = $arr.getUTF8String($i); $m++; }
         |}
         |java.util.Arrays.sort($a, 0, $m);
         |int $best = 0; int $run = 0;
         |for (int $i = 0; $i < $m; $i++) {
         |  $run = ($i > 0 && $a[$i].equals($a[$i - 1])) ? $run + 1 : 1;
         |  if ($run > $best) $best = $run;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MaxMultiplicity =
    copy(child = newChild)
}

/** Integer margin of a hashed-feature bucket array under a FITTED
  * weight vector: Σ_{b ∈ barr} weights[b] — the serving kernel of the
  * learned classifiers (Q18 quality, L18 language ID). The
  * higher-order `aggregate`+`element_at` formulation is semantically
  * identical but evaluates one interpreted lambda per array element —
  * on the 100 TB serve path that is the dominant cost (HOFs run off
  * whole-stage codegen); this is one fused primitive loop inside
  * codegen, bit-identical by integer-addition associativity
  * (HashExpressionsSpec asserts parity). Weights ride as a referenced
  * object, not a literal expression tree — a 1025-long literal per
  * fold bloats analysis on every training epoch's fresh plan. Out-of-
  * range or null buckets throw loudly: the inputs are engine-built
  * (md5 % buckets + intercept), so either means corruption. */
case class BucketMargin(child: Expression, weights: Array[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "bucket_margin"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var acc = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        "bucket_margin: null feature bucket — corrupt feature frame")
      val b = arr.getInt(i)
      if (b < 0 || b >= weights.length) throw new IllegalArgumentException(
        s"bucket_margin: bucket $b outside the ${weights.length}-weight model")
      acc += weights(b)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("weights", weights, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $arr.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "bucket_margin: null feature bucket — corrupt feature frame");
         |  }
         |  final int $b = $arr.getInt($i);
         |  if ($b < 0 || $b >= $w.length) {
         |    throw new IllegalArgumentException(
         |      "bucket_margin: bucket " + $b + " outside the " + $w.length + "-weight model");
         |  }
         |  $acc += $w[$b];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BucketMargin =
    copy(child = newChild)
}

object HashFunctions {
  /** Native classifier margin: Σ weights[b] over an int bucket array. */
  def bucket_margin(barr: Column, weights: Array[Long]): Column =
    ColumnBridge.column(BucketMargin(ColumnBridge.expression(barr), weights))

  /** Native MinHash signature over a shingle array column. */
  def minhash_sig(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(shingles), numHashes))

  /** Native 64-bit SimHash over a token array column. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  /** Native md5-based (engine-portable) 64-bit SimHash. */
  def simhash_md5(tokens: Column): Column =
    ColumnBridge.column(SimHashMd5(ColumnBridge.expression(tokens)))

  /** Native distinct hashed n-gram shingles over a token array column. */
  def shingle_hashes(tokens: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), n))

  /** Native max element multiplicity over a string array column. */
  def max_multiplicity(arr: Column): Column =
    ColumnBridge.column(MaxMultiplicity(ColumnBridge.expression(arr)))

  /** Mergeable Misra-Gries heavy-hitters aggregate over a string-array
    * column (see [[HeavyHitters]]). */
  def heavy_hitters(arr: Column, capacity: Int): Column =
    ColumnBridge.column(
      HeavyHitters(ColumnBridge.expression(arr), capacity).toAggregateExpression())

  /** All Gopher-repetition integer counts of a token array in one
    * compiled pass (see [[RepetitionStats]]). */
  def repetition_stats(arr: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(arr)))

  /** Native space-joined word n-grams over a token array (see
    * [[StringNgrams]]). */
  def string_ngrams(arr: Column, n: Int): Column =
    ColumnBridge.column(StringNgrams(ColumnBridge.expression(arr), n))

  /** Spark's built-in mergeable Bloom-filter aggregate (the engine's
    * own runtime-filter machinery, codegen-free build but distributed
    * and bounded): aggregates LONG hashes into a serialized filter of
    * exactly `numBits` bits. The blob size is fixed by construction —
    * `numBits/8` bytes + header — independent of input cardinality. */
  def bloom_filter_agg(hashes: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        ColumnBridge.expression(hashes),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits)
      ).toAggregateExpression())

  /** Membership probe against a serialized Bloom filter literal —
    * Spark's codegen'd `BloomFilterMightContain` (no false negatives;
    * false-positive rate set by the build's bits/items ratio). */
  def might_contain(bloomBits: Column, hash: Column): Column =
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ColumnBridge.expression(bloomBits), ColumnBridge.expression(hash)))
}
