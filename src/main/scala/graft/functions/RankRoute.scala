package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Deterministic rank→partition routing for the suffix ladder's
  * doubling rounds (guide §2.4 — remove shuffles' hidden jobs).
  *
  * Round j re-sorts by (r1, r2) where r1 is the PREVIOUS round's dense
  * rank. `repartitionByRange` would pay a range-sampling job per round
  * to learn boundaries the ladder already knows exactly: the previous
  * `pinRanked` counting job produced the cumulative distinct-rank
  * offsets at every partition edge, and the r1 column of the paired
  * frame has exactly one row per (doc, pos) — the same distribution as
  * the previous level — so routing r1 by those offsets reproduces the
  * previous level's partition sizes (skew-adaptivity inherited from
  * L0's one-time range sample) with ZERO sampling.
  *
  * Spark's public API has no "partition by explicit range boundaries",
  * so the route returns a HASH-PREIMAGE int: for target partition p,
  * `preimages(p)` is a precomputed int whose Murmur3 hash (seed 42 —
  * what HashPartitioning applies to a single int column) lands on
  * partition p under pmod(·, P). `repartition(P, route(r1))` therefore
  * places bucket p exactly on partition index p, preserving the
  * partition-index-equals-rank-order invariant pinRanked's prefix-sum
  * numbering needs. Rank VALUES are routing-independent (dense ranks
  * in global key order), so results are bit-identical — the oracle
  * hash pins it.
  *
  * `offsets(p)` = cumulative distinct ranks through partition p
  * (offsets(0) = 0); rank r routes to the unique p with
  * offsets(p) < r <= offsets(p+1). Empty previous partitions yield
  * repeated offsets; the lower-bound search skips them. */
case class RankRoute(
    child: Expression, offsets: Array[Long], preimages: Array[Int])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint, got ${t.catalogString}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "rank_route"

  /** First p with offsets(p+1) >= r, i.e. the partition whose rank
    * range (offsets(p), offsets(p+1)] contains r; ranks past the last
    * edge clamp into the final partition (cannot happen for ladder
    * input — ranks are <= the previous distinct count — but a clamp
    * beats an array bounds crash on a caller bug). */
  def route(r: Long): Int = {
    var lo = 1
    var hi = offsets.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (offsets(mid) >= r) hi = mid else lo = mid + 1
    }
    preimages(lo - 1)
  }

  override protected def nullSafeEval(input: Any): Any =
    route(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rankRoute", this, classOf[RankRoute].getName)
    defineCodeGen(ctx, ev, c => s"$ref.route($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): RankRoute =
    copy(child = newChild)
}

object RankRoute {
  /** For each target partition p in 0..n-1, the smallest non-negative
    * int whose single-column Murmur3 hash (seed 42 — HashPartitioning's
    * partitionIdExpression over one int) pmods to p. Deterministic,
    * O(n ln n) expected probes, computed once per ladder round on the
    * driver. */
  def preimages(n: Int): Array[Int] = {
    require(n >= 1, s"rank_route: need >= 1 partition, got $n")
    val out = new Array[Int](n)
    val found = new Array[Boolean](n)
    var remaining = n
    var m = 0
    while (remaining > 0) {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(m, 42)
      val p = ((h % n) + n) % n
      if (!found(p)) { found(p) = true; out(p) = m; remaining -= 1 }
      m += 1
    }
    out
  }

  def rank_route(r: Column, offsets: Array[Long], pre: Array[Int]): Column =
    ColumnBridge.column(RankRoute(ColumnBridge.expression(r), offsets, pre))
}
