package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, MakeDecimal, UnscaledValue}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine-deterministic numeric aggregation helpers.
  *
  * Floating-point `sum`/`avg`/`stddev` are order-dependent: a Spark
  * shuffle and a single-threaded oracle (DuckDB) add partials in
  * different orders and disagree in the last ulp — which breaks
  * hash-based result comparison AND makes distributed runs
  * non-reproducible run-to-run. So every aggregate here goes through an
  * exact decimal sum first, and only then converts to double:
  * the decimal sum is associative/commutative (safe under any
  * partitioning), and decimal→double + one IEEE division/sqrt is
  * bit-deterministic on both engines.
  *
  * This mirrors the reference's intent (pandas `sum`/`mean`/`std` on
  * modest per-entity frames, niamoto `transformers/aggregation/
  * statistical_summary.py:152`) while being safe at 100 TB.
  */
object Num {
  /** Scale for exact intermediate decimals — enough for test-data money
    * columns (2dp); (18,4)×(18,4) products widen to (37,8) WITHOUT
    * precision loss in both Spark and DuckDB, and their sums stay exact
    * far past 100 TB of rows (Spark bumps sum precision to 38). */
  private val Exact = DecimalType(18, 4)

  /** Exact sum, surfaced as double — numerically identical to
    * `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)` but ~2× faster:
    * the sum runs over the decimal's UNSCALED long (codegen'd long
    * buffer) instead of a precision-28 Decimal buffer (BigDecimal-backed
    * adds). Same trick as Spark's own `DecimalAggregates` rule, which
    * stops at precision 8; (18,4) keeps the unscaled sum exact while
    * |Σx| < 9.2e14, and ANSI mode (Spark 4 default) turns the
    * beyond-that overflow into a loud error, not a wrong answer —
    * callers summing past that switch to [[dsumWide]]. */
  def dsum(c: Column): Column = {
    val unscaled = ColumnBridge.column(
      UnscaledValue(Cast(ColumnBridge.expression(c), Exact)))
    ColumnBridge.column(
      Cast(
        MakeDecimal(ColumnBridge.expression(sum(unscaled)),
          Exact.precision + 10, Exact.scale, nullOnOverflow = false),
        DoubleType))
  }

  /** The full-width decimal-buffer sum (exact to ±1e24): the fallback
    * when a single key's sum can exceed [[dsum]]'s long-unscaled range. */
  def dsumWide(c: Column): Column = sum(c.cast(Exact)).cast(DoubleType)

  /** Deterministic mean = exact-decimal sum / count (one IEEE division). */
  def dmean(c: Column): Column =
    dsum(c) / count(c).cast(DoubleType)

  /** Deterministic sample std-dev via the sum-of-squares identity on
    * exact decimal sums: sqrt((Σx² − (Σx)²/n) / (n−1)). */
  def dstd(c: Column): Column = {
    val n = count(c).cast(DoubleType)
    val s = dsum(c)
    // product of (18,4)s is (37,8) — summed as-is (exact); re-casting the
    // product to (18,4) would round to 4dp and diverge from the oracle
    val s2 = sum(c.cast(Exact) * c.cast(Exact)).cast(DoubleType)
    when(count(c) > 1, sqrt(greatest((s2 - s * s / n) / (n - lit(1.0)), lit(0.0))))
  }

  /** Deterministic Pearson correlation from exact decimal sums. */
  def dcorr(x: Column, y: Column): Column = {
    val n = count(when(x.isNotNull && y.isNotNull, 1)).cast(DoubleType)
    val xe = when(y.isNotNull, x).cast(Exact)
    val ye = when(x.isNotNull, y).cast(Exact)
    val sx = sum(xe).cast(DoubleType)
    val sy = sum(ye).cast(DoubleType)
    val sxx = sum(xe * xe).cast(DoubleType)
    val syy = sum(ye * ye).cast(DoubleType)
    val sxy = sum(xe * ye).cast(DoubleType)
    val cov = sxy - sx * sy / n
    val vx = sxx - sx * sx / n
    val vy = syy - sy * sy / n
    cov / sqrt(vx * vy)
  }
}
