package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Vector math over `array<float|double>` columns as pure Catalyst
  * higher-order functions — no UDFs, fully distributed, and (key for
  * the DuckDB oracle gate) numerically reproducible: every element is
  * cast to double and summed by a sequential left fold, the same
  * evaluation order DuckDB's `list_sum` uses, so results are
  * bit-identical across engines.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ in double precision (sequential fold, order-stable). */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** Σ aᵢ² in double precision. */
  def norm2D(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) =>
      acc + x.cast(DoubleType) * x.cast(DoubleType))

  /** Cosine similarity; NaN on a zero vector (caller filters). */
  def cosineD(a: Column, b: Column): Column =
    dotD(a, b) / sqrt(norm2D(a) * norm2D(b))
}
