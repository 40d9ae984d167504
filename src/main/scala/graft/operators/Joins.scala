package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join / enrichment operators.
  *
  * Niamoto's loaders (`core/plugins/loaders/join_table.py`,
  * `stats_loader.py`) fetch one entity's rows per query; here the whole
  * enrichment is ONE plan: small reference tables broadcast, the fact
  * table streams through without a shuffle until the final aggregate.
  */
object Joins {

  /** Star-join enrichment + aggregation: fact ⋈ dims (explicitly
    * broadcast — at 100 TB the dims are still ≪ the fact side) then
    * grouped aggregates. */
  def enrichAggregate(
      fact: DataFrame,
      dims: Seq[(DataFrame, Column)],
      groupBy: Seq[String],
      aggs: Seq[Column]): DataFrame = {
    val enriched = dims.foldLeft(fact) { case (acc, (dim, cond)) =>
      acc.join(broadcast(dim), cond)
    }
    enriched
      .groupBy(groupBy.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(groupBy.map(col): _*)
  }

  /** Per-reference-entity stats: aggregate the fact table by the
    * reference key, then attach reference attributes (left join keeps
    * zero-fact entities, mirroring the reference's "every taxon gets a
    * page" contract). Reference: `loaders/stats_loader.py`. */
  def referenceStats(
      reference: DataFrame,
      refKey: String,
      refAttrs: Seq[String],
      fact: DataFrame,
      factKey: String,
      aggs: Seq[Column]): DataFrame = {
    val stats = fact
      .groupBy(col(factKey).as(refKey))
      .agg(aggs.head, aggs.tail: _*)
    reference
      .select((refKey +: refAttrs).map(col): _*)
      .join(stats, Seq(refKey), "left")
      .orderBy(col(refKey))
  }
}
