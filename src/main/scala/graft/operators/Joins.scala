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

  /** H3 — fuzzy entity-match join (the local re-expression of the
    * reference's taxonomy enrichment, `loaders/api_taxonomy_enricher
    * .py`: dirty imported names resolved against an authority list; the
    * HTTP lookup becomes a join against a local reference table in a
    * zero-egress deployment).
    *
    * Blocked edit-distance join: candidates pair only within
    * `blockOf(name)` buckets (caller picks the blocking key — a
    * suffix/prefix, soundex, or an LSH bucket), so the candidate space
    * is per-bucket quadratic, never corpus-quadratic — same scaling
    * contract as the dedup suite. The key's CARDINALITY must grow
    * with the corpus: a fixed-width key saturates and block size
    * grows ∝ n, turning the candidate join quadratic anyway (the
    * sf10 bench measured 64× cost for 10× data on a fixed 3-char
    * suffix; derive the width from a corpus count — see the
    * q_fuzzy_match gate — or block on an LSH band).
    *
    * The expensive compare runs on DISTINCT NAMES, not rows: distance
    * depends only on the strings, so both sides collapse to their name
    * sets first and every duplicate (common in real reference data —
    * the sf10 corpus carries 100 copies per name, and comparing rows
    * directly meant 10M levenshtein evals where ~1k name pairs carry
    * the information) is priced once. The row-level best-match
    * semantics are preserved EXACTLY: all rows of a ref name share its
    * distance, so "min (dist, ref_id) over rows" equals "min (dist,
    * per-name min ref_id) over names" — the per-name representative id
    * is folded in a pre-aggregation, the best name-pair is picked by
    * one bounded-heap window (`row_number ≤ 1` per dirty NAME, planned
    * as Partial+Final WindowGroupLimit), and dirty rows re-attach by
    * name in a final linear join.
    */
  def fuzzyMatch(
      dirty: DataFrame, dirtyId: String, dirtyName: String,
      ref: DataFrame, refId: String, refName: String,
      blockOf: Column => Column, maxDist: Int): DataFrame = {
    val d = dirty.select(
      col(dirtyId).as("dirty_id"), col(dirtyName).as("dirty_name"))
    val dn = d.select(col("dirty_name")).distinct()
      .withColumn("block", blockOf(col("dirty_name")))
    // one row per ref NAME, carrying the tie-break representative
    val rn = ref
      .groupBy(col(refName).as("ref_name"))
      .agg(min(col(refId)).as("ref_id"))
      .withColumn("block", blockOf(col("ref_name")))
    val cand = dn.join(rn, "block")
      .withColumn("dist", levenshtein(col("dirty_name"), col("ref_name")))
      .where(col("dist") <= maxDist)
    val best = cand
      .withColumn("rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("dirty_name")
            .orderBy(col("dist"), col("ref_id"))))
      .where(col("rn") === 1)
      .select(col("dirty_name"), col("ref_id"), col("ref_name"), col("dist"))
    d.join(best, Seq("dirty_name"))
      .select(col("dirty_id"), col("dirty_name"), col("ref_id"),
        col("ref_name"), col("dist"))
      .orderBy("dirty_id")
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

  /** Snapshot reconciliation: diff two versions of a table into
    * added / removed / changed rows (the incremental-import audit the
    * reference runs per entity, set-at-a-time). ONE full-outer
    * shuffle join on the key; unchanged rows are dropped before
    * anything else touches them, so the output is proportional to the
    * churn, not the table. Compared columns surface as
    * `old_<c>` / `new_<c>` pairs. */
  def snapshotDiff(
      oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__old", lit(1))
    val n = newDf.select(
      keyCols.map(col) ++ compareCols.map(c => col(c).as(s"__n_$c")) :+
        lit(1).as("__new"): _*)
    val joined = o.join(n, keyCols, "full_outer")
    val changed = compareCols
      .map(c => col(c) <=> col(s"__n_$c"))
      .reduce(_ && _)
    joined
      .withColumn("change_type",
        when(col("__old").isNull, "added")
          .when(col("__new").isNull, "removed")
          .when(!changed, "changed"))
      .where(col("change_type").isNotNull)
      .select(keyCols.map(col) ++ Seq(col("change_type")) ++
        compareCols.flatMap(c =>
          Seq(col(c).as(s"old_$c"), col(s"__n_$c").as(s"new_$c"))): _*)
      .orderBy(keyCols.map(col): _*)
  }
}
