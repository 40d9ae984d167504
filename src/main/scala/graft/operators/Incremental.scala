package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental re-import refresh.
  *
  * The reference re-imports an entity by staging a full replacement
  * table and swapping it in (`core/imports/engine.py:104`
  * `_replace_table_with_staging`; snapshots tracked per entity by
  * `core/imports/registry.py:44`). A whole-table rewrite is untenable
  * at 100 TB — the engine twin is delta-driven: diff the snapshots
  * once, then touch ONLY the churn.
  *
  * Composition (H4 → J1-on-delta):
  *  1. [[Joins.snapshotDiff]] — ONE full-outer shuffle over the two
  *     snapshots; everything downstream is proportional to the delta,
  *     which is `localCheckpoint`ed (churn-sized) so the diff is
  *     computed exactly once, not re-derived per consumer branch.
  *  2. Added/changed rows get their content hash recomputed (J1's
  *     hash) — map-only over the delta.
  *  3. Ingest dedup: an upsert is skipped when its hash already exists
  *     in the UNTOUCHED corpus, or when a lower-id row in the same
  *     batch carries the same hash. The corpus is probed map-side —
  *     left-anti vs broadcast delta keys, then left-semi vs broadcast
  *     upsert hashes — so the big side never shuffles and is never
  *     rewritten; both broadcast builds are churn-sized.
  *
  * Output: one action row per delta key — `delete` / `upsert` /
  * `skip_duplicate` — i.e. exactly the statements an idempotent writer
  * would apply. Cost ∝ churn + one corpus scan; rewrite cost zero.
  */
object Incremental {

  def refreshActions(
      prev: DataFrame, next: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val delta = Joins.snapshotDiff(prev, next, Seq(idCol), Seq(textCol))
      .localCheckpoint()
    val upserts = delta.where(col("change_type") =!= "removed")
      .select(col(idCol), col("change_type"),
        md5(col(s"new_$textCol").cast("binary")).as("text_hash"))
    // Hashes that upserts collide with among rows NOT touched this
    // round. Corpus streams through both probes map-side.
    val corpusDupHashes = next
      .join(broadcast(delta.select(idCol)), Seq(idCol), "left_anti")
      .select(md5(col(textCol).cast("binary")).as("text_hash"))
      .join(broadcast(upserts.select("text_hash").distinct()),
        Seq("text_hash"), "left_semi")
      .distinct()
    val batchKeep = Window.partitionBy("text_hash") // churn-sized input
    val acted = upserts
      .join(broadcast(corpusDupHashes.withColumn("__corpus_dup", lit(1))),
        Seq("text_hash"), "left")
      .withColumn("__batch_keep", min(col(idCol)).over(batchKeep))
      .withColumn("action",
        when(col("__corpus_dup").isNotNull ||
          col("__batch_keep") < col(idCol), "skip_duplicate")
          .otherwise("upsert"))
      .select(col(idCol), col("change_type"), col("action"), col("text_hash"))
    val deletes = delta.where(col("change_type") === "removed")
      .select(col(idCol), col("change_type"),
        lit("delete").as("action"), lit(null).cast("string").as("text_hash"))
    acted.unionByName(deletes).orderBy(idCol)
  }
}
