package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hierarchy operators — the reference's taxonomy machinery.
  *
  * Niamoto builds reference trees (taxonomy, spatial containment) as
  * adjacency lists, labels them with nested-set `lft/rght` intervals
  * (`core/imports/hierarchy_builder.py:532`, single-threaded DFS), and
  * then selects/aggregates subtrees via `lft BETWEEN` (`core/plugins/
  * loaders/nested_set.py:147`).
  *
  * Spark re-expression:
  *  - nested-set labeling = `maxDepth` rounds of level-wise joins +
  *    one sibling-window per round — every round is a distributed
  *    shuffle, no driver-side DFS, so a 10⁹-leaf taxonomy labels in
  *    ~depth stages.
  *  - subtree aggregation = ancestor-closure explode + ONE `groupBy`
  *    (not a per-node interval query, and not an interval range join,
  *    which would be O(N·log N) with skewed intervals at the root).
  *
  * Node frame contract: `node_id: string, parent_id: string (null for
  * the root), sort_key: bigint` (sibling order).
  */
object Hierarchy {

  /** Nested-set labels: (node_id, parent_id, level, lft, rght), with
    * `lft` assigned in DFS preorder over siblings ordered by sort_key
    * and `rght = lft + 2·|subtree| − 1`.
    */
  def nestedSet(nodes: DataFrame, maxDepth: Int): DataFrame = {
    val ids = nodes.select("node_id", "parent_id", "sort_key")

    // Bottom-up subtree sizes: size_k(n) = 1 + Σ size_{k-1}(children);
    // correct for all nodes once k reaches the tree height.
    var sizes = ids.select(col("node_id")).withColumn("size", lit(1L))
    for (_ <- 1 to maxDepth) {
      val childSum = ids
        .join(sizes, "node_id")
        .filter(col("parent_id").isNotNull)
        .groupBy(col("parent_id").as("node_id"))
        .agg(sum("size").as("child_size"))
      sizes = ids
        .select("node_id")
        .join(childSum, Seq("node_id"), "left")
        .withColumn("size", lit(1L) + coalesce(col("child_size"), lit(0L)))
        .select("node_id", "size")
    }

    // Top-down lft: lft(child) = lft(parent) + 1 + Σ 2·size(preceding siblings).
    // `sized` feeds every level and each `frontier` feeds both the next
    // level's join and the final union — persist them, or the iterative
    // lineage re-executes the whole prefix once per branch (measured 3×
    // on the 4-level tree; at real depth it would be exponential).
    val sized = ids.join(sizes, "node_id").persist()
    var frontier = sized
      .filter(col("parent_id").isNull)
      .withColumn("lft", lit(1L))
      .withColumn("level", lit(0))
    var acc = frontier
    for (lvl <- 1 to maxDepth) {
      val w = Window.partitionBy("parent_id").orderBy("sort_key")
        .rowsBetween(Window.unboundedPreceding, -1)
      val kids = sized
        .join(
          frontier.select(col("node_id").as("parent_id"), col("lft").as("parent_lft")),
          "parent_id")
        .withColumn("lft",
          col("parent_lft") + 1 + coalesce(sum(col("size") * 2).over(w), lit(0L)))
        .withColumn("level", lit(lvl))
        .select("node_id", "parent_id", "sort_key", "size", "lft", "level")
      frontier = kids.persist()
      acc = acc.unionByName(frontier)
    }
    acc
      .withColumn("rght", col("lft") + col("size") * 2 - 1)
      .select("node_id", "parent_id", "level", "lft", "rght")
      .orderBy("lft")
  }

  /** Aggregate a fact table at EVERY level of a dimension hierarchy in
    * one pass (`ROLLUP`) — the set-at-a-time version of niamoto's
    * per-taxon stats loop. `levels` are ordered coarse→fine.
    */
  def rollupAggregate(
      denormalized: DataFrame,
      levels: Seq[String],
      aggs: Seq[Column]): DataFrame =
    denormalized
      .rollup(levels.map(col): _*)
      .agg(grouping_id().cast("int").as("gid"), aggs: _*)
      .orderBy((col("gid") +: levels.map(c => col(c).asc_nulls_first)): _*)

  /** Ancestor closure of an adjacency list: one row per (node,
    * ancestor) pair incl. self. Built by `maxDepth` self-joins —
    * each a shuffle on parent_id, broadcast-able when the upper
    * levels are small.
    */
  def ancestorClosure(nodes: DataFrame, maxDepth: Int): DataFrame = {
    val edges = nodes.select("node_id", "parent_id")
    var closure = edges.select(
      col("node_id"), col("node_id").as("ancestor_id"), lit(0).as("dist"))
    var frontier = edges
      .filter(col("parent_id").isNotNull)
      .select(col("node_id"), col("parent_id").as("ancestor_id"), lit(1).as("dist"))
    var depth = 1
    while (depth <= maxDepth) {
      frontier = frontier.persist() // reused: union arm + next round's join
      closure = closure.unionByName(frontier)
      frontier = frontier
        .join(
          edges.select(col("node_id").as("ancestor_id"),
            col("parent_id").as("next_ancestor")),
          "ancestor_id")
        .filter(col("next_ancestor").isNotNull)
        .select(col("node_id"), col("next_ancestor").as("ancestor_id"),
          (col("dist") + 1).as("dist"))
      depth += 1
    }
    closure
  }

  /** Per-ancestor aggregation over all descendants' fact rows: the
    * nested-set loader + transformer loop collapsed into
    * closure-explode + one groupBy.
    */
  def subtreeAggregate(
      nodes: DataFrame,
      facts: DataFrame,
      factNodeCol: String,
      maxDepth: Int,
      aggs: Seq[Column]): DataFrame = {
    val closure = ancestorClosure(nodes, maxDepth)
    facts
      .join(closure, facts(factNodeCol) === closure("node_id"))
      .groupBy(col("ancestor_id"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("ancestor_id"))
  }
}
