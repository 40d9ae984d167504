package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph authority scoring (SURVEY.md §2 S) — the URL/domain
  * quality-weighting step of a web-corpus pipeline (CommonCrawl-style
  * harmonic/PageRank centrality feeding crawl prioritization and
  * per-domain quality priors; Page et al. 1999).
  *
  * Exact integer arithmetic throughout (the §7.5.15 contract): ranks
  * live on a 2^20 fixed-point grid, the damping factor is the rational
  * `dampNum/dampDen`, and every division is a floor division over
  * NONNEGATIVE longs — so Spark's `div`, Java's `floorDiv` and
  * DuckDB's `//` all agree, the iteration is partition-order-free, and
  * the DuckDB oracle replays the whole power iteration in unrolled
  * CTEs (the K6/Q18 posture). Dangling nodes (no out-links) leak their
  * mass — the standard simplification; they still RECEIVE rank.
  *
  * Shuffle economics per iteration: ranks ⋈ out-degrees is node-keyed,
  * then ONE exchange keys contributions by edge source and ONE
  * aggregates them by destination — 2 exchanges per iteration, edges
  * materialized once up front (`localCheckpoint`) instead of re-read
  * from source every round. At cluster scale pre-partition the edge
  * table by `src` once (bucketed write) and every iteration's first
  * exchange disappears; the rank frame is ∝ nodes, orders of magnitude
  * smaller than the edge list it never re-scans.
  */
object Graph {

  /** Power-iteration PageRank over an edge list. Returns one row per
    * node: (node, rank) with rank on the `scale` fixed-point grid
    * (a node with no in-links holds the `(1−d)·scale` base). */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, scale: Long = 1L << 20,
      dampNum: Long = 17, dampDen: Long = 20): DataFrame = {
    require(iters >= 1 && dampNum > 0 && dampNum < dampDen && scale > 0)
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .localCheckpoint() // re-joined every iteration: pay the source scan once
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint() // left side of every iteration's rank rebuild
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("out_c"))
      .localCheckpoint()
    val base = Math.floorDiv((dampDen - dampNum) * scale, dampDen)

    var ranks = nodes.withColumn("rank", lit(scale))
    var t = 0
    while (t < iters) {
      ranks = iterate(e, nodes, outDeg, ranks, base, dampNum, dampDen)
        .localCheckpoint() // truncate the per-iteration lineage (§7.1)
      t += 1
    }
    ranks.orderBy("node")
  }

  /** One power-iteration round, un-materialized — the loop body, also
    * the plan PlanAuditSpec audits (the checkpoint in [[pageRank]]
    * executes each round's plan eagerly, so the returned frame's own
    * plan no longer shows the iteration shape). */
  private[graft] def iterate(
      e: DataFrame, nodes: DataFrame, outDeg: DataFrame, ranks: DataFrame,
      base: Long, dampNum: Long, dampDen: Long): DataFrame = {
    val inflow = e
      .join(ranks.join(outDeg, col("node") === col("src"))
        .select(col("node").as("src"), expr("rank div out_c").as("share")), "src")
      .groupBy("dst").agg(sum("share").as("inflow"))
    nodes
      .join(inflow, col("node") === col("dst"), "left")
      .select(col("node"),
        (lit(base) + expr(s"($dampNum * coalesce(inflow, CAST(0 AS BIGINT))) div $dampDen"))
          .as("rank"))
  }
}
