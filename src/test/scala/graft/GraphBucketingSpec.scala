package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import graft.operators.Graph
import graft.sources.Writers

/** SURVEY.md §2 S / §5 — the "bucket edges by src and the
  * edge-proportional exchange disappears" claim of the graph loops,
  * proven at the plan level (the BucketingSpec posture): in a PageRank
  * round over a src-bucketed edge table the EDGE BYTES never pass
  * through a shuffle — the rank⋈edge join reads the buckets in place
  * and only the ∝nodes share frame re-partitions to match the bucket
  * layout. Over plain edges the same round shuffles the full edge
  * list. At 100 TB edges dwarf nodes by orders of magnitude, so
  * moving the exchange from the edge side to the node side IS the
  * per-iteration bottleneck fix. */
class GraphBucketingSpec extends SparkSpec {
  import spark.implicits._

  /** Full physical traversal with the AQE wrappers expanded in place
    * (AdaptiveSparkPlan → finalized plan, QueryStage → its stage plan,
    * ReusedExchange → the original) and the wrappers themselves
    * omitted, so `children.isEmpty` on an emitted node means a REAL
    * scan leaf. */
  private def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
    p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => walk(r.child)
      case other => other +: other.children.flatMap(walk)
    }

  /** True iff some shuffle exchange re-partitions the EDGE FRAME
    * ITSELF — an exchange whose subtree's only leaf is the (src, dst)
    * two-column edge scan (unique to the edge frame in this plan
    * family, for both the bucketed FileScan and the plain checkpointed
    * scan). Downstream exchanges (the dst-keyed inflow agg) contain
    * the edge scan transitively but shuffle ∝nodes aggregates, not
    * edge bytes — they must not count. */
  private def edgeBytesShuffled(df: org.apache.spark.sql.DataFrame): Boolean = {
    df.count() // finalize AQE
    def isEdgeLeaf(n: org.apache.spark.sql.execution.SparkPlan): Boolean =
      n.children.isEmpty && n.output.map(_.name).sorted == Seq("dst", "src")
    walk(df.queryExecution.executedPlan).exists {
      case s: ShuffleExchangeLike =>
        val leaves = walk(s).filter(_.children.isEmpty)
        leaves.nonEmpty && leaves.forall(isEdgeLeaf)
      case _ => false
    }
  }

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.count() // finalize AQE
    walk(df.queryExecution.executedPlan).count(_.isInstanceOf[ShuffleExchangeLike])
  }

  test("a bucketed edge table keeps edge bytes out of every round's shuffles") {
    val edges = (0L until 400L)
      .flatMap(i => Seq((i, (i * 7 + 3) % 400), (i, (i * 13 + 1) % 400)))
      .toDF("src", "dst")
    Writers.bucketedTable(edges, "pr_edges_b", Seq("src"), 8)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val eBucketed = spark.table("pr_edges_b").select(col("src"), col("dst"))
      val ePlain = edges.localCheckpoint()
      def round(e: org.apache.spark.sql.DataFrame) = {
        // the iterate() plan with checkpointed ∝nodes side frames, so
        // the two variants differ ONLY in the edge frame's layout
        val nodes = e.select(col("src").as("node"))
          .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
        val outDeg = e.groupBy("src").agg(count(lit(1)).as("out_c")).localCheckpoint()
        val ranks = nodes.withColumn("rank", lit(1L << 20)).localCheckpoint()
        Graph.iterate(e, nodes, outDeg, ranks, 157286L, 17L, 20L)
      }
      assert(edgeBytesShuffled(round(ePlain)),
        "control: plain edges must shuffle into the rank join")
      assert(!edgeBytesShuffled(round(eBucketed)),
        "bucketed edges must join in place — no exchange may contain the edge scan")
      // and the trade never ADDS exchanges: the matching shuffle moves
      // to the ∝nodes share frame, it doesn't duplicate
      assert(shuffles(round(eBucketed)) <= shuffles(round(ePlain)))
      // and the answers are identical — layout is a plan property only
      val a = Graph.pageRankBucketed(spark, "pr_edges_b", "src", "dst", iters = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val b = Graph.pageRank(edges, "src", "dst", iters = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(a === b)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS pr_edges_b")
    }
  }
}
