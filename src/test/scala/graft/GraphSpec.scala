package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** PageRank unit coverage: an in-test exact integer reference (same
  * floor-division arithmetic) replays the iteration over hand-built
  * graphs; the driver gate replays it again in DuckDB at corpus scale.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1L << 20

  /** Driver-side exact replay of the operator's contract. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = Math.floorDiv(3 * S, 20)
    var r = nodes.map(_ -> S).toMap
    (0 until iters).foreach { _ =>
      val inflow = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => Math.floorDiv(r(s), out(s)) }.sum).toMap
      r = nodes.map(n =>
        n -> (base + Math.floorDiv(17 * inflow.getOrElse(n, 0L), 20))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("s", "d"), "s", "d", iters = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star graph: hub absorbs spoke mass, exact integer match") {
    val edges = (1L to 9L).map(i => (i, 0L)) // 9 spokes -> hub 0
    val got = run(edges, 3)
    assert(got === reference(edges, 3))
    assert(got(0L) > got(1L) * 3, "hub must dominate spokes")
    // spokes have no in-links at all: they sit exactly on the base
    assert(got(1L) === Math.floorDiv(3 * S, 20))
  }

  test("cycle graph is symmetric and conserves the uniform fixed shape") {
    val n = 6L
    val edges = (0L until n).map(i => (i, (i + 1) % n))
    val got = run(edges, 4)
    assert(got === reference(edges, 4))
    assert(got.values.toSet.size === 1, "cycle ranks must all be equal")
  }

  test("dangling nodes receive rank but leak their own mass") {
    // 0 -> 1 -> 2, 2 dangling; plus 0 -> 2
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L))
    val got = run(edges, 3)
    assert(got === reference(edges, 3))
    assert(got(2L) > got(1L) && got(1L) > got(0L))
  }

  /** Driver-side exact replay of the HITS contract. */
  private def hitsReference(
      edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    def norm(m: Map[Long, Long]): Map[Long, Long] = {
      val mx = m.values.max
      val g = math.max(1L, Math.floorDiv(mx, S))
      m.view.mapValues(Math.floorDiv(_, g)).toMap
    }
    var h = nodes.map(_ -> S).toMap
    var a = nodes.map(_ -> S).toMap
    (0 until iters).foreach { _ =>
      a = norm(nodes.map(v =>
        v -> edges.filter(_._2 == v).map(e => h(e._1)).sum).toMap)
      h = norm(nodes.map(u =>
        u -> edges.filter(_._1 == u).map(e => a(e._2)).sum).toMap)
    }
    nodes.map(v => v -> (h(v), a(v))).toMap
  }

  test("hits: spokes are hubs, the hub node is the authority, exact integer match") {
    val edges = (1L to 9L).map(i => (i, 0L)) // 9 spokes all -> node 0
    val got = Graph.hits(edges.toDF("s", "d"), "s", "d", iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === hitsReference(edges, 2))
    assert(got(0L)._2 > got(1L)._2, "node 0 must dominate authority")
    assert(got(1L)._1 > got(0L)._1, "spokes must dominate hub score")
    assert(got(1L) === got(9L), "spokes are symmetric")
  }

  test("hits is invariant under input partitioning") {
    val edges = (0L until 40L).flatMap(i => Seq((i, (i * 7 + 3) % 40), (i, (i * 13 + 1) % 40)))
    val a = Graph.hits(edges.toDF("s", "d").repartition(1), "s", "d", iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Graph.hits(edges.toDF("s", "d").repartition(7, col("s")), "s", "d", iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b && a.nonEmpty)
    assert(hitsReference(edges, 2).toSet ===
      a.map(t => t._1 -> (t._2, t._3)))
  }

  /** Driver-side exact replay of the synchronous-LPA contract:
    * undirected neighbor multiset, (max count, min label) tie-break,
    * isolated nodes keep their label. */
  private def lpaReference(
      edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nbrs = edges.flatMap { case (s, d) => Seq((s, d), (d, s)) }
    val nodes = nbrs.map(_._1).distinct
    var lbl = nodes.map(n => n -> n).toMap
    (0 until iters).foreach { _ =>
      val next = nodes.map { n =>
        val counts = nbrs.filter(_._1 == n).map(p => lbl(p._2))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        n -> (if (counts.isEmpty) lbl(n)
              else counts.toSeq.minBy { case (l, c) => (-c, l) }._1)
      }.toMap
      lbl = next
    }
    lbl
  }

  private def runLpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.labelPropagation(edges.toDF("s", "d"), "s", "d", iters = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("lpa: two triangles with a bridge converge to two communities") {
    // triangle {0,1,2}, triangle {10,11,12}, bridge 2-10
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (10L, 11L), (11L, 12L), (12L, 10L), (2L, 10L))
    val got = runLpa(edges, 3)
    assert(got === lpaReference(edges, 3))
    // each triangle's nodes agree with each other on a community
    assert(got(0L) === got(1L))
    assert(got(11L) === got(12L))
  }

  test("lpa: tie-break picks the smallest label and rounds are synchronous") {
    // path 0-1-2: node 1 sees {0, 2} equally often -> label 0 wins;
    // synchronous round 1: 0->1's old label (1), 1->0, 2->1
    val edges = Seq((0L, 1L), (1L, 2L))
    val got1 = runLpa(edges, 1)
    assert(got1 === Map(0L -> 1L, 1L -> 0L, 2L -> 1L))
    assert(got1 === lpaReference(edges, 1))
    val got2 = runLpa(edges, 2)
    assert(got2 === lpaReference(edges, 2))
  }

  test("lpa is invariant under input partitioning") {
    val edges = (0L until 60L).map(i => (i, (i * 7 + 3) % 60))
    val a = Graph.labelPropagation(edges.toDF("s", "d").repartition(1), "s", "d", iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Graph.labelPropagation(
        edges.toDF("s", "d").repartition(7, col("d")), "s", "d", iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b && a.nonEmpty)
    assert(lpaReference(edges, 3).toSet === a.map(t => t._1 -> t._2))
  }

  test("result is invariant under input partitioning") {
    val edges = (0L until 50L).flatMap(i => Seq((i, (i * 7 + 3) % 50), (i, (i * 13 + 1) % 50)))
    val df1 = edges.toDF("s", "d").repartition(1)
    val df13 = edges.toDF("s", "d").repartition(13, col("d"))
    val a = Graph.pageRank(df1, "s", "d", iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Graph.pageRank(df13, "s", "d", iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("converged pagerank reaches a fixed point equal to enough fixed rounds") {
    val edges = (0L until 40L).flatMap(i => Seq((i, (i * 7 + 3) % 40), (i, (i * 13 + 1) % 40)))
    val conv = Graph.pageRankConverged(
        edges.toDF("s", "d"), "s", "d", tol = 0L, maxIters = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // tol = 0 means a TRUE fixed point on the integer grid: one more
    // fixed-iter round from it changes nothing — verify against the
    // driver reference iterated until stable
    var prev = Map.empty[Long, Long]
    var cur = reference(edges, 1)
    var k = 1
    while (cur != prev && k < 200) { prev = cur; k += 1; cur = reference(edges, k) }
    assert(k < 200 && conv === cur)
  }

  test("converged hits reaches a fixed point equal to enough fixed rounds") {
    // an ASYMMETRIC graph (a regular graph is a HITS fixed point at
    // initialization and would test nothing) that genuinely converges:
    // the star settles on the exact grid in 2 rounds
    val edges = (1L to 9L).map(i => (i, 0L))
    val conv = Graph.hitsConverged(edges.toDF("s", "d"), "s", "d",
        tol = 0L, maxIters = 10)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // tol = 0: a TRUE integer-grid fixed point — find the same point by
    // iterating the driver reference until it stops moving
    var prev = Map.empty[Long, (Long, Long)]
    var k = 1
    var cur = hitsReference(edges, 1)
    while (cur != prev && k < 10) { prev = cur; k += 1; cur = hitsReference(edges, k) }
    assert(k < 10 && conv === cur)
    // the integer floor normalization LIMIT-CYCLES on star+chain (the
    // documented oscillation mode) — the guard must be loud, not spin
    val osc = edges ++ Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val ex = intercept[IllegalArgumentException] {
      Graph.hitsConverged(osc.toDF("s", "d"), "s", "d", tol = 0L, maxIters = 4)
    }
    assert(ex.getMessage.contains("limit-cycle"))
  }

  test("converged pagerank fails LOUDLY when maxIters is too small") {
    val edges = (1L to 9L).map(i => (i, 0L))
    val ex = intercept[IllegalArgumentException] {
      Graph.pageRankConverged(edges.toDF("s", "d"), "s", "d",
        tol = 0L, maxIters = 1)
    }
    assert(ex.getMessage.contains("maxIters") || ex.getMessage.contains("tol"))
  }

  test("converged lpa stops when labels stabilize; oscillation fails loudly") {
    // two triangles + bridge: stabilizes quickly
    val tri = Seq((0L, 1L), (1L, 2L), (2L, 0L), (10L, 11L), (11L, 12L), (12L, 10L), (2L, 10L))
    val got = Graph.labelPropagationConverged(tri.toDF("s", "d"), "s", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // a converged labeling is a fixed point of one more synchronous round
    val nbrs = tri.flatMap { case (s, d) => Seq((s, d), (d, s)) }
    def oneRound(l: Map[Long, Long]): Map[Long, Long] =
      l.keys.map { n =>
        val counts = nbrs.filter(_._1 == n).map(p => l(p._2))
          .groupBy(identity).view.mapValues(_.size).toMap
        if (counts.isEmpty) n -> l(n)
        else n -> counts.toSeq.map { case (lbl, c) => (-c, lbl) }.min._2
      }.toMap
    assert(oneRound(got) === got, "converged labels must be a fixed point")
    // a 4-cycle 2-colors and oscillates under synchronous LPA → loud
    val square = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val ex = intercept[IllegalArgumentException] {
      Graph.labelPropagationConverged(square.toDF("s", "d"), "s", "d", maxIters = 6)
    }
    assert(ex.getMessage.contains("oscillates"))
  }
}
