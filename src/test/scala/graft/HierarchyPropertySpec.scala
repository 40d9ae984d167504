package graft

import org.apache.spark.sql.functions._
import scala.util.Random
import graft.operators.Hierarchy
import graft.plans.IntervalJoin

/** Randomized-structure tests for the hierarchy machinery (fixed seed —
  * deterministic): nested-set labels on random trees must satisfy the
  * structural invariants, not just match hand-picked examples, and the
  * custom interval-stabbing join must agree with the equivalent
  * BETWEEN theta-join on random points/intervals including empty and
  * duplicated intervals.
  */
class HierarchyPropertySpec extends SparkSpec {
  import spark.implicits._

  test("nestedSet labels satisfy the structural invariants on random trees") {
    val rnd = new Random(42)
    for (_ <- 1 to 6) {
      // node i's parent is a uniform pick among 0..i-1 → acyclic
      val n = 2 + rnd.nextInt(39)
      val nodes: Seq[(String, Option[String], Long)] =
        ("n0", None, 0L) +: (1 until n).map { i =>
          (s"n$i", Some(s"n${rnd.nextInt(i)}"), i.toLong)
        }
      val df = nodes.toDF("node_id", "parent_id", "sort_key")
      val out = Hierarchy.nestedSet(df).collect()
        .map(r => r.getString(0) ->
          ((Option(r.getString(1)), r.getLong(3), r.getLong(4)))).toMap

      // 1. labels are exactly the permutation 1..2n
      val allLabels = out.values.flatMap { case (_, l, r) => Seq(l, r) }.toSeq.sorted
      assert(allLabels == (1L to 2L * n), s"n=$n labels=$allLabels")
      // 2. parent interval strictly contains every child's
      out.foreach { case (_, (parentOpt, l, r)) =>
        assert(l < r)
        parentOpt.foreach { p =>
          val (_, pl, pr) = out(p)
          assert(pl < l && r < pr)
        }
      }
      // 3. siblings ordered by sort_key have disjoint ascending intervals
      val bySortKey = nodes.map(t => t._1 -> t._3).toMap
      out.groupBy(_._2._1).values.foreach { sibs =>
        sibs.toSeq.sortBy(s => bySortKey(s._1)).map(_._2)
          .sliding(2).foreach {
            case Seq((_, _, r1), (_, l2, _)) => assert(r1 < l2)
            case _ => ()
          }
      }
    }
  }

  test("salted two-pass sibling presum is bit-equal to the single-window path") {
    val rnd = new Random(11)
    for (trial <- 1 to 4) {
      val n = 2 + rnd.nextInt(59)
      // sparse, occasionally negative sort keys exercise the
      // floor-division bucketing across bucket boundaries
      val nodes: Seq[(String, Option[String], Long)] =
        ("n0", None, -7L) +: (1 until n).map { i =>
          (s"n$i", Some(s"n${rnd.nextInt(i)}"), i.toLong * 3 - 40)
        }
      val df = nodes.toDF("node_id", "parent_id", "sort_key")
      def labels(width: Long) =
        Hierarchy.nestedSet(df, siblingBucketWidth = width).collect()
          .map(r => (r.getString(0), r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
      val default = labels(0L)
      for (width <- Seq(1L, 4L, 1000L))
        assert(labels(width) == default, s"trial=$trial width=$width")
    }
  }

  test("ancestorClosure converges on a deep chain with no depth parameter") {
    val n = 20
    val nodes: Seq[(String, Option[String], Long)] =
      ("n0", None, 0L) +: (1 until n).map(i =>
        (s"n$i", Some(s"n${i - 1}"), i.toLong))
    val cl = Hierarchy.ancestorClosure(nodes.toDF("node_id", "parent_id", "sort_key"))
    // chain of n: node i has i+1 ancestors-or-self → Σ = n(n+1)/2
    assert(cl.count() == n * (n + 1) / 2)
    assert(cl.agg(max("dist")).head.getInt(0) == n - 1)
  }

  test("ancestorClosure fails loudly on a parent cycle instead of looping") {
    val nodes: Seq[(String, Option[String], Long)] = Seq(
      ("a", Some("b"), 0L), ("b", Some("c"), 1L), ("c", Some("a"), 2L))
    val e = intercept[IllegalArgumentException] {
      Hierarchy.ancestorClosure(
        nodes.toDF("node_id", "parent_id", "sort_key"), maxIter = 5)
    }
    assert(e.getMessage.contains("cycle"))
  }

  test("interval-stabbing join matches the BETWEEN theta-join on random inputs") {
    val rnd = new Random(7)
    for (_ <- 1 to 6) {
      val points = Seq.tabulate(1 + rnd.nextInt(60))(i =>
        (i.toLong, rnd.nextLong() % 50))
      val ivs = Seq.tabulate(1 + rnd.nextInt(15)) { i =>
        val lo = rnd.nextLong() % 50
        (i.toLong, lo, lo + rnd.nextInt(26) - 5) // negative width → empty
      }
      val p = points.toDF("pid", "p")
      val iv = ivs.toDF("iid", "lo", "hi")
      val custom = IntervalJoin.join(p, iv, "p", "lo", "hi")
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val reference = p.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(custom == reference, s"points=$points ivs=$ivs")
    }
  }
}
