package graft

import org.apache.spark.sql.functions._
import graft.operators.Hierarchy
import graft.plans.IntervalJoin

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("intervalJoin matches the BETWEEN cross-join on nested/overlapping/disjoint intervals") {
    val points = (-5L to 120L).map(p => (s"p$p", p)).toDF("pid", "x")
    val intervals = Seq(
      ("whole", 0L, 100L),
      ("left", 0L, 50L), ("right", 51L, 100L), // partition of whole
      ("nested", 10L, 20L), ("deep", 12L, 14L), // laminar chain
      ("overlap", 15L, 60L), // crosses left/right boundary
      ("pointI", 42L, 42L), // degenerate single-point interval
      ("far", 200L, 300L), // matches nothing
    ).toDF("iid", "lo", "hi")

    val got = IntervalJoin.join(points, intervals, "x", "lo", "hi")
      .select("pid", "iid").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val want = points.crossJoin(intervals)
      .where(col("x").between(col("lo"), col("hi")))
      .select("pid", "iid").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want)
    assert(got.contains(("p42", "pointI")) && !got.exists(_._2 == "far"))
  }

  test("intervalJoin drops null and inverted intervals and null points") {
    val points = Seq(("a", java.lang.Long.valueOf(5L)), ("b", null.asInstanceOf[java.lang.Long]))
      .toDF("pid", "x")
    val intervals = Seq(
      ("ok", java.lang.Long.valueOf(0L), java.lang.Long.valueOf(10L)),
      ("inverted", java.lang.Long.valueOf(9L), java.lang.Long.valueOf(1L)),
      ("nullLo", null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(10L)),
    ).toDF("iid", "lo", "hi")
    val got = IntervalJoin.join(points, intervals, "x", "lo", "hi")
      .select("pid", "iid").collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("a", "ok")))
  }

  test("intervalJoin plans as IntervalStabbingJoin, not BroadcastNestedLoopJoin") {
    val points = (0L to 30L).map(p => (s"p$p", p)).toDF("pid", "x")
    val intervals = Seq(("i", 0L, 10L)).toDF("iid", "lo", "hi")
    val plan = IntervalJoin.join(points, intervals, "x", "lo", "hi")
      .queryExecution.executedPlan.toString
    assert(plan.contains("IntervalStabbingJoin"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("nested-set subtree selection via intervalJoin matches lft-range semantics") {
    val nodes = Seq(
      ("root", null, 0L), ("a", "root", 1L), ("b", "root", 2L),
      ("a1", "a", 1L), ("a2", "a", 2L), ("b1", "b", 1L),
    ).toDF("node_id", "parent_id", "sort_key")
    val ns = Hierarchy.nestedSet(nodes).cache()
    val anc = ns.where(col("node_id") === "a").select(
      col("node_id").as("anc"), col("lft").as("alft"), col("rght").as("arght"))
    val sub = IntervalJoin.join(ns, anc, "lft", "alft", "arght")
      .select("node_id").as[String].collect().toSet
    assert(sub == Set("a", "a1", "a2"))
  }
}
