package graft

import org.apache.spark.sql.functions._
import graft.plans.{ChainRefs, Pipeline}

/** Chain reference resolution (`@step.field|fn(args)` —
  * reference_resolver.py semantics): substitution correctness for the
  * scalar / aggregating / array pipe families, the exactly-one-row
  * guard, validation loudness, literal-@ text survival, and the
  * one-plan broadcast shape. */
class ChainRefsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "news", 120L, "en"), (2L, "web", 80L, "en"),
    (3L, "news", 200L, "fr"), (4L, "web", 50L, "fr"),
    (5L, "news", 10L, "en")).toDF("doc_id", "source", "n_chars", "lang")

  private def resolve: String => org.apache.spark.sql.DataFrame = {
    case "docs" => docs
    case other => fail(s"unexpected table $other")
  }

  test("scalar reference from a one-row step substitutes into a filter") {
    val spec = """
entity: refs
sources: [{name: d, table: docs}]
steps:
  - name: stats
    op: aggregate
    params: {groupBy: [], aggs: {mx: "max(n_chars)"}}
  - name: big
    op: filter
    input: d
    params: {where: "n_chars * 2 > @stats.mx"}
"""
    val got = Pipeline.result(spark, spec, resolve)
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 3L)) // 120*2, 200*2 > 200
  }

  test("aggregating pipes fold a multi-row column to one scalar") {
    val spec = """
entity: refs
sources: [{name: d, table: docs}]
steps:
  - name: out
    op: aggregate
    input: d
    params:
      groupBy: [lang]
      aggs:
        n: "count(1)"
        total: "max(@d.n_chars|sum)"
        rows: "max(@d.doc_id|length)"
        mean_chars: "max(@d.n_chars|mean)"
  - name: ordered
    op: sort
    params: {by: [lang]}
"""
    val rows = Pipeline.result(spark, spec, resolve).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("en", "fr"))
    assert(rows.forall(r => r.getAs[Long]("total") == 460L)) // sum over ALL docs
    assert(rows.forall(r => r.getAs[Long]("rows") == 5L))
    assert(rows.forall(r => r.getAs[Double]("mean_chars") == 92.0))
  }

  test("array pipes resolve on a one-row collected list") {
    val spec = """
entity: refs
sources: [{name: d, table: docs}]
steps:
  - name: langs
    op: aggregate
    input: d
    params: {groupBy: [], aggs: {ls: "sort_array(collect_set(lang))"}}
  - name: out
    op: select
    input: d
    params:
      columns:
        - "doc_id"
        - "(@langs.ls|last) AS last_lang"
        - "(@langs.ls|first) AS first_lang"
        - "(@langs.ls|length) AS n_langs"
  - name: ordered
    op: sort
    params: {by: [doc_id]}
"""
    val r = Pipeline.result(spark, spec, resolve).collect().head
    assert(r.getString(1) == "fr" && r.getString(2) == "en" && r.getInt(3) == 2)
  }

  test("scalar post-transforms: round/int/str compose onto the pickup") {
    val spec = """
entity: refs
sources: [{name: d, table: docs}]
steps:
  - name: stats
    op: aggregate
    params: {groupBy: [], aggs: {m: "avg(n_chars)"}}
  - name: out
    op: select
    input: d
    params:
      columns:
        - "doc_id"
        - "(@stats.m|round(1)) AS m1"
        - "(@stats.m|int) AS mi"
  - name: one
    op: filter
    params: {where: "doc_id = 1"}
"""
    val r = Pipeline.result(spark, spec, resolve).collect().head
    assert(r.getDouble(1) == 92.0 && r.getLong(2) == 92L)
  }

  test("a plain reference to a multi-row step fails loudly inside the job") {
    val spec = """
entity: refs
sources: [{name: d, table: docs}]
steps:
  - name: multi
    op: filter
    input: d
    params: {where: "n_chars > 0"}
  - name: out
    op: filter
    input: d
    params: {where: "n_chars > @multi.n_chars"}
"""
    val e = intercept[Exception](
      Pipeline.result(spark, spec, resolve).collect())
    assert(e.getMessage.contains("expects exactly 1 row"))
  }

  test("undefined step with a pipe function fails at validation") {
    val spec = """
entity: refs
sources: [{name: d, table: docs}]
steps:
  - name: out
    op: filter
    input: d
    params: {where: "n_chars > @stets.n_chars|mean"}
"""
    val e = intercept[IllegalArgumentException](
      Pipeline.result(spark, spec, resolve))
    assert(e.getMessage.contains("undefined step 'stets'"))
  }

  test("unknown pipe function fails at validation, listing known ones") {
    val spec = """
entity: refs
sources: [{name: d, table: docs}]
steps:
  - name: stats
    op: aggregate
    params: {groupBy: [], aggs: {mx: "max(n_chars)"}}
  - name: out
    op: filter
    input: d
    params: {where: "n_chars > @stats.mx|frobnicate"}
"""
    val e = intercept[IllegalArgumentException](
      Pipeline.result(spark, spec, resolve))
    assert(e.getMessage.contains("unknown function 'frobnicate'"))
    assert(e.getMessage.contains("mean"))
  }

  test("an unknown field in a resolvable reference lists available columns") {
    val spec = """
entity: refs
sources: [{name: d, table: docs}]
steps:
  - name: stats
    op: aggregate
    params: {groupBy: [], aggs: {mx: "max(n_chars)"}}
  - name: out
    op: filter
    input: d
    params: {where: "n_chars > @stats.mz"}
"""
    val e = intercept[IllegalArgumentException](
      Pipeline.result(spark, spec, resolve))
    assert(e.getMessage.contains("field 'mz' not found"))
    assert(e.getMessage.contains("mx"))
  }

  test("literal @text inside a SQL string survives untouched") {
    val spec = """
entity: refs
sources: [{name: d, table: docs}]
steps:
  - name: out
    op: filter
    input: d
    params: {where: "lang NOT LIKE '%@example.com'"}
"""
    assert(Pipeline.result(spark, spec, resolve).count() == 5L)
  }

  test("reference columns never leak into step output") {
    val spec = """
entity: refs
sources: [{name: d, table: docs}]
steps:
  - name: stats
    op: aggregate
    params: {groupBy: [], aggs: {mx: "max(n_chars)"}}
  - name: big
    op: filter
    input: d
    params: {where: "n_chars = @stats.mx"}
"""
    val out = Pipeline.result(spark, spec, resolve)
    assert(out.columns.toSeq == docs.columns.toSeq)
    assert(out.count() == 1L)
  }

  test("the reference side joins as a broadcast, never a shuffle") {
    val spec = """
entity: refs
sources: [{name: d, table: docs}]
steps:
  - name: stats
    op: aggregate
    params: {groupBy: [], aggs: {mx: "max(n_chars)"}}
  - name: big
    op: filter
    input: d
    params: {where: "n_chars * 2 > @stats.mx"}
"""
    val out = Pipeline.result(spark, spec, resolve)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), s"no broadcast in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"shuffle join in:\n$plan")
  }

  test("findRefs parses path, function and args") {
    val rs = ChainRefs.findRefs(
      "x > @s1.a.b[0]|round(2) AND y < @s2.c")
    assert(rs.size == 2)
    assert(rs.head.step == "s1" && rs.head.path == "a.b[0]" &&
      rs.head.func.contains("round") && rs.head.args == Seq("2"))
    assert(rs(1).step == "s2" && rs(1).path == "c" && rs(1).func.isEmpty)
  }
}
