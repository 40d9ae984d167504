package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.plans.Pipeline

/** Batch 8: the config-driven pipeline runner (SURVEY.md §2 R) — the
  * engine twin of the reference's services layer, where every run is
  * driven by a declarative YAML document (`services/transformer.py`,
  * `services/exporter.py`). The gates feed a literal YAML spec through
  * [[graft.plans.Pipeline]] and verify the compiled Catalyst plan's
  * rows against plain SQL.
  */
object PipelineQueries {

  /** Flagship spec: join_table loader + filter + exact-decimal
    * aggregate + projection + sort, all declared in YAML. */
  private val revenueSpec = """
entity: nation_orders
sources:
  - name: customers
    table: customer
  - name: cust_orders
    table: orders
    relation: {ref: customers, key: o_custkey, refKey: c_custkey}
steps:
  - name: finished
    op: filter
    input: cust_orders
    params: {where: "o_orderstatus = 'F'"}
  - name: by_nation
    op: aggregate
    params:
      groupBy: [c_nationkey]
      aggs:
        n_orders: "count(1)"
        revenue: "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)"
  - name: result
    op: select
    params:
      columns: ["c_nationkey AS nation_key", "n_orders", "revenue"]
  - name: ordered
    op: sort
    params: {by: [nation_key]}
"""

  /** Export spec: the same pipeline shortened, exported as parquet —
    * the gate reads the EXPORTED files back and aggregates them, so
    * spec-driven export layout and type round-tripping sit on the
    * verified path (the oracle aggregates the source directly). */
  private val exportSpec = """
entity: nation_orders_export
sources:
  - name: customers
    table: customer
  - name: cust_orders
    table: orders
    relation: {ref: customers, key: o_custkey, refKey: c_custkey}
steps:
  - name: by_segment
    op: aggregate
    input: cust_orders
    params:
      groupBy: [c_mktsegment]
      aggs:
        n_orders: "count(1)"
        revenue: "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)"
exports:
  - name: api
    format: parquet
    params: {path: by_segment}
"""

  private def resolver(s: SparkSession, dir: String): String => DataFrame =
    name => Tables(s, dir, name)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // R1 gate — YAML spec in, one Catalyst plan out: loader relation
    // join + filter + aggregate + select + sort, rows gated against
    // plain SQL. A compiler defect anywhere (wrong join key, lost
    // filter, mis-parsed agg expr) changes rows.
    "q_pipeline_run" -> { (s, dir) =>
      Pipeline.result(s, revenueSpec, resolver(s, dir))
    },
    // R2 gate — the EXPORT path: the spec's parquet export executes
    // into a scratch dir and the gate re-reads the exported files;
    // layout or type damage in the exporter changes rows.
    "q_pipeline_export" -> { (s, dir) =>
      val out = s"/tmp/graft-pipeline-${java.lang.Math.abs(dir.hashCode)}"
      val paths = Pipeline.run(s, exportSpec, resolver(s, dir), out)
      s.read.parquet(paths.head._2).orderBy("c_mktsegment")
    },
  )

  val oracles: Map[String, String] = Map(
    "q_pipeline_run" -> """
      SELECT c_nationkey AS nation_key, COUNT(1) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderstatus = 'F'
      GROUP BY 1 ORDER BY 1""",
    "q_pipeline_export" -> """
      SELECT c_mktsegment, COUNT(1) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1 ORDER BY 1""",
  )
}
