package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Format / export transformers (SURVEY.md §2 G), re-expressing
  * niamoto's Darwin-Core exporter (`exporters/transformers/
  * niamoto_to_dwc_occurrence.py`: declarative source-column → DwC-term
  * mapping with constants and derived expressions) and the JSON API
  * exporter (`exporters/json_api_exporter.py`: one nested JSON detail
  * document per entity).
  *
  * Both are pure projections/aggregations — the "export" is just a
  * DataFrame any sink can write (`.write.csv` for a DwC archive,
  * `.write.text`/kafka for JSON-lines), so the operator itself stays
  * sink-agnostic and scales with the scan.
  */
object Formats {

  /** G1 — declarative column mapping: output column name → source
    * expression (rename, constant, or derived term), in spec order. */
  def mapToSchema(df: DataFrame, mapping: Seq[(String, Column)]): DataFrame =
    df.select(mapping.map { case (name, c) => c.as(name) }: _*)

  /** G7 — export index (`exporters/index_generator.py` writes the
    * per-entity index JSON next to the detail files): one index row
    * per detail document — entity keys, record count, and the relative
    * detail-file path the detail writer uses. The index is derived
    * from the detail frame itself (one narrow projection, no rescan of
    * the source), so it can never disagree with what was exported. */
  def exportIndex(
      details: DataFrame, entityKeys: Seq[String], nDetailsCol: String,
      pathPrefix: String): DataFrame =
    details.select(
      entityKeys.map(col) ++ Seq(
        col(nDetailsCol).as("n_records"),
        concat(lit(pathPrefix), lit("/"),
          concat_ws("_", entityKeys.map(col): _*), lit(".json")).as("detail_path")): _*)
      .orderBy(entityKeys.map(col): _*)

  /** G2 — per-entity nested JSON detail records: group `detail` rows
    * by `entityKeys`, order each entity's details by `sortKey`
    * descending, keep `topN`, emit one JSON document per entity.
    * `detailStruct` must contain `sortKey` as its first field (struct
    * ordering = field order) so the array sort is deterministic. */
  def jsonDetailRecords(
      df: DataFrame, entityKeys: Seq[String], detailStruct: Column,
      topN: Int): DataFrame = {
    val keyCols = entityKeys.map(col)
    df.groupBy(keyCols: _*)
      .agg(
        count(lit(1)).as("n_details"),
        slice(reverse(sort_array(collect_list(detailStruct))), 1, topN)
          .as("top_details"))
      .select(
        keyCols :+ col("n_details") :+
          to_json(struct(keyCols :+ col("top_details"): _*)).as("payload"): _*)
      .orderBy(keyCols: _*)
  }
}
