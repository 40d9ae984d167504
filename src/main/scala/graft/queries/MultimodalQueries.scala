package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord

/** Batch 5c: multimodal plumbing behind the driver gate (SURVEY.md §2
  * M1). The media table is the deterministic fake adapter over
  * `documents` (payload = text bytes); the query pushes every row
  * through the partition-batched codec path (decode → features) and
  * aggregates per media type. The oracle checks the SQL-visible half
  * (counts + payload byte totals); the feature vectors themselves are
  * asserted in MultimodalSourcesSpec.
  */
object MultimodalQueries {

  def media(s: SparkSession, dir: String): org.apache.spark.sql.Dataset[MediaRecord] = {
    import s.implicits._
    Multimodal.fakeMediaFromText(Tables.documents(s, dir), "doc_id", "text")
      .as[MediaRecord]
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_features" -> { (s, dir) =>
      Multimodal.extractFeatures(media(s, dir))
        .groupBy(col("media_type"))
        .agg(
          count(lit(1)).as("n_media"),
          sum(col("n_bytes")).as("bytes_sum"))
        .orderBy("media_type")
    },
  )

  val oracles: Map[String, String] = Map(
    "q_media_features" -> """
      SELECT ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
             COUNT(*) AS n_media,
             CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS bytes_sum
      FROM documents GROUP BY 1 ORDER BY 1""",
  )
}
