package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import graft.Tables
import graft.operators.{Events, Extraction, Num}

/** Batch 4a: event-time operators (SURVEY.md §2 I) on `events`. */
object EventQueries {

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_agg" -> { (s, dir) =>
      Events.windowAggregate(
        Tables.events(s, dir), "ts", "day", Seq("event_type"),
        Seq(count(lit(1)).as("n_events"), Num.dsum(col("value")).as("value_sum")))
    },
    "q_sessionize" -> { (s, dir) =>
      Events.sessionize(
        Tables.events(s, dir), "user_id", "ts", gapSeconds = 1800L,
        Seq(Num.dsum(col("value")).as("value_sum")))
    },
    // D6 — schema-on-read JSON attribute extraction + aggregation
    "q_json_extract" -> { (s, dir) =>
      Extraction.jsonAttributes(
        Tables.events(s, dir), "props",
        StructType(Seq(StructField("k", IntegerType))),
        keep = Seq("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), sum("k").as("k_sum"))
        .orderBy("event_type")
    },
  )

  import CoreQueries.dsum

  val oracles: Map[String, String] = Map(
    "q_window_agg" -> s"""
      SELECT date_trunc('day', ts) AS window_start, event_type,
             COUNT(*) AS n_events, ${dsum("value")} AS value_sum
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    // CAST(ts AS TIMESTAMP) first: the parquet column is TIMESTAMP_NS;
    // Spark reads it truncated to microseconds, so the oracle must
    // sessionize at the same precision.
    "q_sessionize" -> s"""
      WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      m AS (
        SELECT *, CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
              OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
            OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
          THEN 1 ELSE 0 END AS is_new
        FROM e),
      s AS (
        SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        FROM m)
      SELECT user_id, session_seq,
             MIN(ts) AS session_start, MAX(ts) AS session_end,
             COUNT(*) AS n_events, ${dsum("value")} AS value_sum
      FROM s GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_json_extract" -> """
      SELECT event_type, COUNT(*) AS n_events,
             CAST(SUM(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS k_sum
      FROM events GROUP BY event_type ORDER BY event_type""",
  )
}
