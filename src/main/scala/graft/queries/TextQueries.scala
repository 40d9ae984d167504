package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.operators.TextAnalysis

/** Batch 3a: text-analysis operators (SURVEY.md §2 L) on `documents`.
  * All four are single-scan column pipelines (no UDFs) — at 100 TB they
  * stream through the corpus with zero shuffle except the fingerprint
  * collapse groupBy.
  */
object TextQueries {

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_quality" -> { (s, dir) =>
      TextAnalysis.quality(Tables.documents(s, dir), "doc_id", "text")
    },
    "q_lang_id" -> { (s, dir) =>
      TextAnalysis.langId(Tables.documents(s, dir), "doc_id", "text")
    },
    "q_token_count" -> { (s, dir) =>
      TextAnalysis.tokenStats(Tables.documents(s, dir), "doc_id", "text")
    },
    "q_fingerprint" -> { (s, dir) =>
      TextAnalysis.fingerprintClusters(Tables.documents(s, dir), "doc_id", "text")
    },
  )

  private def lst(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ",", "]")
  private def hits(ws: Seq[String]) =
    s"CAST(len(list_filter(toks, x -> list_contains(${lst(ws)}, x))) AS BIGINT)"

  val oracles: Map[String, String] = Map(
    "q_text_quality" -> s"""
      WITH t AS (
        SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
      f AS (
        SELECT doc_id,
          CAST(length(text) AS BIGINT) AS n_chars,
          CAST(len(toks) AS BIGINT) AS n_tokens,
          CAST(length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS BIGINT) AS n_alnum,
          CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digits,
          ${hits(TextAnalysis.stopEn)} AS n_stop
        FROM t)
      SELECT doc_id, n_chars, n_tokens,
        CAST(n_alnum AS DOUBLE) / CAST(n_chars AS DOUBLE) AS alnum_ratio,
        CAST(n_digits AS DOUBLE) / CAST(n_chars AS DOUBLE) AS digit_ratio,
        CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
        LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
          + CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 0.3
          + LEAST((CAST(n_chars - (n_tokens - 1) AS DOUBLE) / CAST(n_tokens AS DOUBLE)) / 10.0, 1.0) * 0.3
          AS quality_score
      FROM f ORDER BY doc_id""",
    "q_lang_id" -> s"""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      sc AS (
        SELECT doc_id,
          ${hits(TextAnalysis.stopEn)} AS score_en,
          ${hits(TextAnalysis.stopFr)} AS score_fr,
          ${hits(TextAnalysis.stopDe)} AS score_de,
          ${hits(TextAnalysis.stopEs)} AS score_es
        FROM t)
      SELECT doc_id, score_en, score_fr, score_de, score_es,
        CASE WHEN score_en >= score_fr AND score_en >= score_de AND score_en >= score_es THEN 'en'
             WHEN score_fr >= score_de AND score_fr >= score_es THEN 'fr'
             WHEN score_de >= score_es THEN 'de'
             ELSE 'es' END AS lang_pred
      FROM sc ORDER BY doc_id""",
    "q_token_count" -> """
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_ws_tokens,
        CAST(len(list_filter(toks, x -> regexp_matches(x, '^[a-z]+$'))) AS BIGINT) AS n_alpha_tokens,
        CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens
      FROM t ORDER BY doc_id""",
    "q_fingerprint" -> """
      SELECT md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fingerprint,
             COUNT(*) AS n_docs, MIN(doc_id) AS canonical_id
      FROM documents GROUP BY 1 ORDER BY 1""",
  )
}
