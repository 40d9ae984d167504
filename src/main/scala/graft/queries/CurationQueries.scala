package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Curation

/** Batch 6: corpus-curation operators (SURVEY.md §2 Q) on `documents`. */
object CurationQueries {

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_quality_signals" -> { (s, dir) =>
      Curation.repetitionSignals(Tables.documents(s, dir), Seq("doc_id"), "text")
    },
    "q_stratified_sample" -> { (s, dir) =>
      Curation.stratifiedSample(
        Tables.documents(s, dir).select("doc_id", "source"),
        Seq("source"), "doc_id", frac = 0.2)
    },
    "q_domain_topk" -> { (s, dir) =>
      Curation.domainTopK(
        Tables.documents(s, dir).select("doc_id", "source", "n_chars"),
        "source", "n_chars", "doc_id", k = 3)
    },
    "q_token_pack" -> { (s, dir) =>
      Curation.packSequences(
        Tables.documents(s, dir), "source", "doc_id",
        size(split(col("text"), " ")).cast("long"), budget = 256L)
    },
  )

  val oracles: Map[String, String] = Map(
    // max word multiplicity via token unnest + group; Spark computes the
    // same number as the longest run of the per-row sorted array
    "q_quality_signals" -> """
      WITH w AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_words,
               unnest(string_split(text, ' ')) AS word
        FROM documents),
      wc AS (SELECT doc_id, n_words, word, COUNT(*) AS c FROM w GROUP BY 1, 2, 3),
      tops AS (
        SELECT doc_id, n_words,
               CAST(COUNT(*) AS INT) AS n_distinct,
               MAX(c) AS top_word,
               CAST(SUM(len(word) * c) AS BIGINT) AS char_sum
        FROM wc GROUP BY 1, 2),
      bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(string_split(text, ' '))),
                 i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1]))
               AS bigram
        FROM documents WHERE len(string_split(text, ' ')) >= 2),
      bgc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2),
      bgt AS (SELECT doc_id, MAX(c) AS top_bigram FROM bgc GROUP BY 1)
      SELECT t.doc_id, CAST(t.n_words AS INT) AS n_words,
             CAST(t.n_distinct AS DOUBLE) / t.n_words AS distinct_word_frac,
             CAST(t.top_word AS DOUBLE) / t.n_words AS top_word_share,
             CAST(b.top_bigram AS DOUBLE) / (t.n_words - 1) AS top_bigram_share,
             CAST(t.char_sum AS DOUBLE) / t.n_words AS mean_word_len
      FROM tops t LEFT JOIN bgt b ON t.doc_id = b.doc_id
      ORDER BY t.doc_id""",
    "q_stratified_sample" -> """
      SELECT source, doc_id, CAST(rn AS INT) AS rn FROM (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS cnt
        FROM documents) t
      WHERE rn <= GREATEST(1, CAST(CEIL(cnt * 0.2) AS BIGINT))
      ORDER BY source, doc_id""",
    "q_domain_topk" -> """
      SELECT source, doc_id, n_chars, CAST(rank AS INT) AS rank FROM (
        SELECT source, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                 ORDER BY n_chars DESC, doc_id) AS rank
        FROM documents) t
      WHERE rank <= 3 ORDER BY source, rank""",
    "q_token_pack" -> """
      WITH d AS (
        SELECT source, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS sz
        FROM documents),
      b AS (
        SELECT source, doc_id, sz,
               CAST(FLOOR(COALESCE(SUM(sz) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 256.0) AS BIGINT) AS bin
        FROM d)
      SELECT source, bin, COUNT(*) AS n_docs, CAST(SUM(sz) AS BIGINT) AS tokens
      FROM b GROUP BY source, bin ORDER BY source, bin""",
  )
}
