package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators._

/** Batch 3b: dedup suite + similarity search (SURVEY.md §2 J, K) on
  * `documents` / `embeddings`. J2/J3/K2 are bucketed-approximate ops
  * with no SQL equivalent → rows-only driver check; their pair-mining
  * logic is additionally unit-tested with constructed inputs in
  * `DedupSpec`.
  */
object DedupQueries {

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> { (s, dir) =>
      Dedup.exactDuplicates(Tables.documents(s, dir), "doc_id", "text")
    },
    "q_dedup_minhash" -> { (s, dir) =>
      Dedup.minhashCandidates(Tables.documents(s, dir), "doc_id", "text")
    },
    "q_dedup_simhash" -> { (s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text")
    },
    "q_ngram_jaccard" -> { (s, dir) =>
      Dedup.ngramJaccardPairs(
        Tables.documents(s, dir), "doc_id", "text", "source", n = 3, minJaccard = 0.1)
    },
    "q_dedup_embedding" -> { (s, dir) =>
      Dedup.embeddingNearDup(
        Tables.embeddings(s, dir), "vec_id", "embedding", "label", threshold = 0.4)
    },
    "q_ann_cosine" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(
        emb, emb.where(col("vec_id") < 8), "vec_id", "embedding", k = 10)
    },
    "q_ann_lsh" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Similarity.lshTopK(
        emb, emb.where(col("vec_id") < 8), "vec_id", "embedding",
        k = 10, nPlanes = 6, dim = 64)
    },
    "q_ann_ivf" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopK(
        emb, emb.where(col("vec_id") < 8), "vec_id", "embedding",
        k = 10, centroidStride = 97, nProbe = 3)
    },
  )

  /** Double-precision cosine with the exact evaluation order of
    * [[graft.operators.VectorOps.cosineD]] (sequential fold ≡ DuckDB
    * list_sum) so values hash-compare bit-identically. */
  private def cosSql(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
       / SQRT(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
            * list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"""

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" -> """
      SELECT md5(text) AS text_hash, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
      FROM documents GROUP BY 1 ORDER BY 1""",
    "q_ngram_jaccard" -> """
      WITH s AS (
        SELECT doc_id, source,
          list_distinct(list_transform(generate_series(1, len(toks) - 2),
            i -> array_to_string(toks[i:i+2], ' '))) AS sh
        FROM (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents)
        WHERE len(toks) >= 3)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
      FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
      WHERE jaccard >= 0.1 ORDER BY id_a, id_b""",
    "q_dedup_embedding" -> s"""
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        ${cosSql("a.embedding", "b.embedding")} AS cosine
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE cosine > 0.4 ORDER BY id_a, id_b""",
    "q_ann_cosine" -> s"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                 FROM embeddings WHERE vec_id < 8),
      p AS (SELECT q.query_id, e.vec_id AS neighbor_id,
              ${cosSql("q.qv", "e.embedding")} AS cosine
            FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
      r AS (SELECT query_id, neighbor_id, cosine,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
            FROM p)
      SELECT query_id, rank, neighbor_id, cosine FROM r
      WHERE rank <= 10 ORDER BY query_id, rank""",
  )
}
