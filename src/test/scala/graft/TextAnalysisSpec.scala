package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "le chat est sur le tapis et la table"),
    (3L, "a b c 123 456"),
  ).toDF("doc_id", "text")

  test("quality computes char/token counts and ratios") {
    val r = TextAnalysis.quality(docs, "doc_id", "text")
      .where(col("doc_id") === 1).head()
    assert(r.getAs[Long]("n_chars") == 22L)
    assert(r.getAs[Long]("n_tokens") == 6L)
    // "the" twice + "on" not in list → stopwords: the, on? only 'the','on':
    // stopEn has "the","a","of","and","to","in","is","it","that","for"
    assert(r.getAs[Double]("stopword_ratio") == 2.0 / 6.0)
    assert(r.getAs[Double]("quality_score") > 0.0)
  }

  test("langId picks the language with most stopword hits") {
    val out = TextAnalysis.langId(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("lang_pred")).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "fr")
  }

  test("tokenStats counts whitespace/alpha/distinct tokens") {
    val r = TextAnalysis.tokenStats(docs, "doc_id", "text")
      .where(col("doc_id") === 3).head()
    assert(r.getAs[Long]("n_ws_tokens") == 5L)
    assert(r.getAs[Long]("n_alpha_tokens") == 3L)
    assert(r.getAs[Long]("n_distinct_tokens") == 5L)
  }

  test("fingerprintClusters collapses docs with identical word sets") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha alpha"), // same word set, different order/mult
      (3L, "delta epsilon zeta"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.fingerprintClusters(df, "doc_id", "text").collect()
    assert(out.length == 2)
    val big = out.filter(_.getAs[Long]("n_docs") == 2L)
    assert(big.length == 1 && big.head.getAs[Long]("canonical_id") == 1L)
  }

  test("lmFluency ranks reference-like text above gibberish and backs off for OOV") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "the cat sat on the mat", true),
      (2L, "the dog sat on the mat", true),
      (10L, "the cat sat on the mat", false),  // in-distribution
      (11L, "zz qq vv kk zz qq", false),        // fully OOV gibberish
      (12L, "the cat zz qq on the mat", false), // mixed
    ).toDF("doc_id", "text", "ref")
    val got = TextAnalysis.lmFluency(df, "doc_id", "text", col("ref"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got.keySet == Set(10L, 11L, 12L))
    assert(got(10L) > got(12L) && got(12L) > got(11L))
    // OOV bigrams score the strictly-positive smoothed floor, not zero
    assert(got(11L) > 0.0)
  }

  test("fluency buckets: thirds by value thresholds, monotone across buckets") {
    // 1 reference doc + 9 candidates with strictly decreasing overlap
    val ref = Seq((0L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", true))
    val cands = (1 to 9).map { i =>
      val known = (1 to (10 - i)).map(j => s"w$j")
      val oov = (1 to i).map(j => s"x${i}_$j")
      (i.toLong, (known ++ oov).mkString(" "), false)
    }
    val df = (ref ++ cands).toDF("doc_id", "text", "ref")
    val got = TextAnalysis.fluencyBuckets(df, "doc_id", "text", col("ref"))
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getString(4)))
    assert(got.length === 9)
    val byBucket = got.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    assert(byBucket("head").size === 3 && byBucket("middle").size === 3
      && byBucket("tail").size === 3)
    assert(byBucket("head").min >= byBucket("middle").max)
    assert(byBucket("middle").min >= byBucket("tail").max)
  }
}
