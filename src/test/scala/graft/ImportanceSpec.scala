package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.Importance

/** DSIR importance resampling vs a plain-Scala reference (Map-based
  * bucket stats, the same IEEE expression order), plus the
  * reshuffle-stability the md5 machinery exists to provide. */
class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex8(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  private def refResample(
      docs: Seq[(Long, String, Boolean)], buckets: Int, grid: Long, cap: Long)
      : Map[Long, (Long, Boolean)] = {
    def grams(text: String): Seq[String] = {
      val t = text.split(" ", -1)
      if (t.length < 2) Seq.empty
      else (0 until t.length - 1).map(i => t(i) + " " + t(i + 1))
    }
    def bucket(g: String): Int = (md5hex8(g) % buckets).toInt
    val all = docs.flatMap { case (id, text, tgt) =>
      grams(text).map(g => (id, tgt, bucket(g)))
    }
    val t = all.filter(_._2).groupBy(_._3).map { case (b, o) => b -> o.size.toLong }
    val s = all.filterNot(_._2).groupBy(_._3).map { case (b, o) => b -> o.size.toLong }
    val tt = t.values.sum
    val ss = s.values.sum
    val q = (t.keySet ++ s.keySet).map { b =>
      val tb = t.getOrElse(b, 0L); val sb = s.getOrElse(b, 0L)
      b -> math.floor(
        ((2 * tb + 1) * (2 * ss + buckets)).toDouble /
          ((2 * sb + 1) * (2 * tt + buckets)).toDouble * grid.toDouble + 0.5).toLong
    }.toMap
    all.filterNot(_._2).groupBy(_._1).map { case (id, occ) =>
      val w = occ.groupBy(_._3).map { case (b, o) => o.size.toLong * q(b) }.sum
      val kept = w >= cap || md5hex8(id.toString) * cap < w * (1L << 32)
      id -> ((w, kept))
    }
  }

  test("resample matches the reference on random corpora") {
    val rnd = new Random(23)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    for (trial <- 1 to 3) {
      val docs = (0 until 40).map { i =>
        val text = Seq.fill(2 + rnd.nextInt(12))(words(rnd.nextInt(words.length)))
          .mkString(" ")
        (i.toLong, text, i % 5 == 0)
      }
      val df = docs.map { case (id, tx, tgt) => (id, tx, if (tgt) "t" else "s") }
        .toDF("doc_id", "text", "src")
      val cap = 1L << 24
      val got = Importance.resample(
        df, "doc_id", "text", col("src") === "t", buckets = 16, cap = cap)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      val want = refResample(docs, buckets = 16, grid = 1L << 20, cap = cap)
      assert(got == want, s"trial $trial")
    }
  }

  test("resample is reshuffle-stable and drops docs without bigram evidence") {
    val df = (0L until 30L).map(i => (i, s"w$i x${i % 3} y z", if (i % 4 == 0) "t" else "s"))
      .toDF("doc_id", "text", "src")
      .union(Seq((99L, "single", "s")).toDF("doc_id", "text", "src"))
    val a = Importance.resample(df, "doc_id", "text", col("src") === "t",
      buckets = 8, cap = 1L << 24).collect().toSeq
    val b = Importance.resample(df.repartition(7), "doc_id", "text",
      col("src") === "t", buckets = 8, cap = 1L << 24).collect().toSeq
    assert(a == b)
    assert(!a.exists(_.getLong(0) == 99L))
  }

  test("higher weight can only raise the keep decision at a fixed id hash") {
    // keep is weight >= cap OR u*cap < weight*2^32: monotone in weight
    val cap = 1L << 20
    val u = md5hex8("7")
    val decisions = Seq(0L, cap / 4, cap / 2, cap - 1, cap, 4 * cap)
      .map(w => w >= cap || u * cap < w * (1L << 32))
    assert(decisions == decisions.sorted)
  }
}
