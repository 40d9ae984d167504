package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch diagnostic: where does q_dedup_cluster time go — the edge
  * build (corpus scan + md5 keys) or the convergence loop? */
object DebugCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val variants = Seq(
      ("aqe-on-32", true, 32), ("aqe-off-32", false, 32),
      ("aqe-on-4", true, 4), ("aqe-off-4", false, 4),
      ("aqe-off-4b", false, 4), ("aqe-on-32b", true, 32))
    variants.foreach { case (tag, aqe, parts) =>
      println(s"[debug] === $tag ===")
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val keyed = docs.select(
        col("doc_id"),
        explode(array(
          struct(lit("hash").as("kind"),
            md5(col("text").cast("binary")).as("k")),
          struct(lit("fp").as("kind"),
            md5(array_join(
              array_sort(array_distinct(split(lower(col("text")), " "))), " ")
              .cast("binary")).as("k")))).as("kk"))
        .select(col("doc_id"), col("kk.kind").as("kind"), col("kk.k").as("k"))
      val mins = keyed.groupBy("kind", "k").agg(min("doc_id").as("keep"))
      val edges = keyed.join(mins, Seq("kind", "k"))
        .where(col("doc_id") =!= col("keep"))
        .select(col("doc_id").as("src"), col("keep").as("dst"))
        .persist()
      t("edge build")(println(s"[debug] edges=${edges.count()}"))
      val cc = t("cc loop")(Dedup.connectedComponents(edges, "src", "dst"))
      t("cc materialize")(cc.write.format("noop").mode("overwrite").save())
      val kept = Dedup.keepCanonical(docs, cc, "doc_id")
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
      t("apply tail")(kept.write.format("noop").mode("overwrite").save())
      edges.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
