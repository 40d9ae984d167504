package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRecord}
import graft.sources.{Readers, Writers}

class MultimodalSourcesSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDs = {
    val recs = Seq(
      MediaRecord(1L, MediaMeta("image", 64, 64, 0L), "imagebytes".getBytes),
      MediaRecord(2L, MediaMeta("video", 64, 64, 4000L), ("f" * 100).getBytes),
      MediaRecord(3L, MediaMeta("audio", 0, 0, 2000L), "audiobytes".getBytes),
    )
    spark.createDataset(recs)
  }

  test("extractFeatures is deterministic, drops content, keeps metadata") {
    val out = Multimodal.extractFeatures(mediaDs).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(out.forall(_.features.length == 8))
    assert(out(0).n_bytes == 10L && out(0).media_type == "image")
    // deterministic: second run bit-identical
    val again = Multimodal.extractFeatures(mediaDs).collect().sortBy(_.media_id)
    assert(out.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
    assert(out(0).features.toSeq == again(0).features.toSeq)
  }

  test("frameSample emits k evenly spaced frames for video rows only") {
    val frames = Multimodal.frameSample(mediaDs, k = 4).collect()
    assert(frames.forall(_.media_id == 2L))
    assert(frames.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3))
    assert(frames.map(_.frame.length).sum == 100)
  }

  test("fakeMediaFromText matches the declared media schema") {
    val docs = Seq((7L, "hello world")).toDF("doc_id", "text")
    val media = Multimodal.fakeMediaFromText(docs, "doc_id", "text")
    assert(media.schema.catalogString == Multimodal.mediaSchema.catalogString) // modulo nullability
    val r = media.as[MediaRecord].head()
    assert(r.media_id == 7L && new String(r.content) == "hello world")
    assert(Seq("image", "audio", "video").contains(r.meta.media_type))
  }

  test("resize keeps image-typed rows only, at the target dimensions") {
    import spark.implicits._
    val recs = Seq(
      Multimodal.MediaRecord(1L, Multimodal.MediaMeta("image", 64, 64, 0L),
        Array.tabulate(256)(_.toByte)),
      Multimodal.MediaRecord(2L, Multimodal.MediaMeta("audio", 0, 0, 1000L),
        Array.fill(64)(1.toByte)),
    ).toDS()
    val out = Multimodal.resize(recs, outW = 4, outH = 4).collect()
    assert(out.length == 1)
    assert(out.head.media_id == 1L)
    assert(out.head.content.length == 16)
    // nearest-neighbor stub is deterministic: element i samples i*256/16
    assert(out.head.content(1) == 16.toByte)
  }

  test("csv and jsonLines round-trip with explicit schemas") {
    val dir = Files.createTempDirectory("graft-io").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "score")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))

    Writers.dwcArchive(df, s"$dir/csv")
    val csvBack = Readers.csv(spark, s"$dir/csv", schema)
    assert(csvBack.orderBy("id").collect().map(_.toSeq).toSeq ==
      df.orderBy("id").collect().map(_.toSeq).toSeq)

    Writers.jsonLines(df, s"$dir/json")
    val jsonBack = Readers.jsonLines(spark, s"$dir/json", schema)
    assert(jsonBack.count() == 2)

    Writers.partitionedParquet(df, s"$dir/pq", Seq("name"))
    val pqBack = Readers.parquet(spark, s"$dir/pq")
    assert(pqBack.count() == 2)
    // partition pruning: filter on the partition key reads one directory
    val pruned = pqBack.where(col("name") === "a")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == 1)
    assert(scan.contains("PartitionFilters") || scan.contains("name#"))
  }
}
