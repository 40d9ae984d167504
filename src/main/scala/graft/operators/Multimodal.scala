package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2 M1): image/audio/video as
  * opaque `binary` columns with a typed metadata struct, processed by
  * partition-batched typed transforms.
  *
  * The decode step is STUBBED (deterministic byte-level fake — this
  * container has no image/audio codecs); everything around it is the
  * real Spark shape a production pipeline needs:
  *
  *  - schema: `media_id bigint, meta struct<media_type,width,height,
  *    duration_ms>, content binary` — metadata stays columnar (a scan
  *    filtering on `meta.media_type` prunes without touching bytes).
  *  - `mapPartitions`, not per-row UDF: one codec instance per
  *    partition (codec init is the expensive part), rows streamed
  *    through it — the Scala analogue of a batched pandas UDF.
  *  - Partitioning: content-bearing rows are large, so callers size
  *    partitions by bytes (`maxPartitionBytes`), never by row count.
  */
object Multimodal {

  case class MediaMeta(media_type: String, width: Int, height: Int, duration_ms: Long)
  case class MediaRecord(media_id: Long, meta: MediaMeta, content: Array[Byte])
  case class MediaFeatures(
      media_id: Long, media_type: String, n_bytes: Long, checksum: Long,
      features: Array[Float])
  case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("media_type", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))), nullable = false),
    StructField("content", BinaryType, nullable = false)))

  /** Stand-in for a real codec: init once per partition, decode per
    * row. The "features" are a deterministic 8-dim byte histogram
    * projection — STUB: a real deployment replaces `decode` with an
    * actual image/audio library call and keeps the surrounding shape. */
  final class StubCodec {
    def decode(content: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](8)
      var i = 0
      while (i < content.length) {
        acc((content(i) & 0xff) % 8) += 1.0f
        i += 1
      }
      val n = math.max(content.length, 1).toFloat
      acc.map(_ / n)
    }
    def checksum(content: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < content.length) { h = 31 * h + (content(i) & 0xff); i += 1 }
      h
    }
  }

  /** Batched feature extraction: codec constructed once per partition,
    * content dropped from the output (features are small — the big
    * binary column must not survive past the decode stage). */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      val codec = new StubCodec
      rows.map { r =>
        MediaFeatures(
          r.media_id, r.meta.media_type, r.content.length.toLong,
          codec.checksum(r.content), codec.decode(r.content))
      }
    }
  }

  /** Frame sampling for video-typed rows: k evenly spaced frames.
    * STUB: a frame is a byte slice; a real codec seeks and decodes.
    * flatMap keeps it one pass, no shuffle. */
  def frameSample(ds: Dataset[MediaRecord], k: Int): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      if (r.meta.media_type != "video" || r.content.isEmpty) Iterator.empty
      else {
        val step = math.max(r.content.length / k, 1)
        (0 until math.min(k, r.content.length)).iterator.map { i =>
          val from = i * step
          MediaFrame(r.media_id, i,
            r.content.slice(from, math.min(from + step, r.content.length)))
        }
      }
    }
  }

  case class ResizedMedia(
      media_id: Long, width: Int, height: Int, content: Array[Byte])

  /** Image resize for image-typed rows — STUB decode/resample (nearest-
    * neighbor over the flat byte payload, deterministic); the real
    * shape is what matters: per-partition codec reuse, image-typed rows
    * only, metadata recomputed alongside the new payload, binary in /
    * binary out so the stage chains with [[extractFeatures]] or a sink.
    */
  def resize(ds: Dataset[MediaRecord], outW: Int, outH: Int): Dataset[ResizedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      val outLen = outW * outH
      rows.collect {
        case r if r.meta.media_type == "image" && r.content.nonEmpty =>
          val in = r.content
          val out = new Array[Byte](outLen)
          var i = 0
          while (i < outLen) {
            out(i) = in((i.toLong * in.length / outLen).toInt)
            i += 1
          }
          ResizedMedia(r.media_id, outW, outH, out)
      }
    }
  }

  /** Wrap any table into the media schema with a deterministic fake
    * payload (bytes of a text column) — the test-corpus adapter. */
  def fakeMediaFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("media_type"),
        lit(64).as("width"), lit(64).as("height"),
        (length(col(textCol)) * 40L).as("duration_ms")).as("meta"),
      col(textCol).cast("binary").as("content"))
}
