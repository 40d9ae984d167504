package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2 M1): image/audio/video as
  * opaque `binary` columns with a typed metadata struct, processed by
  * partition-batched typed transforms.
  *
  * The image and audio paths are REAL pure-JVM codecs — PNG/BMP via
  * `javax.imageio.ImageIO`, WAV PCM via `javax.sound.sampled` — so
  * decode genuinely parses the container format (zlib inflate, IDAT
  * reassembly, RIFF chunk walk) before any pixel/sample is summed.
  * Only video decode remains a stub (no pure-JVM video codec exists);
  * it is labeled below. The Spark shape is what a production pipeline
  * needs:
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

  /** Decoded payload stats: `n_units`/`unit_sum` are the gateable
    * exact half (pixels and Σ(R+G+B) for images, samples and signed
    * sample sum for audio), `features` the float summary vector. */
  case class MediaFeatures(
      media_id: Long, media_type: String, n_bytes: Long, checksum: Long,
      n_units: Long, unit_sum: Long, features: Array[Float])
  case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("media_type", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))), nullable = false),
    StructField("content", BinaryType, nullable = false)))

  /** Pure-JVM media codec: one instance per partition. Image decode is
    * `ImageIO` (PNG/BMP/GIF — whatever the JDK registry carries);
    * audio decode is `AudioSystem` WAV PCM. Decode failures throw —
    * a corrupt payload must fail the job loudly, not zero silently. */
  final class JvmMediaCodec {

    def decode(mediaType: String, content: Array[Byte]): (Long, Long, Array[Float]) =
      mediaType match {
        case "image" => decodeImage(content)
        case "audio" => decodeWav(content)
        case _       => (0L, 0L, byteHistogram(content)) // STUB: no pure-JVM video codec
      }

    /** Full format decode; n_units = pixel count, unit_sum = Σ(R+G+B),
      * features = [meanR, meanG, meanB, width, height, 0, 0, 0]. */
    def decodeImage(content: Array[Byte]): (Long, Long, Array[Float]) = {
      val img = ImageIO.read(new ByteArrayInputStream(content))
      require(img != null, s"image decode failed (${content.length} bytes, no reader matched)")
      val w = img.getWidth; val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      (n, sr + sg + sb, Array(
        sr.toFloat / n, sg.toFloat / n, sb.toFloat / n, w.toFloat, h.toFloat, 0f, 0f, 0f))
    }

    /** WAV PCM-16 decode through the RIFF chunk walk; n_units = sample
      * count, unit_sum = Σ signed samples, features = [mean, min, max,
      * rate, 0...]. */
    def decodeWav(content: Array[Byte]): (Long, Long, Array[Float]) = {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(content))
      try {
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16, s"expected PCM-16, got $fmt")
        val raw = in.readAllBytes()
        val bigEndian = fmt.isBigEndian
        var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
        val n = raw.length / 2
        var i = 0
        while (i < n) {
          val lo = raw(2 * i).toInt; val hi = raw(2 * i + 1).toInt
          val s = if (bigEndian) (lo << 8) | (hi & 0xff) else (hi << 8) | (lo & 0xff)
          sum += s; if (s < mn) mn = s; if (s > mx) mx = s
          i += 1
        }
        (n.toLong, sum, Array(
          if (n == 0) 0f else sum.toFloat / n, mn.toFloat, mx.toFloat,
          fmt.getSampleRate, 0f, 0f, 0f, 0f))
      } finally in.close()
    }

    /** Video STUB feature: 8-bin byte histogram of the raw payload. */
    def byteHistogram(content: Array[Byte]): Array[Float] = {
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

  /** Encoders for the synthetic corpus adapter and tests — real
    * containers produced with public formats only: PNG through
    * `ImageIO.write`, WAV through the canonical 44-byte RIFF header. */
  object Encode {

    /** pixels is row-major (y*w + x), 0xRRGGBB ints. */
    def png(w: Int, h: Int, pixels: Array[Int]): Array[Byte] = {
      require(pixels.length == w * h, s"png: ${pixels.length} pixels for ${w}x$h")
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, w, h, pixels, 0, w)
      val bos = new ByteArrayOutputStream()
      require(ImageIO.write(img, "png", bos), "no PNG writer registered")
      bos.toByteArray
    }

    /** Canonical mono PCM-16 little-endian WAV: fixed 44-byte header +
      * 2 bytes per sample — byte length is deterministic (44 + 2n),
      * which keeps `n_bytes` oracle-checkable for audio rows. */
    def wavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val out = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
      out.put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(out.putShort)
      out.array()
    }
  }

  /** The deterministic synthetic payload formulas, shared verbatim by
    * the adapter below and the DuckDB oracle in MultimodalQueries —
    * PNG/WAV are lossless, so decoded sums must reproduce them
    * exactly after a real round trip through the container format.
    * Image: 8×8 RGB, channel k (k = (y*8+x)*3 + c, c = R,G,B) has
    * value (id*7 + k*13) % 256. Audio: 64 PCM-16 samples,
    * s_j = ((id*11 + j*17) % 4096) − 2048, at 8 kHz.
    */
  object Synth {
    val ImgW = 8; val ImgH = 8; val NSamples = 64; val SampleRate = 8000

    def imagePixels(id: Long): Array[Int] =
      Array.tabulate(ImgW * ImgH) { p =>
        def ch(c: Int): Int = (((id * 7 + (p * 3 + c) * 13) % 256).toInt + 256) % 256
        (ch(0) << 16) | (ch(1) << 8) | ch(2)
      }

    def audioSamples(id: Long): Array[Short] =
      Array.tabulate(NSamples)(j => ((((id * 11 + j * 17) % 4096) + 4096) % 4096 - 2048).toShort)
  }

  /** Batched feature extraction: codec constructed once per partition,
    * content dropped from the output (features are small — the big
    * binary column must not survive past the decode stage). */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      val codec = new JvmMediaCodec
      rows.map { r =>
        val (nUnits, unitSum, features) = codec.decode(r.meta.media_type, r.content)
        MediaFeatures(
          r.media_id, r.meta.media_type, r.content.length.toLong,
          codec.checksum(r.content), nUnits, unitSum, features)
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

  /** Real image resize for image-typed rows: ImageIO decode →
    * nearest-neighbor resample (explicit pixel loop, deterministic
    * across JVMs — no AWT rendering-pipeline variance) → PNG
    * re-encode. Per-partition codec reuse; binary in / binary out so
    * the stage chains with [[extractFeatures]] or a sink. */
  def resize(ds: Dataset[MediaRecord], outW: Int, outH: Int): Dataset[ResizedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.collect {
        case r if r.meta.media_type == "image" && r.content.nonEmpty =>
          val img = ImageIO.read(new ByteArrayInputStream(r.content))
          require(img != null, s"image decode failed for media ${r.media_id}")
          val inW = img.getWidth; val inH = img.getHeight
          val out = new Array[Int](outW * outH)
          var y = 0
          while (y < outH) {
            val sy = (y.toLong * inH / outH).toInt
            var x = 0
            while (x < outW) {
              out(y * outW + x) = img.getRGB((x.toLong * inW / outW).toInt, sy) & 0xffffff
              x += 1
            }
            y += 1
          }
          ResizedMedia(r.media_id, outW, outH, Encode.png(outW, outH, out))
      }
    }
  }

  /** Real-container test-corpus adapter: id % 3 picks the modality;
    * image rows carry an actual PNG and audio rows an actual WAV (both
    * from the [[Synth]] formulas), video rows carry the raw text bytes
    * (stub payload — see frameSample). Encode runs per partition, no
    * shuffle. */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          (id % 3) match {
            case 0 => MediaRecord(id, MediaMeta("image", Synth.ImgW, Synth.ImgH, 0L),
              Encode.png(Synth.ImgW, Synth.ImgH, Synth.imagePixels(id)))
            case 1 => MediaRecord(id, MediaMeta("audio", 0, 0,
              Synth.NSamples * 1000L / Synth.SampleRate),
              Encode.wavPcm16(Synth.audioSamples(id), Synth.SampleRate))
            case _ => MediaRecord(id, MediaMeta("video", 64, 64, text.length * 40L),
              text.getBytes("UTF-8"))
          }
        }
      }
  }

  /** Wrap any table into the media schema with a deterministic fake
    * payload (bytes of a text column) — the lightweight adapter for
    * schema/plumbing tests; [[syntheticMedia]] is the real-codec one. */
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
