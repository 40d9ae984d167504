package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC container ingestion — the CommonCrawl input format (ISO
  * 28500 / IIPC WARC 1.1; ref's web-corpus counterpart is the
  * crawl-archive front end every WET-style extraction starts from;
  * SURVEY.md §2 W1). A `.warc.gz` crawl file is a CONCATENATION of
  * gzip members, one WARC record per member, so readers can skip
  * records without decompressing the file as one stream; each record
  * is CRLF header lines, a `Content-Length`-framed payload, and a
  * blank-line separator. `response` records carry an HTTP/1.1
  * message whose body is the page the pipeline wants.
  *
  * Scale shape: the driver reads NOTHING but the file listing —
  * `spark.read.format("binaryFile")` assigns each crawl file to one
  * executor task (Spark packs small files into shared tasks), and
  * every task decompresses + parses only its own file, streaming
  * record-by-record (`java.util.zip.GZIPInputStream` walks
  * concatenated members natively). CommonCrawl sizes WARC files at
  * ~1 GB exactly so that file-per-task is the right parallel grain: a
  * 100 TB crawl is ~100k files → ~100k independent tasks with zero
  * shuffle. Mid-member splits are impossible by the format's design;
  * a larger-than-memory file wants the member-boundary offset index
  * (the `warc.paths`/cdx pattern) — out of profile here, documented
  * rather than half-supported (binaryFile refuses files > 2 GB
  * loudly).
  *
  * The writer half ([[responseRecord]]/[[warcinfoRecord]]/
  * [[writeFile]]) exists so gates and specs can synthesize REAL
  * multi-member crawl files from deterministic content and prove the
  * reader through actual gzip/framing round trips (the GeoTiff/M1
  * synthesize-then-decode posture) — reader and writer cannot share
  * a compensating bug because the spec also re-reads writer output
  * through the JDK's own gzip decoder and asserts the member count
  * and framing bytes directly. */
object Warc {

  /** One parsed WARC record: `url` is WARC-Target-URI ('' when
    * absent, e.g. warcinfo), `http_status`/`mime`/`body` are parsed
    * from the HTTP message of `response` records (status -1 and raw
    * payload passthrough otherwise). `record_no` is the record's
    * ordinal within its file — with `file` it is a stable unique key. */
  case class WarcRow(
      file: String, record_no: Int, warc_type: String, url: String,
      warc_date: String, http_status: Int, mime: String, body: Array[Byte])

  private val CRLF = "\r\n"

  // ---------------------------------------------------------------
  // reader
  // ---------------------------------------------------------------

  /** (path, content) binary-file rows → parsed records: the shared
    * per-task parse behind the batch and streaming readers. */
  private def recordsFrom(files: DataFrame): DataFrame = {
    import files.sparkSession.implicits._
    files
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) => parseAll(file, bytes) }
      .toDF()
  }

  private def responsesFrom(records: DataFrame): DataFrame =
    records
      .where(col("warc_type") === "response")
      .select(col("file"), col("record_no"), col("url"),
        col("http_status"), col("mime"),
        // body bytes are UTF-8 page text by the response contract
        col("body").cast("string").as("html"))

  /** All records of every WARC file under `path` (glob ok; `.warc.gz`
    * multi-member or uncompressed `.warc`). One executor task per
    * file; rows ∝ records. */
  def records(spark: SparkSession, path: String): DataFrame =
    recordsFrom(spark.read.format("binaryFile").load(path))

  /** The crawl front end's working view: `response` records only,
    * HTTP message parsed, body decoded as UTF-8 text — (file,
    * record_no, url, http_status, mime, html). Feeds
    * [[graft.operators.Html.htmlExtract]] / [[graft.operators.Html
    * .htmlLinks]] directly. */
  def responses(spark: SparkSession, path: String): DataFrame =
    responsesFrom(records(spark, path))

  /** STREAMING crawl ingest: `readStream` over a WARC landing
    * directory — each micro-batch picks up newly landed `.warc.gz`
    * files (the file source tracks seen files; nothing is rescanned),
    * parses them through the SAME per-task record walk as the batch
    * reader, and emits response rows ready for the stateless
    * extraction twins ([[graft.streaming.StreamOps.htmlExtractStream]]
    * and friends). Map-only append mode: no watermark, no state — the
    * crawl lake's front door at any arrival rate. `maxFilesPerTrigger`
    * bounds a micro-batch (a CommonCrawl-sized file is ~1 GB; the
    * default 16 keeps a batch under one executor-wave on a small
    * cluster — size to your executor count). */
  def responseStream(
      spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 16): DataFrame = {
    // the binaryFile schema is fixed; file streams require it explicit
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    responsesFrom(recordsFrom(
      spark.readStream.format("binaryFile")
        .schema(schema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .load(path)))
  }

  /** Parse one file's bytes into its records. Decompresses when the
    * content is gzip (magic 1f 8b); GZIPInputStream consumes
    * concatenated members transparently, and the WARC grammar below
    * is framing-exact (Content-Length bytes, CRLF CRLF separator), so
    * the member layout cannot leak into parsed content. */
  private[graft] def parseAll(file: String, bytes: Array[Byte]): Iterator[WarcRow] = {
    val raw: InputStream = new ByteArrayInputStream(bytes)
    val in = if (bytes.length >= 2 &&
        (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
      new GZIPInputStream(raw, 1 << 16) else raw
    new Iterator[WarcRow] {
      private var nextRow: WarcRow = _
      private var n = 0
      private def advance(): Unit = {
        nextRow = null
        var line = readLine(in)
        // tolerate blank separator lines between records
        while (line != null && line.isEmpty) line = readLine(in)
        if (line != null) {
          require(line.startsWith("WARC/"),
            s"warc: expected record header in $file, got '$line'")
          val headers = readHeaders(in)
          val len = headers.getOrElse("content-length",
            throw new IllegalArgumentException(
              s"warc: record without Content-Length in $file")).trim.toInt
          val payload = readFully(in, len)
          val typ = headers.getOrElse("warc-type", "")
          val url = headers.getOrElse("warc-target-uri", "")
          val date = headers.getOrElse("warc-date", "")
          val row = if (typ == "response") {
            val (status, mime, body) = parseHttp(payload)
            WarcRow(file, n, typ, url, date, status, mime, body)
          } else WarcRow(file, n, typ, url, date, -1, "", payload)
          n += 1
          nextRow = row
        }
      }
      advance()
      override def hasNext: Boolean = nextRow != null
      override def next(): WarcRow = {
        val r = nextRow; advance(); r
      }
    }
  }

  /** Split an `application/http; msgtype=response` payload into
    * (status, content-type mime, body bytes). Lenient on non-HTTP
    * payloads: (-1, '', payload). */
  private def parseHttp(payload: Array[Byte]): (Int, String, Array[Byte]) = {
    val sep = indexOfCrlfCrlf(payload)
    val headText = new String(payload, 0, if (sep < 0) payload.length else sep, UTF_8)
    val lines = headText.split("\r\n")
    if (lines.isEmpty || !lines(0).startsWith("HTTP/")) (-1, "", payload)
    else {
      val status = lines(0).split(" ", 3) match {
        case Array(_, code, _*) if code.forall(_.isDigit) => code.toInt
        case _ => -1
      }
      val mime = lines.drop(1).collectFirst {
        case l if l.toLowerCase.startsWith("content-type:") =>
          l.substring("content-type:".length).trim
      }.getOrElse("")
      val body = if (sep < 0) Array.empty[Byte]
        else java.util.Arrays.copyOfRange(payload, sep + 4, payload.length)
      (status, mime, body)
    }
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** One CRLF-terminated line as UTF-8 (CR LF stripped); null at EOF
    * before any byte. Bare LF tolerated (robust-crawl posture). */
  private def readLine(in: InputStream): String = {
    val buf = new ByteArrayOutputStream(128)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      buf.write(c)
      c = in.read()
    }
    val s = buf.toByteArray
    val end = if (s.nonEmpty && s(s.length - 1) == '\r') s.length - 1 else s.length
    new String(s, 0, end, UTF_8)
  }

  /** Header lines until the blank separator → lowercased-name map. */
  private def readHeaders(in: InputStream): Map[String, String] = {
    val m = Map.newBuilder[String, String]
    var line = readLine(in)
    while (line != null && line.nonEmpty) {
      val i = line.indexOf(':')
      if (i > 0) m += (line.substring(0, i).trim.toLowerCase ->
        line.substring(i + 1).trim)
      line = readLine(in)
    }
    m.result()
  }

  private def readFully(in: InputStream, len: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    var off = 0
    while (off < len) {
      val r = in.read(out, off, len - off)
      if (r < 0) throw new EOFException(
        s"warc: truncated payload (wanted $len bytes, got $off)")
      off += r
    }
    out
  }

  // ---------------------------------------------------------------
  // writer (gate/spec synthesis)
  // ---------------------------------------------------------------

  /** The uncompressed bytes of one `response` record wrapping `html`
    * in a minimal HTTP/1.1 200 message. */
  def responseRecord(url: String, html: String,
                     date: String = "2026-01-01T00:00:00Z"): Array[Byte] = {
    val body = html.getBytes(UTF_8)
    val http = new ByteArrayOutputStream()
    http.write(("HTTP/1.1 200 OK" + CRLF +
      "Content-Type: text/html; charset=utf-8" + CRLF +
      s"Content-Length: ${body.length}" + CRLF + CRLF).getBytes(UTF_8))
    http.write(body)
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> url,
      "WARC-Date" -> date,
      "Content-Type" -> "application/http; msgtype=response"), http.toByteArray)
  }

  /** The uncompressed bytes of the file-leading `warcinfo` record
    * (readers must skip it — coverage, not decoration). */
  def warcinfoRecord(filename: String): Array[Byte] =
    record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "Content-Type" -> "application/warc-fields"),
      s"software: graft$CRLF".getBytes(UTF_8))

  private def record(headers: Seq[(String, String)], payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(("WARC/1.0" + CRLF).getBytes(UTF_8))
    headers.foreach { case (k, v) => out.write(s"$k: $v$CRLF".getBytes(UTF_8)) }
    out.write(s"Content-Length: ${payload.length}$CRLF$CRLF".getBytes(UTF_8))
    out.write(payload)
    out.write((CRLF + CRLF).getBytes(UTF_8))
    out.toByteArray
  }

  /** Gzip one record as its OWN member (the CommonCrawl layout). */
  def gzipMember(recordBytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(out)
    gz.write(recordBytes)
    gz.close()
    out.toByteArray
  }

  /** A complete multi-member `.warc.gz` file: warcinfo member + one
    * member per (url, html) response. */
  def writeFile(pages: Seq[(String, String)], filename: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(gzipMember(warcinfoRecord(filename)))
    pages.foreach { case (url, html) =>
      out.write(gzipMember(responseRecord(url, html)))
    }
    out.toByteArray
  }

  /** DISTRIBUTED crawl-file writer: one multi-member `.warc.gz` per
    * partition of `df`, each record streamed straight to the target
    * filesystem through the Hadoop FS API (the dwcArchiveFull
    * posture: executor tasks write, the driver ships only its session
    * Hadoop conf — so the same code lands on HDFS/S3); no task ever
    * buffers more than one record. Partition the input to the ~1 GB
    * CommonCrawl file grain upstream (`repartition`); sort within
    * partitions first if byte-deterministic files matter (gates do). */
  def writeFiles(df: DataFrame, urlCol: String, htmlCol: String,
                 path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    fs.delete(root, true)
    fs.mkdirs(root)
    val confSer = new org.apache.spark.SerializableWritable(conf)
    df.select(col(urlCol).cast("string"), col(htmlCol).cast("string"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val p = new Path(path, f"part-$pid%05d.warc.gz")
          val pfs = p.getFileSystem(confSer.value)
          val out = pfs.create(p, true)
          try {
            out.write(gzipMember(warcinfoRecord(p.getName)))
            it.foreach { r =>
              out.write(gzipMember(responseRecord(r.getString(0), r.getString(1))))
            }
          } finally out.close()
        }
      }
  }
}
