package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** GeoTIFF raster ingestion (SURVEY.md §2 F4/N1–N5 input bridge; ref:
  * `raster_stats.py` / `elevation_profile.py` read GeoTIFF via
  * rasterio): a single-band float32 GeoTIFF file → the
  * `(cell_x, cell_y, lon, lat, value)` cell table every raster
  * operator here consumes. Pure JVM, public formats only — baseline
  * TIFF 6.0 (Adobe spec) plus the two GeoTIFF georeferencing tags
  * (ModelPixelScale 33550, ModelTiepoint 33922, OGC GeoTIFF 1.1).
  *
  * Scale shape: the driver reads ONLY the header/IFD (a few KB — tag
  * table, strip offset/length arrays, geo transform), then each STRIP
  * becomes one executor task that seeks to its own byte range and
  * decodes its rows — the windowed read rasterio users expect, so a
  * continent-sized raster ingests in parallel without any single
  * process touching the full pixel payload. Strips are the natural
  * TIFF window; `rowsPerStrip` at write time is the parallelism knob.
  *
  * The spec cross-validates both directions against the JDK's OWN
  * independent TIFF parser (`javax.imageio`, TIFF plugin since
  * Java 9): files this writer emits decode to identical pixels there,
  * so reader and writer cannot share a compensating bug.
  */
object GeoTiff {

  /** Georeferencing + layout, from the IFD only. `scaleX`/`scaleY` are
    * degrees (or meters) per pixel; (`originX`, `originY`) is the
    * world position of the raster's top-left CORNER. */
  case class RasterMeta(
      width: Int, height: Int, rowsPerStrip: Int,
      stripOffsets: Array[Long], stripByteCounts: Array[Long],
      scaleX: Double, scaleY: Double, originX: Double, originY: Double,
      littleEndian: Boolean)

  // TIFF tag ids (TIFF 6.0 §8; GeoTIFF 1.1 §7.2)
  private val TImageWidth = 256; private val TImageLength = 257
  private val TBitsPerSample = 258; private val TCompression = 259
  private val TPhotometric = 262; private val TStripOffsets = 273
  private val TSamplesPerPixel = 277; private val TRowsPerStrip = 278
  private val TStripByteCounts = 279; private val TSampleFormat = 339
  private val TModelPixelScale = 33550; private val TModelTiepoint = 33922

  /** Parse the header + IFD of a single-band uncompressed float32
    * GeoTIFF through a positioned-read function (`pread(offset, len)`)
    * — a handful of KB-sized reads regardless of raster size, so the
    * driver never pulls pixel bytes even when the IFD sits at the end
    * of a terabyte file (where this writer and most others put it).
    * Loud on anything outside the supported profile. */
  def readMeta(pread: (Long, Int) => Array[Byte]): RasterMeta = {
    val head = pread(0, 8)
    require(head.length >= 8, "geotiff: truncated header")
    val le = (head(0), head(1)) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _ => throw new IllegalArgumentException("geotiff: not a TIFF (bad byte-order mark)")
    }
    def buf(off: Long, len: Int): ByteBuffer = {
      val b = ByteBuffer.wrap(pread(off, len))
      b.order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      b
    }
    def wrap(bytes: Array[Byte], off: Int): ByteBuffer = {
      val b = ByteBuffer.wrap(bytes, off, bytes.length - off)
      b.order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      b
    }
    require(wrap(head, 2).getShort == 42, "geotiff: bad TIFF magic")
    val ifdOff = wrap(head, 4).getInt.toLong & 0xffffffffL
    val nEntries = buf(ifdOff, 2).getShort & 0xffff
    val entryBytes = pread(ifdOff + 2, nEntries * 12)
    var tags = Map.empty[Int, (Int, Long, Array[Byte])] // tag -> (type, count, 4 value bytes)
    (0 until nEntries).foreach { i =>
      val e = wrap(entryBytes, i * 12)
      val tag = e.getShort & 0xffff
      val typ = e.getShort & 0xffff
      val count = e.getInt.toLong & 0xffffffffL
      tags += tag -> ((typ, count, java.util.Arrays.copyOfRange(entryBytes, i * 12 + 8, i * 12 + 12)))
    }
    def scalarFrom(b: ByteBuffer, typ: Int): Long = typ match {
      case 3 => (b.getShort & 0xffff).toLong                       // SHORT
      case 4 => b.getInt.toLong & 0xffffffffL                      // LONG
      case other => throw new IllegalArgumentException(s"geotiff: scalar type $other")
    }
    def scalar(tag: Int, default: Option[Long] = None): Long =
      tags.get(tag).map { case (typ, _, v) => scalarFrom(wrap(v, 0), typ) }
        .orElse(default)
        .getOrElse(throw new IllegalArgumentException(s"geotiff: missing tag $tag"))
    def longArray(tag: Int): Array[Long] = {
      val (typ, count, v) = tags.getOrElse(tag,
        throw new IllegalArgumentException(s"geotiff: missing tag $tag"))
      val elemLen = if (typ == 3) 2 else 4
      val b =
        if (count * elemLen <= 4) wrap(v, 0)
        else buf(wrap(v, 0).getInt.toLong & 0xffffffffL, (count * elemLen).toInt)
      Array.fill(count.toInt)(scalarFrom(b, typ))
    }
    def doubleArray(tag: Int): Array[Double] = {
      val (typ, count, v) = tags.getOrElse(tag,
        throw new IllegalArgumentException(s"geotiff: missing tag $tag"))
      require(typ == 12, s"geotiff: tag $tag must be DOUBLE, got type $typ")
      // 8-byte doubles never fit inline
      val b = buf(wrap(v, 0).getInt.toLong & 0xffffffffL, count.toInt * 8)
      Array.fill(count.toInt)(b.getDouble)
    }
    require(scalar(TCompression, Some(1L)) == 1L, "geotiff: only uncompressed (1) supported")
    require(scalar(TBitsPerSample, Some(32L)) == 32L, "geotiff: only 32-bit samples supported")
    require(scalar(TSampleFormat, Some(3L)) == 3L, "geotiff: only IEEE float (3) supported")
    require(scalar(TSamplesPerPixel, Some(1L)) == 1L, "geotiff: only single-band supported")
    val w = scalar(TImageWidth).toInt
    val h = scalar(TImageLength).toInt
    val rps = scalar(TRowsPerStrip, Some(h.toLong)).toInt
    val scale = doubleArray(TModelPixelScale)
    val tie = doubleArray(TModelTiepoint)
    require(scale.length >= 2, "geotiff: ModelPixelScale needs >= 2 values")
    require(tie.length >= 6, "geotiff: ModelTiepoint needs >= 6 values")
    // tiepoint maps raster (i, j) -> world (x, y); profile requires the
    // common corner-anchored form (i = j = 0)
    require(tie(0) == 0.0 && tie(1) == 0.0, "geotiff: only corner tiepoints supported")
    RasterMeta(w, h, rps, longArray(TStripOffsets), longArray(TStripByteCounts),
      scale(0), scale(1), tie(3), tie(4), le)
  }

  /** Distributed cell-table import: header parsed once on the driver,
    * one task per strip, each seeking to its own byte range. Columns:
    * `cell_x int, cell_y int, lon double, lat double, value double`
    * with (lon, lat) the CELL-CENTER world coordinates
    * (origin + (idx + 0.5) · scale; y runs south from originY, the
    * GeoTIFF raster-space convention). */
  def cells(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    val meta = try {
      readMeta { (off, len) =>
        val out = new Array[Byte](len)
        in.readFully(off, out)
        out
      }
    } finally in.close()
    val strips = meta.stripOffsets.zip(meta.stripByteCounts).zipWithIndex.map {
      case ((off, len), i) => (i, off, len)
    }.toSeq
    val uri = p.toUri.toString
    val (w, rps, sx, sy, ox, oy, le) =
      (meta.width, meta.rowsPerStrip, meta.scaleX, meta.scaleY,
        meta.originX, meta.originY, meta.littleEndian)
    // ship the DRIVER's session Hadoop conf to the tasks (Configuration
    // is a Writable; SerializableWritable is the public DeveloperApi
    // wrapper) — a bare `new Configuration()` on the executor drops
    // every spark.hadoop.* override (S3 credentials/endpoints, fs
    // impls) that made the driver-side header read succeed, so the
    // same path could fail or resolve to a DIFFERENT filesystem mid-job
    val confSer = new org.apache.spark.SerializableWritable(
      spark.sessionState.newHadoopConf())
    import spark.implicits._
    spark.sparkContext.parallelize(strips, strips.length)
      .flatMap { case (stripIdx, off, len) =>
        val sp = new Path(new java.net.URI(uri))
        val sfs = sp.getFileSystem(confSer.value)
        val raw = new Array[Byte](len.toInt)
        val sin = sfs.open(sp)
        try sin.readFully(off, raw) finally sin.close()
        val bb = ByteBuffer.wrap(raw)
        bb.order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
        val nPx = len.toInt / 4
        val y0 = stripIdx * rps
        (0 until nPx).iterator.map { k =>
          val x = k % w; val y = y0 + k / w
          (x, y,
            ox + (x + 0.5) * sx, oy - (y + 0.5) * sy,
            bb.getFloat(k * 4).toDouble)
        }
      }
      .toDF("cell_x", "cell_y", "lon", "lat", "value")
  }

  /** Single-band float32 GeoTIFF writer (driver-side — the fixture /
    * small-export half; a raster EXPORT at scale would write one tile
    * file per task). Little-endian, uncompressed, strip layout with
    * `rowsPerStrip` as the read-parallelism knob, ModelPixelScale +
    * corner ModelTiepoint for georeferencing. `values` is row-major
    * (y * width + x). */
  def write(
      values: Array[Float], width: Int, height: Int, rowsPerStrip: Int,
      scaleX: Double, scaleY: Double, originX: Double, originY: Double): Array[Byte] = {
    require(values.length == width * height,
      s"geotiff: ${values.length} values for ${width}x$height")
    val nStrips = (height + rowsPerStrip - 1) / rowsPerStrip
    val stripByteCounts = Array.tabulate(nStrips) { s =>
      val rows = math.min(rowsPerStrip, height - s * rowsPerStrip)
      rows * width * 4
    }
    val dataStart = 8
    val stripOffsets = stripByteCounts.scanLeft(dataStart)(_ + _).dropRight(1)
    val arraysStart = dataStart + stripByteCounts.sum
    // external arrays: strip offsets, strip byte counts (LONG each),
    // pixel scale (3 DOUBLE), tiepoint (6 DOUBLE)
    val offStripOffsets = arraysStart
    val offStripCounts = offStripOffsets + 4 * nStrips
    val offScale = offStripCounts + 4 * nStrips
    val offTie = offScale + 3 * 8
    val ifdOffset = offTie + 6 * 8
    val nEntries = 12
    val total = ifdOffset + 2 + nEntries * 12 + 4
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOffset)
    values.foreach(bb.putFloat)
    stripOffsets.foreach(bb.putInt)
    stripByteCounts.foreach(bb.putInt)
    bb.putDouble(scaleX).putDouble(scaleY).putDouble(0.0)
    Seq(0.0, 0.0, 0.0, originX, originY, 0.0).foreach(bb.putDouble)
    // IFD: entry = tag(2) type(2) count(4) value/offset(4); SHORT
    // scalars sit in the low bytes of the value field (little-endian)
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      bb.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      if (typ == 3 && count == 1) bb.putShort(value.toShort).putShort(0)
      else bb.putInt(value)
    }
    bb.putShort(nEntries.toShort)
    entry(TImageWidth, 4, 1, width)
    entry(TImageLength, 4, 1, height)
    entry(TBitsPerSample, 3, 1, 32)
    entry(TCompression, 3, 1, 1)
    entry(TPhotometric, 3, 1, 1) // BlackIsZero
    entry(TStripOffsets, 4, nStrips,
      if (nStrips == 1) stripOffsets(0) else offStripOffsets)
    entry(TSamplesPerPixel, 3, 1, 1)
    entry(TRowsPerStrip, 4, 1, rowsPerStrip)
    entry(TStripByteCounts, 4, nStrips,
      if (nStrips == 1) stripByteCounts(0) else offStripCounts)
    entry(TSampleFormat, 3, 1, 3) // IEEE float
    entry(TModelPixelScale, 12, 3, offScale)
    entry(TModelTiepoint, 12, 6, offTie)
    bb.putInt(0) // no next IFD
    bb.array()
  }
}
