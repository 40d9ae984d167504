package graft

import java.io.ByteArrayInputStream
import java.nio.file.Files

import javax.imageio.ImageIO
import javax.imageio.plugins.tiff.TIFFDirectory

import graft.sources.GeoTiff

class GeoTiffSpec extends SparkSpec {

  private val W = 13; private val H = 9 // deliberately not strip-aligned
  private def value(x: Int, y: Int): Float = ((x * 7 + y * 13) % 100).toFloat
  private def fixture: Array[Byte] = GeoTiff.write(
    Array.tabulate(W * H)(k => value(k % W, k / W)), W, H, rowsPerStrip = 4,
    scaleX = 0.5, scaleY = 0.25, originX = 100.0, originY = -20.0)

  test("writer bytes parse back through readMeta") {
    val bytes = fixture
    val meta = GeoTiff.readMeta((off, len) =>
      java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + len))
    assert(meta.width == W && meta.height == H && meta.rowsPerStrip == 4)
    assert(meta.stripOffsets.length == 3 && meta.stripByteCounts.length == 3)
    assert(meta.stripByteCounts.toSeq == Seq(4 * W * 4, 4 * W * 4, 1 * W * 4))
    assert(meta.scaleX == 0.5 && meta.scaleY == 0.25)
    assert(meta.originX == 100.0 && meta.originY == -20.0)
  }

  test("the JDK's independent TIFF parser decodes identical pixels and geo tags") {
    // javax.imageio ships its own TIFF plugin (no code shared with
    // GeoTiff.scala) — if it reads our bytes back bit-equal, writer and
    // reader here cannot be hiding a compensating format bug
    val bytes = fixture
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    val readers = ImageIO.getImageReaders(iis)
    assert(readers.hasNext, "JDK TIFF reader missing")
    val reader = readers.next()
    reader.setInput(iis)
    val raster =
      if (reader.canReadRaster) reader.readRaster(0, null)
      else reader.read(0).getRaster
    assert(raster.getWidth == W && raster.getHeight == H)
    for (y <- 0 until H; x <- 0 until W)
      assert(raster.getSampleFloat(x, y, 0) == value(x, y), s"pixel ($x,$y)")
    val dir = TIFFDirectory.createFromMetadata(reader.getImageMetadata(0))
    assert(dir.getTIFFField(33550).getAsDoubles.take(2).toSeq == Seq(0.5, 0.25))
    assert(dir.getTIFFField(33922).getAsDoubles.slice(3, 5).toSeq == Seq(100.0, -20.0))
  }

  test("cells imports every strip distributed with correct world coordinates") {
    val dir = Files.createTempDirectory("graft-geotiff")
    val path = dir.resolve("r.tif")
    Files.write(path, fixture)
    val got = GeoTiff.cells(spark, path.toString).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got.size == W * H) // all three strips, including the short tail strip
    for (y <- 0 until H; x <- 0 until W) {
      val (lon, lat, v) = got((x, y))
      assert(v == value(x, y).toDouble)
      assert(lon == 100.0 + (x + 0.5) * 0.5 && lat == -20.0 - (y + 0.5) * 0.25)
    }
  }

  test("unsupported profiles fail loudly") {
    val bytes = fixture
    def meta(b: Array[Byte]) = GeoTiff.readMeta((off, len) =>
      java.util.Arrays.copyOfRange(b, off.toInt, off.toInt + len))
    val notTiff = bytes.clone(); notTiff(0) = 'X'.toByte
    assert(intercept[IllegalArgumentException](meta(notTiff))
      .getMessage.contains("byte-order mark"))
    // flip the Compression entry (tag 259, SHORT 1) to 5 (LZW): the IFD
    // is tag-sorted, entry layout is tag(2) type(2) count(4) value(4)
    val lzw = bytes.clone()
    val ifdOff = java.nio.ByteBuffer.wrap(bytes, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val n = java.nio.ByteBuffer.wrap(bytes, ifdOff, 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getShort
    val entryOff = (0 until n).map(i => ifdOff + 2 + i * 12).find { e =>
      (java.nio.ByteBuffer.wrap(bytes, e, 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getShort & 0xffff) == 259
    }.get
    lzw(entryOff + 8) = 5.toByte
    assert(intercept[IllegalArgumentException](meta(lzw))
      .getMessage.contains("uncompressed"))
  }
}
