package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Sources and sinks (SURVEY.md §3), mirroring the reference's import
  * plugins (`core/plugins/loaders/`: CSV with declared column types,
  * JSON, occurrence tables) and exporters (Darwin-Core CSV archive,
  * JSON API files — `exporters/`).
  *
  * Readers always take an EXPLICIT schema: schema inference is a full
  * extra pass over the data (fatal at 100 TB) and silently drifts
  * types between runs. FAILFAST surfaces bad records at read time the
  * way the reference's import validators do.
  */
object Readers {

  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "FAILFAST")
      .csv(path)

  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC read — same partition-discovery/pruning semantics as parquet
    * (ORC is the other built-in columnar format; G8 proves the
    * write→reread→aggregate path on it). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** G6 read side — consume a Darwin-Core archive THROUGH its
    * descriptor: parse `meta.xml` for the core data-file locations and
    * read exactly those (schema still explicit — the descriptor names
    * terms, the caller declares types). A wrong descriptor therefore
    * reads nothing/garbage and fails the gate, which is the point. */
  def dwcArchive(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta.xml")
    val fs = metaPath.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(metaPath)
    val meta = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val locations = "<location>([^<]+)</location>".r
      .findAllMatchIn(meta).map(_.group(1)).toSeq
    require(locations.nonEmpty, s"dwcArchive: no <location> entries in $metaPath")
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "FAILFAST")
      .csv(locations.map(l => s"$path/$l"): _*)
  }
}

/** Sink helpers: every writer is a plain DataFrame write so it scales
  * with the partition count; layout choices (partition columns, single
  * vs many files) are the caller's contract. */
object Writers {

  /** Hive-style partitioned parquet — the canonical lake layout;
    * `partitionBy` keys become directory-level partition pruning for
    * every downstream reader. */
  def partitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Hive-style partitioned ORC — identical layout contract to
    * [[partitionedParquet]] on Spark's other built-in columnar
    * format. */
  def partitionedOrc(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).orc(path)

  /** Darwin-Core archive body: headered CSV (the reference's DwC
    * exporter writes occurrence.csv + meta.xml; the data file is the
    * Spark-scale part). */
  def dwcArchive(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("emptyValue", "")
      .csv(path)

  /** JSON-lines API export (one JSON document per row), the bulk
    * equivalent of the reference's per-entity JSON detail files. */
  def jsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Bucketed (and bucket-sorted) managed table: pre-shuffles ONCE at
    * write time so every later equi-join/aggregation on `bucketCols`
    * between tables bucketed the same way runs with NO exchange — the
    * co-located-join layout for fact↔fact joins that would otherwise
    * shuffle 100 TB per query. See BucketingSpec for the plan proof. */
  def bucketedTable(
      df: DataFrame, table: String, bucketCols: Seq[String], nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Range-CLUSTERED parquet: repartition by range on `clusterCols`
    * and sort within partitions before writing, so each output file
    * covers a narrow key range and its parquet row-group min/max
    * statistics become effective — a range-predicate scan then skips
    * whole row groups (files) instead of reading the lake
    * (ClusterLayoutSpec proves the skip with scan metrics: the same
    * filter reads ~1/`nFiles` of the clustered layout vs ALL rows of
    * an unclustered one). This is the sort-cluster layout move for
    * 100 TB time-series/lakehouse tables where directory partitioning
    * is too coarse; bucketing ([[bucketedTable]]) is the equi-join
    * twin, this is the range-scan one. */
  def clusteredParquet(
      df: DataFrame, path: String, clusterCols: Seq[String], nFiles: Int): Unit = {
    val cols = clusterCols.map(org.apache.spark.sql.functions.col)
    df.repartitionByRange(nFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Z-ORDER clustered parquet — the MULTI-dimension sibling of
    * [[clusteredParquet]]. Lexicographic range clustering makes only
    * its LEADING column's row-group min/max stats narrow; a filter on
    * the second dimension alone still reads the whole lake. Ordering
    * by the Morton (bit-interleaved) code of all `zCols` instead makes
    * every file cover a small HYPER-RECTANGLE of the key space, so
    * row-group stats are narrow on EVERY clustered dimension at once
    * and single- or multi-dimension range predicates both skip
    * (ZOrderLayoutSpec proves exactly the case lexicographic loses:
    * a second-dimension-only filter). The curve is the standard
    * space-filling-curve layout for multi-dim lakehouse clustering.
    *
    * Mechanics: one bounded stats pass (min/max per column — a 1-row
    * collect) quantizes each column to `64/k`-bit ranks (≤16); the
    * interleave is a pure codegen'd bitwise expression; the exchange
    * is the same single range-repartition [[clusteredParquet]] pays,
    * on the z-code. The z-code is dropped before write — layout is
    * its only product. Dates quantize via their epoch-day integer;
    * nulls rank 0. */
  def zorderedParquet(
      df: DataFrame, path: String, zCols: Seq[String], nFiles: Int): Unit = {
    df.withColumn("__zval", zvalue(df, zCols))
      .repartitionByRange(nFiles, org.apache.spark.sql.functions.col("__zval"))
      .sortWithinPartitions("__zval")
      .drop("__zval")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** The Morton z-code column for `zCols` of `df`: each column
    * min-max-quantized to `min(16, 63/k)` bits, bit b of dimension i
    * landing at interleaved position `b*k + i`. Exposed for the spec's
    * parity test against a driver-side reference interleave. */
  private[graft] def zvalue(df: DataFrame, zCols: Seq[String]): Column = {
    import org.apache.spark.sql.functions._
    require(zCols.nonEmpty, "zorder: need at least one cluster column")
    val k = zCols.size
    val bits = math.min(16, 63 / k)
    val maxQ = (1L << bits) - 1
    val nums = zCols.map { name =>
      df.schema(name).dataType match {
        // DATE has no numeric cast in Spark SQL — rank by epoch day
        case org.apache.spark.sql.types.DateType =>
          datediff(col(name), to_date(lit("1970-01-01"))).cast("double")
        case _ => col(name).cast("double")
      }
    }
    val statExprs = nums.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(c).as(s"mn$i"), max(c).as(s"mx$i")) }
    val stats = df.agg(statExprs.head, statExprs.tail: _*).head()
    val ranks = nums.zipWithIndex.map { case (c, i) =>
      // empty/all-null input: no stats → constant code (layout moot)
      if (stats.isNullAt(2 * i)) lit(0L) else {
      val mn = stats.getDouble(2 * i)
      val mx = stats.getDouble(2 * i + 1)
      val span = mx - mn
      if (!(span > 0)) lit(0L)
      // narrow integral domains (keys, epoch days) rank EXACTLY by
      // offset — no scaling round-off; only spans past 2^bits scale.
      // Either way the rank is TOP-ALIGNED to the full `bits` width
      // (shift by the span's unused high bits): a dimension with a
      // small domain must not fall to the low interleave positions,
      // or the wide dimension alone would decide file boundaries and
      // the layout degenerates to single-column clustering.
      else if (span <= maxQ) {
        val spanBits = 64 - java.lang.Long.numberOfLeadingZeros(
          math.max(span.toLong, 1L))
        shiftleft((coalesce(c, lit(mn)) - lit(mn)).cast("long"),
          bits - spanBits)
      }
      else least(lit(maxQ), greatest(lit(0L),
        ((coalesce(c, lit(mn)) - lit(mn)) / lit(span) * lit(maxQ.toDouble))
          .cast("long")))
      }
    }
    val terms = for {
      (q, i) <- ranks.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(q, b).bitwiseAND(lit(1L)), b * k + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Zip packaging policy for [[dwcArchiveFull]]. The CSV parts beside
    * the zips are always the queryable copy; zips are transport
    * packaging only. */
  sealed trait ZipMode
  object ZipMode {
    /** No zip artifacts at all. */
    case object Skip extends ZipMode
    /** One zip PER CSV PART, created by DISTRIBUTED executor tasks —
      * the 100 TB path: the packaging cost parallelizes with the part
      * count and the driver never streams a data byte. Each zip embeds
      * a meta.xml listing ONLY its own part, so every zip is an
      * independently consumable single-file DwC-A; the full-archive
      * meta.xml beside the zips describes the multi-part logical
      * archive as a whole. */
    case object PerPart extends ZipMode
    /** The single `archive.zip` convenience for SMALL exports: a
      * driver-side stream copy of every CSV byte — a serial tail by
      * construction (one zip = one stream), so never the default. */
    case object SingleFile extends ZipMode
  }

  /** DwC-A `meta.xml` descriptor for the given part locations — used
    * for the whole-archive descriptor (all parts) and, under
    * [[ZipMode.PerPart]], once per zip with just that zip's part. */
  private def dwcMeta(
      rowType: String, termNs: String, fields: Seq[String],
      locations: Seq[String]): String =
    s"""<archive xmlns="http://rs.tdwg.org/dwc/text/">
       |  <core encoding="UTF-8" fieldsTerminatedBy="," linesTerminatedBy="\\n"
       |        fieldsEnclosedBy="&quot;" ignoreHeaderLines="1" rowType="$rowType">
       |    <files>
       |${locations.map(l => s"      <location>$l</location>").mkString("\n")}
       |    </files>
       |    <id index="0"/>
       |${fields.zipWithIndex.map { case (f, i) =>
           s"""      <field index="$i" term="$termNs$f"/>""" }.mkString("\n")}
       |  </core>
       |</archive>
       |""".stripMargin

  /** G6 — FULL Darwin-Core archive (`exporters/dwc_archive_exporter
    * .py` emits occurrence CSV + `meta.xml` + zip): the occurrence
    * body is a distributed headered-CSV write (scales with partitions);
    * the `meta.xml` descriptor (core rowType, one `<location>` per CSV
    * part, one `<field>` per column in DataFrame order) is driver-side
    * — O(descriptor), never O(rows) — via the Hadoop FS API so the
    * same code lands on HDFS/S3. Zip packaging follows `zipMode`
    * (default [[ZipMode.PerPart]]: distributed, no serial tail). */
  def dwcArchiveFull(
      df: DataFrame, path: String,
      rowType: String = "http://rs.tdwg.org/dwc/terms/Occurrence",
      termNs: String = "http://rs.tdwg.org/dwc/terms/",
      zipMode: ZipMode = ZipMode.PerPart): Unit = {
    import org.apache.hadoop.fs.Path
    dwcArchive(df, s"$path/occurrence")
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val parts = fs.listStatus(new Path(s"$path/occurrence"))
      .map(_.getPath).filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".csv"))
      .sortBy(_.getName)
    val fields = df.schema.fieldNames
    val meta = dwcMeta(rowType, termNs, fields,
      parts.map(p => s"occurrence/${p.getName}"))
    val metaOut = fs.create(new Path(s"$path/meta.xml"), true)
    try metaOut.write(meta.getBytes("UTF-8")) finally metaOut.close()
    zipMode match {
      case ZipMode.Skip => ()
      case ZipMode.PerPart =>
        // distributed packaging: one task per part, each zipping only
        // its own file — wall-clock scales down with the part count and
        // zero data bytes pass through the driver. Each zip carries a
        // meta.xml listing ONLY its own part (a complete single-file
        // DwC-A on its own); the all-parts meta.xml written above
        // beside the zips describes the logical archive.
        val partPaths = parts.map(_.toUri.toString)
        // ship the driver's session Hadoop conf (spark.hadoop.*
        // overrides — S3 credentials, fs impls) to the tasks; a bare
        // executor-side `new Configuration()` sees only the classpath
        val confSer = new org.apache.spark.SerializableWritable(conf)
        df.sparkSession.sparkContext
          .parallelize(partPaths, math.max(partPaths.length, 1))
          .foreach { partUri =>
            val p = new Path(new java.net.URI(partUri))
            val pfs = p.getFileSystem(confSer.value)
            val zo = new java.util.zip.ZipOutputStream(
              pfs.create(new Path(p.getParent, p.getName + ".zip"), true))
            zo.setLevel(java.util.zip.Deflater.BEST_SPEED)
            try {
              zo.putNextEntry(new java.util.zip.ZipEntry("meta.xml"))
              zo.write(dwcMeta(rowType, termNs, fields,
                Seq(s"occurrence/${p.getName}")).getBytes("UTF-8"))
              zo.closeEntry()
              zo.putNextEntry(new java.util.zip.ZipEntry(s"occurrence/${p.getName}"))
              val in = pfs.open(p)
              val buf = new Array[Byte](64 * 1024)
              try {
                var n = in.read(buf)
                while (n >= 0) { if (n > 0) zo.write(buf, 0, n); n = in.read(buf) }
              } finally in.close()
              zo.closeEntry()
            } finally zo.close()
          }
      case ZipMode.SingleFile =>
        // meta.xml + every part through ONE driver-side stream: fine
        // for the small-export convenience case only (see ZipMode doc)
        val zipOut = new java.util.zip.ZipOutputStream(
          fs.create(new Path(s"$path/archive.zip"), true))
        zipOut.setLevel(java.util.zip.Deflater.BEST_SPEED)
        try {
          zipOut.putNextEntry(new java.util.zip.ZipEntry("meta.xml"))
          zipOut.write(meta.getBytes("UTF-8"))
          zipOut.closeEntry()
          val buf = new Array[Byte](64 * 1024)
          parts.foreach { p =>
            zipOut.putNextEntry(new java.util.zip.ZipEntry(s"occurrence/${p.getName}"))
            val in = fs.open(p)
            try {
              var n = in.read(buf)
              while (n >= 0) { if (n > 0) zipOut.write(buf, 0, n); n = in.read(buf) }
            } finally in.close()
            zipOut.closeEntry()
          }
        } finally zipOut.close()
    }
  }

  /** [[bucketedTable]] with an explicit data location (external table)
    * — lets callers keep bucket files out of the session warehouse dir
    * (the catalog entry still carries the bucket spec downstream joins
    * rely on). */
  def bucketedExternal(
      df: DataFrame, table: String, path: String,
      bucketCols: Seq[String], nBuckets: Int): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
  }
}
