package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
