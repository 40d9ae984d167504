package graft

import org.apache.spark.sql.SparkSession

/** Session factory with graft's recommended configuration: the graft
  * SQL functions installed via `spark.sql.extensions`, UTC session
  * time, and AQE left on (Spark 4 default) for runtime re-planning.
  *
  * `getOrCreate` semantics apply: if a session already exists in the
  * JVM it is returned as-is — call
  * [[graft.functions.GraftFunctions.register]] on it to add the SQL
  * functions imperatively.
  */
object GraftSession {
  def create(
      master: String = "local[*]",
      appName: String = "graft",
      shufflePartitions: Option[Int] = None): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.extensions", classOf[graft.functions.GraftExtensions].getName)
      .config("spark.sql.session.timeZone", "UTC")
    shufflePartitions.foreach(n => b.config("spark.sql.shuffle.partitions", n.toString))
    val spark = b.getOrCreate()
    // cover the pre-existing-session path too
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
