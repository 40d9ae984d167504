package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The contested recovery path of the pinned-round pattern
  * (Dedup.pinFrame + ShuffleBridge.cleanAllShuffles): the ladder
  * unregisters EVERY shuffle beneath a pinned round while the round's
  * blocks are only persist()ed, so a lost block must rebuild through
  * lineage whose shuffles no longer exist in the MapOutputTracker.
  * The round-14 advice flagged this as never exercised — local runs
  * cannot lose an executor, so nothing ever proved the scheduler
  * re-registers a cleaned shuffle instead of failing the job.
  *
  * These specs force the path without killing an executor: pin a
  * multi-shuffle frame, clean its shuffles, then drop every pinned
  * block through the BlockManagerMaster (the driver-visible effect of
  * losing the executors that held them — the storage level stays, so
  * tasks recompute through lineage exactly as after a real loss) and
  * consume the frame. The job must resubmit the cleaned shuffles' map
  * stages, re-register their outputs, and produce identical rows.
  */
class ShuffleBridgeSpec extends SparkSpec {

  /** Pin the way Dedup.pinFrame does (it is private): materialized
    * persisted internal-row blocks + transitive shuffle cleanup. */
  private def pin(df: org.apache.spark.sql.DataFrame) = {
    val schema = df.schema
    val rdd = df.queryExecution.toRdd.map(_.copy())
    rdd.persist(StorageLevel.MEMORY_AND_DISK)
    rdd.count()
    org.apache.spark.graft.ShuffleBridge.cleanAllShuffles(rdd)
    (org.apache.spark.sql.graft.ColumnBridge
      .internalCreateDataFrame(df.sparkSession, rdd, schema), rdd)
  }

  private def twoShuffleFrame() = {
    spark.range(0, 20000, 1, 8)
      .selectExpr("id % 211 AS k", "id AS v")
      .groupBy("k").agg(sum("v").as("s"))
      .selectExpr("k % 13 AS g", "s")
      .groupBy("g").agg(sum("s").as("t"), count(lit(1)).as("c"))
  }

  test("pinned frame survives total block loss after shuffle cleanup") {
    val df = twoShuffleFrame()
    val expected = df.collect().map(_.toSeq).toSet
    val (pinned, rdd) = pin(df)
    // the driver-visible effect of losing every executor that held the
    // round: blocks gone, persistence flag intact, lineage intact
    org.apache.spark.graft.ShuffleBridge.dropBlocks(rdd)
    val after = pinned.collect().map(_.toSeq).toSet
    assert(after === expected)
    rdd.unpersist(blocking = true)
  }

  test("downstream consumer of a block-lost pinned frame recomputes too") {
    // the ladder's real shape: a CONSUMER plan (join + agg) reads the
    // pinned frame after the loss — the recompute happens inside a
    // larger job with its own fresh shuffles
    val df = twoShuffleFrame()
    val (pinned, rdd) = pin(df)
    val consume = (f: org.apache.spark.sql.DataFrame) =>
      f.join(f.select(col("g"), col("t").as("t2")), Seq("g"))
        .agg(sum(col("t") * col("t2")).as("x")).collect().head.getLong(0)
    val expected = consume(pinned)
    org.apache.spark.graft.ShuffleBridge.dropBlocks(rdd)
    assert(consume(pinned) === expected)
    rdd.unpersist(blocking = true)
  }

  test("iterated pin-clean-release ladder stays correct under block loss") {
    // the doubling-ladder shape: each round pins on top of the
    // previous pinned round, cleans its shuffles, releases the
    // predecessor; then EVERY retained block vanishes and the final
    // frame must rebuild the whole chain
    var (cur, curRdd) = pin(
      spark.range(0, 5000, 1, 8).selectExpr("id % 101 AS k", "id AS v")
        .groupBy("k").agg(sum("v").as("s")))
    val rdds = scala.collection.mutable.ArrayBuffer(curRdd)
    for (_ <- 1 to 3) {
      val nxt = pin(cur.selectExpr("k % 17 AS k", "s")
        .groupBy("k").agg(sum("s").as("s")))
      cur = nxt._1; rdds += nxt._2
      rdds.dropRight(1).foreach(_.unpersist(blocking = false))
    }
    val expected = cur.collect().map(_.toSeq).toSet
    org.apache.spark.graft.ShuffleBridge.dropBlocks(rdds.last)
    assert(cur.collect().map(_.toSeq).toSet === expected)
    rdds.last.unpersist(blocking = true)
  }
}
