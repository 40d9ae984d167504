package org.apache.spark.graft

import scala.collection.mutable

import org.apache.spark.ShuffleDependency
import org.apache.spark.rdd.RDD

/** Deterministic shuffle-file reclamation for iterative operators
  * (the suffix-rank prefix-doubling ladder): each round's plan chains
  * several exchanges whose files are needed only to RECOMPUTE that
  * round — once the round is pinned (persisted + counted), the files
  * are dead weight that ContextCleaner reclaims only on a driver GC
  * (nine rounds of ~270M-row exchanges exhausted the probe box's disk
  * at sf100 before any GC came).
  *
  * `RDD.cleanShuffleDependencies` is the public API for exactly this,
  * but it STOPS at the first ShuffleDependency on each lineage path —
  * an iterative round's topmost exchange is cleaned while the three
  * or four beneath it survive. This walker unregisters EVERY shuffle
  * in the lineage, transitively, which is safe for the pinned-round
  * pattern: everything below the pinned blocks exists only for
  * recompute, and a lost block re-runs the parent map stages through
  * ordinary lineage recovery. That recovery claim is EXERCISED, not
  * assumed (round-14 advice): ShuffleBridgeSpec drops every pinned
  * block via [[dropBlocks]] after cleanup and consumes the frame —
  * a fresh job finds no ShuffleMapStage for the cleaned ids (the
  * DAGScheduler dropped its stage bookkeeping when the pin job
  * finished), so getOrCreateShuffleMapStage re-creates the stage AND
  * re-registers the shuffle with the MapOutputTracker before any
  * registerMapOutput can observe a missing ShuffleStatus; results
  * match pre-loss, including through downstream consumer joins and a
  * 4-deep iterated ladder. Residual untested window: a block lost
  * MID-JOB while the consuming stages are live — that path goes
  * through FetchFailed resubmission rather than fresh stage creation
  * and cannot be forced deterministically from local mode; clusters
  * wanting belt-and-braces for it should reliable-checkpoint the
  * retained levels instead (RDD.cleanShuffleDependencies' documented
  * contract). Lives under org.apache.spark because ContextCleaner
  * is private[spark]; same bridge posture as sql.graft.ColumnBridge. */
object ShuffleBridge {

  /** Fault-injection hook (ShuffleBridgeSpec): drop every persisted
    * block of `rdd` cluster-wide WITHOUT clearing its storage level —
    * the driver-visible effect of losing the executors that held a
    * pinned round. Consumers must then rebuild through lineage whose
    * shuffles [[cleanAllShuffles]] already unregistered, which is the
    * recovery path local-mode runs can never hit by accident. */
  def dropBlocks(rdd: RDD[_]): Unit =
    rdd.sparkContext.env.blockManager.master.removeRdd(rdd.id, blocking = true)

  def cleanAllShuffles(rdd: RDD[_]): Unit = {
    rdd.sparkContext.cleaner.foreach { cleaner =>
      val seen = mutable.HashSet[Int]()
      def walk(r: RDD[_]): Unit = {
        if (seen.add(r.id)) r.dependencies.foreach {
          case sd: ShuffleDependency[_, _, _] =>
            cleaner.doCleanupShuffle(sd.shuffleId, blocking = false)
            walk(sd.rdd)
          case d => walk(d.rdd)
        }
      }
      walk(rdd)
    }
  }
}
