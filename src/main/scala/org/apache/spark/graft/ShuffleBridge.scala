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
  * ordinary lineage recovery (missing shuffle files are re-created by
  * stage retry). Lives under org.apache.spark because ContextCleaner
  * is private[spark]; same bridge posture as sql.graft.ColumnBridge. */
object ShuffleBridge {
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
