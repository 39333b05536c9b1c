package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Eager release of SUPERSEDED `localCheckpoint(true)` iterates.
  *
  * The iterative operators ([[Graph]]'s rank/peel/frontier loops, the
  * descent rounds in [[Similarity]]) follow the pageRank lineage
  * discipline: each iteration's frame is eagerly localCheckpoint'ed so
  * plans stay bounded. The blocks behind iterate i are dead the moment
  * iterate i+1 has materialized — nothing references them again — but
  * nothing DROPS them either: Spark only reclaims a checkpoint's blocks
  * when the GC collects the RDD and the ContextCleaner notices, which
  * under a tight heap means every superseded iterate sits in the block
  * manager competing with execution memory until an arbitrary full GC.
  * The r16 driver bench measured exactly that posture tax: the same
  * commit's iterative graph queries ran 2.5-7.4x their 96 GiB-builder
  * times under the driver's default heap. This helper is the eager
  * path: unpersist the superseded iterate's blocks as soon as its
  * successor is materialized.
  *
  * Contract: call ONLY on a frame that (a) the loop itself checkpointed
  * and (b) no later plan will reference. A localCheckpoint has no
  * lineage to recompute from, so freeing a frame that is still
  * referenced would fail its next action — which is why the helper
  * matches the ROOT of the analyzed plan only ([[free]] on a
  * non-checkpoint start iterate, e.g. a `prStart` projection, is a
  * deliberate no-op rather than a tree search that could release a
  * still-live upstream checkpoint such as the shared adjacency).
  * Blocking=false: the drop is async, the loop never stalls on it.
  */
private[graft] object Iterates {

  /** Drop the storage blocks behind `df` iff `df` is itself a
    * materialized checkpoint (analyzed plan root is the checkpoint's
    * LogicalRDD); no-op otherwise. */
  def free(df: DataFrame): Unit = free(df, blocking = false)

  /** As [[free]]; `blocking = true` waits for the blocks to be gone —
    * the scratch-disk-critical paths (the lsh-tuning chunk loop) use it
    * so a pass's spill space is reclaimed BEFORE the next pass claims
    * the disk, not at an arbitrary later GC. */
  def free(df: DataFrame, blocking: Boolean): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking)
      case _ => ()
    }
}
