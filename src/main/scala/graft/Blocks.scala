package graft

import org.apache.spark.SparkContext
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Lineage-cut + storage-block hygiene for iterative operators.
  *
  * `Dataset.localCheckpoint(eager = true)` persists the materialized rows
  * as storage blocks that `Dataset.unpersist` CANNOT release (unpersist
  * routes through the CacheManager, which never saw the checkpoint). Left
  * alone, the blocks linger until the ContextCleaner happens to GC the
  * RDD — round 2 measured session-wide slowdown (trivial scans 3-5x) from
  * exactly that accumulation across a long bench run. Iterative operators
  * free superseded rounds with [[free]]; harnesses drop everything between
  * independent queries with [[sweep]].
  */
object Blocks {

  /** Cut lineage between rounds of an iterative operator, materializing
    * the frame eagerly. Which checkpoint runs is a DEPLOYMENT decision,
    * read from the session:
    *
    *   - a cluster job that has called `sparkContext.setCheckpointDir`
    *     (standard practice for any iterative workload on a real
    *     cluster) gets a RELIABLE checkpoint — rounds are written to
    *     the fault-tolerant store, so losing an executor mid-loop costs
    *     a re-read, not the job (localCheckpoint blocks die with their
    *     executor and their lineage is truncated: unrecoverable);
    *   - no checkpoint dir (local runs, tests, the bench harness) falls
    *     back to `localCheckpoint` — executor == driver, so reliability
    *     adds nothing and the memory-block path is strictly faster;
    *   - `spark.graft.checkpoint.local=true` forces the local path even
    *     with a dir set (escape hatch for jobs whose dir serves other
    *     streams).
    *
    * Reliable-checkpoint files are reclaimed by Spark's ContextCleaner
    * when `spark.cleaner.referenceTracking.cleanCheckpoints=true`;
    * otherwise they age out with the directory (the cluster-operator
    * norm). [[free]] stays correct on both: unpersist is a no-op on a
    * reliably-checkpointed RDD (its rows live in files, not blocks).
    */
  def cut[T](ds: Dataset[T]): Dataset[T] = {
    val sc = ds.sparkSession.sparkContext
    val forceLocal = ds.sparkSession.conf
      .getOption("spark.graft.checkpoint.local").contains("true")
    if (!forceLocal && sc.getCheckpointDir.isDefined) ds.checkpoint(eager = true)
    else ds.localCheckpoint(eager = true)
  }

  /** Lazy twin of [[cut]] — the same deployment decision, but
    * materialization rides the first action instead of its own job. For
    * plan BARRIERS (codegen-deferral stops, index builds read by one
    * downstream join) where an extra eager pass would be pure cost.
    */
  def cutLazy[T](ds: Dataset[T]): Dataset[T] = {
    val sc = ds.sparkSession.sparkContext
    val forceLocal = ds.sparkSession.conf
      .getOption("spark.graft.checkpoint.local").contains("true")
    if (!forceLocal && sc.getCheckpointDir.isDefined) ds.checkpoint(eager = false)
    else ds.localCheckpoint(eager = false)
  }

  /** `ds.cut` / `ds.cutLazy` syntax for [[cut]]/[[cutLazy]] at the end
    * of an operator chain.
    */
  implicit class CutSyntax[T](private val ds: Dataset[T]) extends AnyVal {
    def cut: Dataset[T] = Blocks.cut(ds)
    def cutLazy: Dataset[T] = Blocks.cutLazy(ds)
  }

  /** Release the storage blocks behind an eager localCheckpoint. No-op on
    * frames that are not checkpoint-backed (including reliable
    * checkpoints, whose rows live in files).
    */
  def free(df: Dataset[_]): Unit = df.queryExecution.logical match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
    case _ => ()
  }

  /** Drop every persisted RDD in the context — cached frames AND
    * checkpoint blocks. For harnesses (bench/verify) at query boundaries,
    * where by construction nothing carries over; not for library code.
    */
  def sweep(sc: SparkContext): Unit =
    sc.getPersistentRDDs.valuesIterator.foreach(_.unpersist(blocking = false))
}
