package graft

import org.apache.spark.SparkContext
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Storage-block hygiene for eagerly localCheckpoint'ed frames.
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

  /** Release the storage blocks behind an eager localCheckpoint. No-op on
    * frames that are not checkpoint-backed.
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
