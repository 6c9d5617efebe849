package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-interval range join: pairs (l, r) with the same key and
  * `r.ts in [l.ts, l.ts + W)`.
  *
  * Naive Spark evaluates key-equi-join then filters the range — correct,
  * but a hot key degenerates to |L_k| x |R_k| intermediate rows. The
  * bucketed formulation exploits the BOUNDED window: quantize time into
  * W-sized buckets, join on (key, bucket) with the left side exploded to
  * the (at most 2) buckets its window overlaps, then apply the exact
  * range predicate. Intermediate size drops from |L_k| x |R_k| to pairs
  * within neighbouring buckets — the standard time-bucketing trick used
  * by every streaming interval join.
  */
object RangeJoin {

  /** `left`: (keyCol, tsCol lhs events); `right`: (keyCol, tsCol).
    * Window `[l.ts, l.ts + windowMs)`. Timestamps as epoch-ms longs.
    */
  def bucketed(left: DataFrame, right: DataFrame, keyCol: String,
               leftMs: String, rightMs: String, windowMs: Long): DataFrame = {
    // a window of width W always spans exactly buckets b and b+1
    val b = floor(col(leftMs) / windowMs).cast("long")
    val lb = left.withColumn("__bucket", explode(array(b, b + 1)))
    // floor(), NOT a bare long cast: cast truncates toward zero, so for
    // negative epoch-ms (pre-1970) the two sides would bucket differently
    // and silently drop matching pairs.
    val rb = right.withColumn("__bucket", floor(col(rightMs) / windowMs).cast("long"))
    lb.join(rb, Seq(keyCol, "__bucket"))
      .filter(col(rightMs) >= col(leftMs) &&
        col(rightMs) < col(leftMs) + windowMs)
      .drop("__bucket")
  }
}
