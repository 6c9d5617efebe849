package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, attach the latest right row
  * with `right.ts <= left.ts` within the same key — the standard
  * time-series enrichment operator (Spark has no built-in; this is the
  * union+window formulation).
  *
  * Execution: tag both sides, union, ONE shuffle on the key, sort by
  * (ts, side) per key, then `last(..., ignoreNulls)` over the preceding
  * frame propagates the most recent right-side values onto left rows.
  * No range-explosion, no per-row probe: O((|L|+|R|) log) per key.
  *
  * Scale: this beats the broadcast-probe formulation whenever the right
  * side is large; both sides shuffle once on the key and windows run
  * per-key in parallel. Skewed keys behave like any window — pre-split
  * hot keys or bound right-side history if a key's timeline is huge.
  *
  * Requirement for determinism: at most one right row per (key, ts) —
  * pre-aggregate the right side to that grain (the caller chooses the
  * survivor rule, e.g. max of a tiebreak column).
  */
object AsOfJoin {

  /** `left` must carry (keyCol, tsCol, ...); `right` (keyCol, tsCol,
    * rightVals...). Result = left columns + rightVals (null when no right
    * row precedes). All right value columns must not collide with left's.
    */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("__side", lit(1))
      .select((leftCols.map(col) :+ col("__side")) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rTagged = right
      .withColumn("__side", lit(0))
      .select((leftCols.map(c =>
        if (c == keyCol || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+ col("__side")) ++
        rightVals.map(col): _*)
    // right rows sort BEFORE left rows at equal ts (side 0 < 1), so a
    // same-instant right row is visible to the left row (ts <= semantics).
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.foldLeft(lTagged.unionByName(rTagged)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__side")
  }
}
