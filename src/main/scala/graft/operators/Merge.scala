package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE (upsert + delete) — apply a keyed changeset to a snapshot:
  * the incremental-refresh primitive the reference's full-rebuild ETL
  * lacks (it re-derives every dim/fact from scratch each run;
  * /root/reference/src/FullETLGenerator.java:39-55).
  *
  * Semantics per key: a change row with op 'U' replaces the base row
  * (or inserts if absent); op 'D' deletes it; keys without a change
  * row pass through. The changeset must have at most ONE row per key
  * (the usual CDC-compacted contract — compact with Dedup.exact first
  * if violated).
  *
  * Scale design: no join at all — union the tagged sides and keep the
  * highest-priority row per key with one window over one shuffle.
  * A full-outer-join formulation shuffles both sides AND builds a hash
  * table; this shuffles each row once and streams. At 100 TB with a
  * bucketed base table the planner drops the base side's exchange
  * entirely and only the (small) changeset moves.
  */
object Merge {

  def merge(base: DataFrame, changes: DataFrame, key: Seq[String],
            opCol: String = "op"): DataFrame = {
    val cols = base.columns.toSeq
    val b = base.withColumn(opCol, lit("U")).withColumn("__src", lit(0))
    val c = changes.select((cols :+ opCol).map(col): _*).withColumn("__src", lit(1))
    val w = Window.partitionBy(key.map(col): _*).orderBy(col("__src").desc)
    b.unionByName(c)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "D")
      .select(cols.map(col): _*)
  }

  /** Incremental aggregate-view maintenance: fold a micro-batch's partial
    * aggregates into an existing snapshot of the same shape. `addCols`
    * are the ADDITIVE measures (counts, sums — anything where
    * total = snapshot + delta); both inputs must carry exactly
    * (key ++ addCols). This is the materialized-view refresh primitive:
    * the alternative — re-aggregating all history per batch — rescans
    * the full fact table, while this touches |snapshot| + |delta| rows.
    *
    * Scale shape: one union + one re-aggregation keyed like the
    * snapshot; with the snapshot stored bucketed by `key` the exchange
    * disappears and only the delta moves. Keep measures in exact types
    * (decimal, long) until presentation: each key folds at most one
    * snapshot row and one delta row here, but chained refreshes make
    * the addition order arbitrary — exact types make it order-free.
    */
  def refreshAgg(snapshot: DataFrame, deltaAgg: DataFrame, key: Seq[String],
                 addCols: Seq[String]): DataFrame =
    snapshot.unionByName(deltaAgg)
      .groupBy(key.map(col): _*)
      .agg(sum(col(addCols.head)).as(addCols.head),
        addCols.tail.map(c => sum(col(c)).as(c)): _*)
}
