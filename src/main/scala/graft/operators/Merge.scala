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
}
