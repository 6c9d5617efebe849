package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the table-compare every ETL deployment runs between
  * pipeline versions, backfills, and vendor deliveries: given two
  * versions of a table and its key, classify every key as added /
  * removed / changed / unchanged and name the changed columns.
  *
  * The reference's pipeline regenerates its star schema from scratch
  * each run (FullETLGenerator.java:43-54, two fixed passes); diffing
  * consecutive outputs is how such a deployment answers "what did
  * today's load actually change" without re-reading both CSVs.
  *
  * Scale shape: ONE full-outer shuffle join on the key — both sides
  * shuffle once, the per-column comparison is a codegen'd projection,
  * and the changed-column names come from a compile-time array of
  * when()s (no per-row map building). Null-safe equality (`<=>`) keeps
  * null→value and value→null transitions visible as changes.
  */
object TableDiff {

  /** Row-level diff: (key…, status, changed_cols array<string>).
    * `compareCols` defaults to every non-key column present on BOTH
    * sides (columns existing on one side only are ignored — schema
    * evolution is a separate report).
    */
  def snapshotDiff(before: DataFrame, after: DataFrame, keyCols: Seq[String],
                   compareCols: Seq[String] = Nil): DataFrame = {
    val cmp =
      if (compareCols.nonEmpty) compareCols
      else before.columns.filter(c =>
        !keyCols.contains(c) && after.columns.contains(c)).toSeq
    val b = before.select((keyCols ++ cmp).map(col): _*)
      .withColumn("__b", lit(1))
    val a = after.select(keyCols.map(col) ++
        cmp.map(c => col(c).as(s"__a_$c")): _*)
      .withColumn("__a", lit(1))
    val joined = b.join(a, keyCols, "full_outer")
    val changed = cmp.map(c => !(col(c) <=> col(s"__a_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val status = when(col("__b").isNull, lit("added"))
      .when(col("__a").isNull, lit("removed"))
      .when(changed, lit("changed"))
      .otherwise(lit("unchanged"))
    val changedCols = filter(
      array(cmp.map(c => when(!(col(c) <=> col(s"__a_$c")), lit(c))): _*),
      x => x.isNotNull)
    joined.select(keyCols.map(col) :+ status.as("status") :+
      when(col("__b").isNotNull && col("__a").isNotNull, changedCols)
        .otherwise(array().cast("array<string>")).as("changed_cols"): _*)
  }

  /** Aggregated diff report: one row per (status, changed column)
    * combination plus per-status totals under changed_col = '*'. The
    * shape a CI gate or a load-monitor dashboard consumes.
    */
  def diffReport(before: DataFrame, after: DataFrame,
                 keyCols: Seq[String]): DataFrame = {
    // '*' sentinel prepended so totals and per-column counts come out
    // of ONE explode + ONE aggregation — the diff join runs once
    snapshotDiff(before, after, keyCols)
      .select(col("status"), explode(concat(array(lit("*")),
        col("changed_cols"))).as("changed_col"))
      .groupBy("status", "changed_col")
      .agg(count(lit(1)).as("n_rows"))
  }
}
