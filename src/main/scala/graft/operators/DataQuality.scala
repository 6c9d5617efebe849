package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rule engine — the validation gate an ETL
  * run publishes beside its load (row counts alone say nothing about
  * referential orphans or domain violations). The reference pipeline
  * coerces bad values silently (FullETLGenerator.java:237,246,252 —
  * 0.0 / null / 0 sentinels); this is the report that makes those
  * coercions VISIBLE upstream instead of baked into the facts.
  *
  * Two rule families:
  *   - predicate rules: a boolean Column evaluated per row — all rules
  *     for a table fold into ONE scan as conditional-sum aggregates
  *     (no per-rule pass, no shuffle beyond the single agg).
  *   - referential rules: child keys that must exist in a parent —
  *     one left-anti join per rule, broadcast when the parent is a
  *     dimension.
  * Output: (rule, n_violations, n_checked, violation_rate).
  */
object DataQuality {

  /** All predicate rules in one scan: `rules` maps rule name → the
    * VIOLATION predicate (true = bad row).
    */
  def predicateReport(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val agg = df.agg(
      count(lit(1)).as("__n"),
      rules.map { case (name, bad) =>
        sum(when(bad, 1L).otherwise(0L)).as(s"__v_$name")
      }: _*)
    agg.select(explode(array(rules.map { case (name, _) =>
        struct(lit(name).as("rule"), col(s"__v_$name").as("n_violations"),
          col("__n").as("n_checked"))
      }: _*)).as("r"))
      .select(col("r.rule"), col("r.n_violations"), col("r.n_checked"),
        round(col("r.n_violations").cast("double") /
          col("r.n_checked").cast("double"), 6).as("violation_rate"))
  }

  /** Referential-integrity rule: child rows whose key has no match in
    * the parent. The parent side reduces to its DISTINCT key before the
    * anti join, so a dimension parent broadcasts no matter how wide.
    */
  def orphanReport(child: DataFrame, childKey: String, parent: DataFrame,
                   parentKey: String, rule: String,
                   broadcastParent: Boolean = true): DataFrame = {
    val keys = parent.select(col(parentKey).as(childKey)).distinct()
    val orph = child.select(col(childKey))
      .join(if (broadcastParent) broadcast(keys) else keys,
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    val totals = child.agg(count(lit(1)).as("n_checked"))
    orph.crossJoin(totals)
      .select(lit(rule).as("rule"), col("n_violations"), col("n_checked"),
        round(col("n_violations").cast("double") /
          col("n_checked").cast("double"), 6).as("violation_rate"))
  }
}
