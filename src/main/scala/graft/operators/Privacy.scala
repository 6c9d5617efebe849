package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy / data-governance operators for training-data curation
  * (extension tier, SURVEY.md §2.4 E4 adjunct). A pretraining pipeline
  * that ingests user-adjacent data needs release gates beyond PII
  * regex redaction (TextAnalysis.redact): k-anonymity over
  * quasi-identifier combinations and l-diversity over sensitive
  * attributes are the standard table-level checks (Sweeney 2002;
  * Machanavajjhala et al. 2007 — public literature).
  *
  * Scale design: both operators are ONE hash-shuffle on the
  * quasi-identifier columns — group sizes / distinct-sensitive counts
  * come from a window (or grouped) aggregate over that single
  * partitioning, and suppression is a map-side projection. No joins,
  * no second shuffle, payload columns ride along untouched.
  */
object Privacy {

  /** k-anonymity suppression: every row whose quasi-identifier
    * combination appears fewer than `k` times has those QI columns
    * replaced by `"*"` (full-column generalization — the coarsest
    * step of a Samarati generalization lattice; finer hierarchies
    * would swap the literal for a lookup). Adds `group_n` (the
    * pre-suppression group size) and `suppressed` (0/1).
    *
    * One shuffle: the window count partitions by the QI columns;
    * suppression itself is narrow.
    */
  def kAnonymitySuppress(df: DataFrame, qi: Seq[String], k: Int): DataFrame = {
    val w = Window.partitionBy(qi.map(col): _*)
    val withN = df.withColumn("group_n", count(lit(1)).over(w))
    val suppressed = col("group_n") < k
    val out = qi.foldLeft(withN) { (acc, c) =>
      acc.withColumn(c, when(suppressed, lit("*")).otherwise(col(c).cast("string")))
    }
    out.withColumn("suppressed", suppressed.cast("int"))
  }

  /** l-diversity audit: for each quasi-identifier group, the number of
    * DISTINCT values of `sensitive` present. Groups with fewer than `l`
    * distinct sensitive values are vulnerable to homogeneity attack
    * even when k-anonymous — `diverse` flags compliance. Exact
    * count-distinct inside one grouped aggregate (the QI shuffle is
    * the only shuffle; distinct-within-group expands locally).
    */
  def lDiversity(df: DataFrame, qi: Seq[String], sensitive: String,
                 l: Int): DataFrame =
    df.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("group_n"),
        countDistinct(col(sensitive)).as("n_sensitive"))
      .withColumn("diverse", (col("n_sensitive") >= l).cast("int"))
}
