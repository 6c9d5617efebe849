package graft.star

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fact construction: broadcast FK resolution with left-outer sentinel
  * semantics (`/root/reference/src/FullETLGenerator.java:152-178`).
  *
  * The reference's pass-2 HashMap probes are exactly broadcast hash joins
  * with the dim as build side (J1, SURVEY.md §2.1). We join on the natural
  * -key COLUMNS directly — no concatenated string keys, so Catalyst can
  * prune/push and the join stays codegen'd. A missed probe yields the
  * reference's -1 sentinel (J2, FullETLGenerator.java:168-170) via left
  * join + coalesce.
  *
  * Scale: dims are broadcast (no shuffle of the fact side at all). At
  * 100 TB the fact table never moves for FK resolution; only dims —
  * bounded by distinct-key cardinality — travel. Fact grain is preserved:
  * 1 output row per input row, no blow-up possible because dim keys are
  * unique by construction (distinct / first-wins).
  */
object FactBuilder {

  /** Resolve one surrogate FK: left-broadcast-join `fact` to `dim` on the
    * shared natural-key columns and replace the dim's SK by `-1` where the
    * probe missed. The dim's attribute columns are dropped — only the SK
    * survives, renamed to `fkName`.
    *
    * Keys join NULL-SAFELY (`<=>`): the reference probes a HashMap with
    * string keys, so an empty attribute ("" after its CSV read) still
    * matches the dim row built from the same value
    * (FullETLGenerator.java:152-170). Spark's CSV reader surfaces empty
    * fields as NULL; plain `=` would send every such row to the -1
    * sentinel even though distinctDim emitted a matching NULL dim row.
    * EqualNullSafe is a legal hash-join key, so this stays a broadcast
    * hash join.
    */
  def resolveFk(fact: DataFrame, dim: DataFrame, sk: String,
                naturalKey: Seq[String], fkName: String): DataFrame = {
    val nkAlias = naturalKey.map(k => k -> s"__nk_$k").toMap
    val build = naturalKey.foldLeft(
      dim.select((sk +: naturalKey).map(col): _*)
        .withColumnRenamed(sk, "__sk") // avoid clash when fkName == sk
    )((d, k) => d.withColumnRenamed(k, nkAlias(k)))
    val cond = naturalKey.map(k => fact(k) <=> build(nkAlias(k))).reduce(_ && _)
    fact.join(broadcast(build), cond, "left")
      // sentinel typed to the SK column so a long SK stays long
      .withColumn(fkName, coalesce(col("__sk"), lit(-1).cast(dim.schema(sk).dataType)))
      .drop("__sk")
      .drop(nkAlias.values.toSeq: _*)
  }

  /** Chain several FK resolutions: (dim, sk, naturalKey, fkName)*. */
  def resolveAll(fact: DataFrame,
                 dims: Seq[(DataFrame, String, Seq[String], String)]): DataFrame =
    dims.foldLeft(fact) { case (f, (dim, sk, nk, fk)) =>
      resolveFk(f, dim, sk, nk, fk)
    }
}
