package graft.star

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

/** G1 — calendar dimension generator
  * (`/root/reference/src/FullETLGenerator.java:182-204`).
  *
  * One row per day of the inclusive [min,max] range with the reference's 8
  * derived columns, pt-BR month/weekday names from literal arrays (never
  * `date_format 'MMMM'`, which is JVM-locale-dependent — SURVEY.md §7.4).
  *
  * Generation is `sequence(start, stop, interval 1 day)` + `explode`: the
  * range array is built once per row of a 1-row frame, then exploded into a
  * distributed Dataset. A century of days is ~36k rows — trivially
  * broadcastable; callers join facts to it by the int `ChaveData` key with
  * a broadcast hint.
  */
object CalendarDim {

  /** Build the calendar over the inclusive date range of `dateCol` in `df`
    * — data-driven like the reference (min/max accumulators at
    * FullETLGenerator.java:124-137). Rows with null dates are ignored by
    * min/max; an all-null input yields an empty calendar (the reference
    * skips generation entirely, 132-137).
    */
  def fromRange(df: DataFrame, dateCol: String): DataFrame = {
    val range = df
      .select(to_date(col(dateCol)).as("d"))
      .filter(col("d").isNotNull)
      .agg(min("d").as("lo"), max("d").as("hi"))
      .filter(col("lo").isNotNull)
    build(range)
  }

  /** Build from an explicit 1-row (lo, hi) DataFrame of DateType. */
  def build(range: DataFrame): DataFrame = {
    val days = range
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("d"))
    days.select(
      dateKeyOf(col("d")).as("ChaveData"),
      col("d").as("DataCompleta"),
      year(col("d")).as("Ano"),
      month(col("d")).as("MesNumero"),
      ptBrMonthName(col("d")).as("NomeMes"),
      dayofmonth(col("d")).as("Dia"),
      ptBrWeekdayName(col("d")).as("DiaDaSemana"),
      quarterLabel(col("d")).as("Trimestre"))
  }

  /** Convenience: calendar over a literal ISO date range. */
  def overRange(spark: SparkSession, lo: String, hi: String): DataFrame =
    build(spark.sql(s"SELECT DATE'$lo' AS lo, DATE'$hi' AS hi"))
}
