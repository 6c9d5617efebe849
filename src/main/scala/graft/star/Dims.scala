package graft.star

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Dimension builders for the Kimball star schema
  * (`/root/reference/src/FullETLGenerator.java:80-122`).
  *
  * The reference assigns surrogate keys in file-encounter order via
  * in-heap HashMaps — inherently single-threaded. Here SKs are assigned by
  * `row_number()` over the natural-key ordering: deterministic,
  * parallel-safe, and reproducible by any SQL oracle (`row_number` /
  * `dense_rank`). SK values differ from the reference but are semantically
  * opaque; fact<->dim consistency holds because both sides derive from the
  * same assignment (SURVEY.md §7.4).
  *
  * Scale note: the heavy input is reduced first by a distributed
  * `distinct()` (map-side partial aggregation); dense ids then come from
  * sort + zipWithIndex, which stays parallel at any dimension size. If
  * density is not required, `xxhash64(keys)` is cheaper still (no sort).
  */
object Dims {

  /** A1 (geracao/status/localizacao pattern): the dedup key is the full
    * attribute set, so any-row-wins == first-wins; a plain distributed
    * `distinct` is semantically exact (FullETLGenerator.java:80-112).
    *
    * Dense SK assignment = global sort by the natural key (parallel range
    * partitioning) + `zipWithIndex` (one count pass, no data movement) —
    * same result as `row_number() over (orderBy keys)` but WITHOUT
    * funnelling every distinct key through one window task, so it holds
    * for dimensions of any size. (The rare legitimate RDD drop-down:
    * DataFrames have no zipWithIndex.)
    */
  def distinctDim(df: DataFrame, skName: String, attrs: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val cols = attrs.map(col)
    val sorted = df.select(cols: _*).distinct().orderBy(cols: _*)
    // SKs are LongType: an Int SK silently wraps past 2^31 distinct keys,
    // which a 100 TB dimension can reach. (The reference's in-heap int
    // counter could never get there — its SK domain is not a contract.)
    val schema = StructType(
      StructField(skName, LongType, nullable = false) +: sorted.schema.fields)
    val rows = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq((i + 1) +: r.toSeq)
    }
    spark.createDataFrame(rows, schema)
  }

  /** A1 (empreendimento pattern, FullETLGenerator.java:114-122): dedup key
    * is a strict subset of the carried attributes, so WHICH row survives is
    * observable. The reference keeps the first in file order;
    * `dropDuplicates` is nondeterministic about the survivor, so we take
    * rn=1 over an explicit stable ordering (SURVEY.md §7.4).
    *
    * Scale note: this is a single shuffle on `key` (hash-partitioned);
    * the window is per-key, so it parallelizes across keys and never
    * funnels through one task. Skewed keys only matter if one natural key
    * repeats millions of times — then pre-aggregate min(order) per key and
    * self-join instead.
    */
  def firstWinsDim(df: DataFrame, key: Seq[String], attrs: Seq[String],
                   order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(order: _*)
    df.select((key ++ attrs).map(col): _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
