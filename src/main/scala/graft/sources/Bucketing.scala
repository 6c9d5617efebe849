package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: pre-shuffle a table ONCE at write time so
  * every later equi-join/aggregation on the bucket key is shuffle-free —
  * the core 100 TB co-location technique (Spark buckets == Hive buckets:
  * hash(key) mod n files per partition, recorded in the catalog so the
  * planner treats the table as pre-partitioned).
  *
  * At petabyte scale the fact table is written once with
  * `bucketBy(n, joinKey)`; every dim-join, dedup pass, or incremental
  * merge on that key then reads co-located buckets and skips the
  * exchange entirely (verified by BucketingSpec: the join plan contains
  * no Exchange).
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
