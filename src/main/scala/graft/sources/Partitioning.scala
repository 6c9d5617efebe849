package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style partitioned layout: one directory per partition value so
  * predicates on the partition column prune entire directories at plan
  * time (zero I/O for excluded partitions) — with bucketing, the other
  * half of the 100 TB table-layout story. A date-partitioned fact table
  * turns "last 7 days" queries from a full scan into 7 directory reads.
  */
object Partitioning {

  /** Write `df` partitioned by `partCols` (low-cardinality columns only —
    * each distinct combination becomes a directory).
    */
  def writePartitioned(df: DataFrame, path: String, partCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
