package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (r15): the fused auto-entry derivation's plan in isolation
  * (the graded queries eager-cut before it can be explained) — the
  * explode + min-by-composite-key aggregate must partial-aggregate
  * map-side and prune the scan to (vec_id, embedding).
  */
object PlanPeek3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val ent = e.select(col("id"),
        explode(array((0 until 4).map(j =>
          graft.operators.Similarity.signBucketAt(col("vec"), 6, j * 6) +
            lit(j.toLong * 64L)): _*)).as("__eb"))
      .groupBy("__eb").agg(min(col("id")).as("node"))
      .select("node").distinct()
    ent.collect()
    println(ent.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
