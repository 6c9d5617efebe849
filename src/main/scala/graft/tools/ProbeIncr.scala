package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Hierarchy

/** Scale evidence for the incremental hierarchy claim: with a FIXED
  * batch, [[Hierarchy.extend]]/[[extendPaths]] cost must track the
  * batch, not the settled corpus — the property that makes daily
  * ingest into a 100 TB hierarchy a batch-sized job. Measures extend
  * over settled forests 10x apart (same deterministic parent = id div 2
  * shape the graded fixtures use) with an identical trailing batch.
  */
object ProbeIncr {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"$label%-46s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id*2)").collect()

    val batchN = 20000L
    for (corpusN <- Seq(200000L, 2000000L); rep <- 1 to 2) {
      // ids 8..corpusN+batchN over parent = id div 2; settled = first
      // corpusN ids, batch = the trailing batchN (multi-level new-on-new)
      val e = spark.range(8, corpusN + batchN)
        .select(col("id"), expr("id div 2").as("parent"))
      val settled = time(f"[$corpusN%7d] build settled (full doubling)") {
        Hierarchy.rootAndDepth(e.filter(col("id") < corpusN), "id", "parent")
          .cache()
      }
      settled.count()
      time(f"[$corpusN%7d] extend batch=$batchN rep$rep") {
        Hierarchy.extend(settled, e.filter(col("id") >= corpusN),
          "id", "parent").count()
      }
      settled.unpersist()
      graft.Blocks.sweep(spark.sparkContext); System.gc()
    }
    spark.stop()
  }
}
