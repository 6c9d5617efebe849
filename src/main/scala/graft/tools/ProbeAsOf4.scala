package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: the as-of A/B with FULL materialization (hash of every
  * output column) vs the bench's .count() — quantifies how much of the
  * window formulation's bench advantage is Catalyst pruning its entire
  * window+union tail under count().
  */
object ProbeAsOf4 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id * 2)").collect()
    def best(f: => Unit): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f
        graft.Blocks.sweep(spark.sparkContext); System.gc()
        (System.nanoTime() - t0) / 1e9
      }.min
    Seq("j_asof", "j_asof_native").foreach { n =>
      val fn = graft.Queries.all.find(_._1 == n).get._2
      val cnt = best(fn(spark, dir).count())
      val full = best {
        val df = fn(spark, dir)
        df.select(xxhash64(df.columns.map(col): _*).as("h"))
          .agg(sum(col("h"))).collect()
      }
      println(f"[ab] $n%-16s count=$cnt%6.3f s   full-materialize=$full%6.3f s")
    }
    spark.stop()
  }
}
