package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the bloom-prefiltered decontam against the plain one (dev tool). */
object ProbeBloom {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[dbg] $name%-18s rep$i ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
        graft.Blocks.sweep(spark.sparkContext)
      }
    }
    time("decontam")(graft.Queries.all.find(_._1 == "e4_decontam").get._2(spark, dir).count())
    time("decontam_bloom")(graft.Queries.all.find(_._1 == "e4_decontam_bloom").get._2(spark, dir).count())
    spark.stop()
  }
}
