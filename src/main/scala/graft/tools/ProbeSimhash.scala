package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-7 probe for the e2_simhash_pairs driver-environment cliff
  * (4.04 s driver vs 1.02 s idle, 2 rounds running): times the simhash
  * family at the bench's exact config (local[32], 32 shuffle
  * partitions, min-of-3) so an external load generator can be run
  * beside it. Usage: runMain graft.tools.ProbeSimhash [sfDir]
  */
object ProbeSimhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id * 2)").collect()
    spark.read.parquet(s"$dir/documents.parquet").count()
    def time(name: String)(f: => Long): Unit = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        graft.Blocks.sweep(spark.sparkContext)
        System.gc()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[probe] $name%-22s min=${reps.map(_._1).min}%6.2f s  " +
        f"all=${reps.map(r => f"${r._1}%.2f").mkString("/")}  rows=${reps.head._2}")
    }
    time("e2_simhash")(graft.Queries.e2_simhash(spark, dir).count())
    time("e2_simhash_pairs")(graft.Queries.e2_simhash_pairs(spark, dir).count())
    time("e2_simhash_scalable")(graft.Queries.e2_simhash_scalable(spark, dir).count())
    spark.stop()
  }
}
