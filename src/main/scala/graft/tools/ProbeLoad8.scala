package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-8 probe for the e2_edit_pairs / e2_cc_largestar driver-load
  * sensitivity (verdict item 5: 1.13 -> 3.05 s and 1.93 -> 3.82 s under
  * driver load in r7, same signature as the r5/r6 simhash cliff).
  * Times both at the bench's exact config so an external load generator
  * can run beside it. Usage: runMain graft.tools.ProbeLoad8 [sfDir]
  */
object ProbeLoad8 {
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
    time("e2_edit_pairs")(graft.Queries.e2_edit_pairs(spark, dir).count())
    time("e2_cc_largestar")(graft.Queries.e2_cc_largestar(spark, dir).count())
    time("etl_entity_res")(graft.Queries.etl_entity_res(spark, dir).count())
    spark.stop()
  }
}
