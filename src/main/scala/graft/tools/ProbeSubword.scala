package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B timing probe for the subword family (dev tool, not graded):
  * replicates Bench's protocol (warmup, pre-touch, min-of-3 count(),
  * block sweep + GC between queries) for just the subword queries.
  * Usage: runMain graft.tools.ProbeSubword <sfDir> [cpus]
  */
object ProbeSubword {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id * 2)").collect()
    spark.read.parquet(s"$dir/documents.parquet").count()
    for (name <- Seq("e4_subword", "e4_subword_budget", "e4_token_budget")) {
      val fn = graft.SparkEntry.queries(name)
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      graft.Blocks.sweep(spark.sparkContext)
      System.gc()
      println(f"[probe] $name%-20s $best%6.3f s")
    }
    spark.stop()
  }
}
