package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: driver-side phase timing for the two graded as-of queries
  * (dev tool) — where do the non-stage seconds go?
  */
object ProbeAsOf2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id * 2)").collect()
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $name%-16s ${(System.nanoTime() - t0) / 1e9}%6.3f s"); r
    }
    Seq("j_asof", "j_asof_native").foreach { n =>
      val fn = graft.Queries.all.find(_._1 == n).get._2
      (1 to 3).foreach { rep =>
        println(s"--- $n rep$rep")
        val df = time("build")(fn(spark, dir))
        val qe = df.queryExecution
        time("analyze")(qe.analyzed)
        time("optimize")(qe.optimizedPlan)
        time("plan")(qe.executedPlan)
        import org.apache.spark.metrics.source.CodegenMetrics
        val c0 = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
        time("execute")(df.count())
        println(s"[c] compiles=${CodegenMetrics.METRIC_COMPILATION_TIME.getCount - c0}")
        graft.Blocks.sweep(spark.sparkContext)
      }
    }
    spark.stop()
  }
}
