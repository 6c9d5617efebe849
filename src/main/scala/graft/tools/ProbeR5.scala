package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: time individual graded queries in isolation (dev tool). */
object ProbeR5 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.contains("GRAFT_PROBE_STAGES"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val t = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
            println(f"[s] stage=${si.stageId}%3d tasks=${si.numTasks}%3d " +
              f"wall=${t}%5d ms cpu=${si.taskMetrics.executorCpuTime / 1000000}%5d ms " +
              si.name.take(50))
          }
        })
    spark.range(100000).selectExpr("sum(id * 2)").collect()
    names.foreach { n =>
      val fn = graft.Queries.all.find(_._1 == n).get._2
      (1 to 3).foreach { r =>
        val t0 = System.nanoTime()
        val cnt = fn(spark, dir).count()
        println(f"[t] $n rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$cnt")
        graft.Blocks.sweep(spark.sparkContext)
      }
    }
    spark.stop()
  }
}
