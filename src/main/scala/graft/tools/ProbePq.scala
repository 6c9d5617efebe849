package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: where does e3_pq_topk's wall time go — analysis, optimization,
  * physical planning, or execution? (dev tool)
  */
object ProbePq {
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
      println(f"[t] $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.3f s"); r
    }
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep")
      val df = time("build")(graft.Queries.e3_pq_topk(spark, dir))
      val qe = df.queryExecution
      time("analyze")(qe.analyzed)
      time("optimize")(qe.optimizedPlan)
      time("plan")(qe.executedPlan)
      time("execute")(df.count())
    }
    // stage decomposition via the operator's own pieces
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val t = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
          println(f"[s] stage=${si.stageId}%3d tasks=${si.numTasks}%3d " +
            f"wall=${t}%5d ms run=${si.taskMetrics.executorRunTime}%5d ms " +
            f"cpu=${si.taskMetrics.executorCpuTime / 1000000}%5d ms " +
            si.name.take(60))
        }
      })
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    (1 to 2).foreach { rep =>
      println(s"--- decomp rep $rep")
      val q = e.filter(col("id") < 8)
      val q1 = e.filter(col("id") === 0)
      val small = e.filter(col("id") % 10 === 0).localCheckpoint(true)
      import org.apache.spark.metrics.source.CodegenMetrics
      def compiles: Long = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
      def compMs: Double =
        CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
      var c0 = compiles; var m0 = compMs
      time("encode_only")(graft.operators.Similarity.pqEncode(e, q, 4).count())
      println(s"[c] compiles=${compiles - c0} ms~${compMs - m0}")
      c0 = compiles; m0 = compMs
      time("pq_q8_n2000")(graft.operators.Similarity.pqTopK(q, e, q, 3, 4).count())
      println(s"[c] compiles=${compiles - c0} ms~${compMs - m0}")
      c0 = compiles; m0 = compMs
      time("pq_q1_n2000")(graft.operators.Similarity.pqTopK(q1, e, q, 3, 4).count())
      println(s"[c] compiles=${compiles - c0} ms~${compMs - m0}")
      c0 = compiles; m0 = compMs
      time("pq_q8_n200")(graft.operators.Similarity.pqTopK(q, small, q, 3, 4).count())
      println(s"[c] compiles=${compiles - c0} ms~${compMs - m0}")
      if (rep == 2)
        graft.operators.Similarity.pqTopK(q, e, q, 3, 4).explain("formatted")
    }
    spark.stop()
  }
}
