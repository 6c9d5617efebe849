package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** Scratch: wall-clock per stage for the graded as-of queries (dev
  * tool) — which stage owns the native formulation's gap, and how much
  * is between-stage scheduling (AQE barriers) vs task time?
  */
object ProbeAsOf3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id * 2)").collect()
    val stages = ArrayBuffer[(Int, Long, Long, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += ((si.stageId, wall, si.taskMetrics.executorRunTime,
            si.taskMetrics.shuffleWriteMetrics.recordsWritten, si.numTasks))
        }
      }
    })
    Seq("j_asof", "j_asof_native").foreach { n =>
      val fn = graft.Queries.all.find(_._1 == n).get._2
      (1 to 2).foreach { _ => fn(spark, dir).count(); graft.Blocks.sweep(spark.sparkContext) }
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      println(f"=== $n  total=$total%.3f s")
      val snap = stages.synchronized(stages.toSeq).sortBy(_._1)
      snap.foreach { case (id, wall, run, recs, nt) =>
        println(f"  stage $id%3d  wall=${wall / 1000.0}%6.3f s  taskRun=${run / 1000.0}%7.3f s  shufWrite=$recs%8d  tasks=$nt")
      }
      println(f"  stageWallSum=${snap.map(_._2).sum / 1000.0}%.3f s  (gap to total = scheduling/driver)")
      graft.Blocks.sweep(spark.sparkContext)
    }
    spark.stop()
  }
}
