package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-job wall-clock profile of one or more graded queries (dev tool).
  * Shows where a composite query's seconds go — fixture prep, loop
  * rounds, final action — so optimization targets the real cost.
  * Usage: runMain graft.tools.ProfileQuery <sfDir> <reps> <query> [query...]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ProfileQuery <sfDir> <reps> <query>...")
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id * 2)").collect()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.put(js.jobId, (js.time, desc, js.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (t0, d, nt) =>
          done.add((je.jobId, t0, je.time, d, nt))
        }
      }
    })

    graft.Queries.all.filter(q => names(q._1)).foreach { case (name, fn, _) =>
      (1 to reps).foreach { rep =>
        done.clear()
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"\n===== $name rep $rep: $wall%.3f s (rows=$n) =====")
        import scala.jdk.CollectionConverters._
        val sorted = done.asScala.toSeq.sortBy(_._2)
        val covered = sorted.map(j => j._3 - j._2).sum / 1e3
        sorted.foreach { case (id, s, e, d, nt) =>
          println(f"  job $id%4d ${(e - s) / 1e3}%8.3f s  tasks=$nt%4d  ${d.take(100)}")
        }
        println(f"  [jobs total $covered%.3f s of $wall%.3f s wall; gap=${wall - covered}%.3f s]")
        graft.Blocks.sweep(spark.sparkContext)
        spark.catalog.listTables().collect()
          .filter(t => t.isTemporary && t.name.matches(".*_[0-9a-f]{32}"))
          .foreach(t => spark.catalog.dropTempView(t.name))
        System.gc()
      }
    }
    spark.stop()
  }
}
