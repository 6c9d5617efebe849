package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B probe for the r19 globalRank small-frame gate (dev tool): times
  * the named queries in ONE session with the gate on (default) and with
  * `spark.graft.ids.driver=false` (the distributed path — the pre-r19
  * behavior for sub-gate frames), min-of-n each, so the delta isolates
  * the gate from host noise.
  * Usage: runMain graft.tools.ProbeRank <sfDir> <reps> <query>...
  */
object ProbeRank {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ProbeRank <sfDir> <reps> <query>...")
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

    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.Blocks.sweep(spark.sparkContext)
        spark.catalog.listTables().collect()
          .filter(t => t.isTemporary && t.name.matches(".*_[0-9a-f]{32}"))
          .foreach(t => spark.catalog.dropTempView(t.name))
        System.gc()
        dt
      }
      times.min
    }

    val qs = graft.Queries.all.filter(q => names(q._1))
    // interleave A/B per query so load waves hit both arms
    qs.foreach { case (name, fn, _) =>
      val on = timeOne(name, fn)
      spark.conf.set("spark.graft.ids.driver", "false")
      val off = try timeOne(name, fn)
        finally spark.conf.unset("spark.graft.ids.driver")
      val on2 = timeOne(name, fn)
      println(f"[probe-rank] $name%-24s gate=$on%.3f/$on2%.3f s  dist=$off%.3f s")
    }
    spark.stop()
  }
}
