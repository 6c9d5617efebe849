package graft.tools

import org.apache.spark.sql.SparkSession

/** In-JVM interleaved A/B for the AQE sort-merge→shuffled-hash runtime
  * conversion (dev tool): per query, times min-of-n with the threshold
  * ON (64MB, the shipped Graft.tune value), OFF (0 = Spark default),
  * then ON again — the ON/ON spread brackets host noise so the OFF
  * delta is attributable. Usage: ProbeShj <sfDir> <reps> <query>...
  */
object ProbeShj {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ProbeShj <sfDir> <reps> <query>...")
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
    val key = "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"

    def timeOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
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

    var (sumOn, sumOff) = (0.0, 0.0)
    graft.Queries.all.filter(q => names(q._1)).foreach { case (name, fn, _) =>
      spark.conf.set(key, "64MB")
      val on1 = timeOne(fn)
      spark.conf.set(key, "0")
      val off = timeOne(fn)
      spark.conf.set(key, "64MB")
      val on2 = timeOne(fn)
      sumOn += math.min(on1, on2); sumOff += off
      println(f"[probe-shj] $name%-20s on=$on1%.3f/$on2%.3f  off=$off%.3f")
    }
    println(f"[probe-shj] TOTAL on=$sumOn%.3f (min-of-two-arms) off=$sumOff%.3f")
    spark.stop()
  }
}
