package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-level timing of the j_stream_restart recipe (dev tool): fixture
  * writes vs incarnation 1 vs incarnation 2 vs final read — so streaming
  * optimization targets the phase that actually costs.
  * Usage: runMain graft.tools.ProbeStreamPhases <sfDir> <reps>
  */
object ProbeStreamPhases {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id * 2)").collect()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep ---")
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val run = java.util.UUID.randomUUID().toString.take(8)
      val root = new java.io.File(s"/tmp/graft_jsrp_$run")
      val vDir = new java.io.File(root, "views"); vDir.mkdirs()
      val cDir = new java.io.File(root, "clicks"); cDir.mkdirs()
      val ckpt = new java.io.File(root, "ckpt").toString
      val outDir = new java.io.File(root, "out").toString
      val (v1, c1, v2, c2, v3, c3) = time("fixture frames")(
        graft.Queries.jsi2FixtureProbe(spark, dir))
      def runIncarnation(tag: String): Unit = {
        val vs = spark.readStream.schema(v1.schema).option("maxFilesPerTrigger", 1)
          .parquet(vDir.toString)
          .withColumn("view_ts", timestamp_millis(col("vms")))
        val cs = spark.readStream.schema(c1.schema).option("maxFilesPerTrigger", 1)
          .parquet(cDir.toString)
          .withColumn("click_ts", timestamp_millis(col("cms")))
        val q = time(s"$tag start") {
          graft.streaming.StreamingOps.intervalJoin(vs, cs, "user_id",
            "view_ts", "click_ts", lagMinutes = 10, watermark = "10 minutes")
          .select(col("view_id"), col("user_id"), col("click_id"),
            col("vms").as("view_ms"), col("cms").as("click_ms"))
          .writeStream.format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        }
        try time(s"$tag processAll")(q.processAllAvailable())
        finally time(s"$tag stop")(q.stop())
      }
      val now = System.currentTimeMillis()
      time("write f1 x2") {
        graft.Queries.writeSequenced(vDir, "f1.parquet", now - 180000, v1)
        graft.Queries.writeSequenced(cDir, "f1.parquet", now - 180000, c1)
      }
      runIncarnation("incarnation1")
      time("write f2/f3 x4") {
        graft.Queries.writeSequenced(vDir, "f2.parquet", now - 120000, v2)
        graft.Queries.writeSequenced(vDir, "f3.parquet", now - 60000, v3)
        graft.Queries.writeSequenced(cDir, "f2.parquet", now - 120000, c2)
        graft.Queries.writeSequenced(cDir, "f3.parquet", now - 60000, c3)
      }
      runIncarnation("incarnation2")
      time("final read+count") {
        spark.read.parquet(outDir).orderBy("view_id", "click_id").count()
      }
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      graft.Blocks.sweep(spark.sparkContext)
      System.gc()
    }
    spark.stop()
  }
}
