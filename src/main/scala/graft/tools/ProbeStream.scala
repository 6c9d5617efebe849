package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Phase breakdown for the expensive streaming twins: how much of
  * e11_stream_neardup's ~4 s is micro-batch machinery (state-store
  * commits scale with shuffle-partition count, not data) vs the
  * signature computation itself, and what per-stream state-partition
  * sizing buys. Drives the decision recorded in StreamingOps scaladoc.
  */
object ProbeStream {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"$label%-42s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id*2)").collect()
    spark.read.parquet(s"$dir/documents.parquet").count()

    def runStream(parts: Int): Long = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val schema = spark.read.parquet(s"$dir/documents.parquet").schema
        val src = spark.readStream.schema(schema)
          .option("pathGlobFilter", "documents.parquet").parquet(dir)
          .withColumn("ts", to_timestamp(lit("2020-01-01 00:00:00")))
        val qn = "p_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val q = graft.streaming.StreamingOps
          .nearDupDedup(src, "ts", "text", bits = 24)
          .writeStream.format("memory").queryName(qn)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        spark.table(qn).count()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    for (r <- 1 to 3) {
      println(s"--- rep $r")
      time("batch simhash HOF") {
        spark.read.parquet(s"$dir/documents.parquet")
          .select(Dedup.simhash(Dedup.tokens(col("text")), 24).as("s"))
          .distinct().count()
      }
      time("batch simhash fused") {
        spark.read.parquet(s"$dir/documents.parquet")
          .select(Dedup.simhashText(col("text"), 24).as("s"))
          .distinct().count()
      }
      time("stream parts=32")(runStream(32))
      time("stream parts=8")(runStream(8))
      time("stream parts=4")(runStream(4))
      val qn2 = time("full query (stream + reprojection)") {
        graft.Queries.e11_stream_neardup(spark, dir).count()
      }
      println(s"  survivors=$qn2")
      graft.Blocks.sweep(spark.sparkContext); System.gc()
    }
    spark.stop()
  }
}
