package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Phase timing of the hierarchy/subtree family (dev tool).
  * Usage: runMain graft.tools.ProbeHier <sfDir> <reps>
  */
object ProbeHier {
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
    import graft.operators.Ids
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep ---")
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val ids = time("denseIds+cut") {
        graft.Blocks.cut(Ids.denseIds(
          orders.select(col("o_orderkey"),
            col("o_totalprice").cast(DecimalType(18, 2)).as("m")),
          "o_orderkey", buckets = 32)
          .select(col("gid").as("id"), col("m")))
      }
      val e = ids.filter(col("id") >= 8)
        .select(col("id"), expr("id div 2").as("parent"))
      val rd = time("rootAndDepth+count") {
        val r = graft.operators.Hierarchy.rootAndDepth(e, "id", "parent")
        r.count(); r
      }
      val mp = time("materializedPaths+count") {
        val r = graft.operators.Hierarchy.materializedPaths(e, "id", "parent")
        r.count(); r
      }
      time("closure agg (from paths)") {
        mp.select(col("id"),
            explode(split(col("path"), "/").cast("array<long>")).as("ancestor"))
          .join(ids, "id")
          .groupBy(col("ancestor").as("id"))
          .agg(count(lit(1)).as("n"), sum(col("m")).as("t"))
          .filter(col("id") < 64)
          .orderBy("id").count()
      }
      graft.Blocks.sweep(spark.sparkContext)
      System.gc()
    }
    spark.stop()
  }
}
