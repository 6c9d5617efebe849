package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-timing of the per-query fixed costs every graded query pays
  * (dev tool): Graft.tune, spark.read.parquet plan creation (listing +
  * schema inference), analysis, and a trivial action.
  * Usage: runMain graft.tools.ProbeOverhead <sfDir>
  */
object ProbeOverhead {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id * 2)").collect()
    def time[T](name: String, n: Int)(f: => T): Unit = {
      // warm once
      f
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      println(f"[ovh] $name%-38s ${(System.nanoTime() - t0) / 1e6 / n}%9.3f ms/op (n=$n)")
    }
    time("Graft.tune", 100)(graft.Graft.tune(spark))
    time("read.parquet(lineitem) create", 20)(
      spark.read.parquet(s"$dir/lineitem.parquet"))
    time("read.parquet(customer) create", 20)(
      spark.read.parquet(s"$dir/customer.parquet"))
    val sch = spark.read.parquet(s"$dir/lineitem.parquet").schema
    time("read.schema().parquet(lineitem) create", 20)(
      spark.read.schema(sch).parquet(s"$dir/lineitem.parquet"))
    time("df.count lineitem (scan+agg)", 10)(
      spark.read.parquet(s"$dir/lineitem.parquet").count())
    time("analyze+opt simple agg plan", 20) {
      val df = spark.read.parquet(s"$dir/customer.parquet")
        .groupBy("c_mktsegment").count()
      df.queryExecution.executedPlan
    }
    time("trivial collect (range sum)", 20)(
      spark.range(1000).selectExpr("sum(id)").collect())
    time("empty job (parallelize 1)", 20)(
      spark.sparkContext.parallelize(Seq(1), 1).count())
    spark.stop()
  }
}
