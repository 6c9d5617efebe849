package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** Scratch: isolate where j_asof_native loses time vs j_asof (dev tool).
  * Times the bare backward merge (no orderBy / projection wrapper) on
  * pre-materialized inputs, repeated, both formulations.
  */
object ProbeAsOf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id * 2)").collect()
    val ev = graft.functions.eventTimeMillis(spark.read.parquet(s"$dir/events.parquet"))
      .select(col("user_id"), col("ts"), col("event_id"))
      .localCheckpoint(true)
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate").as("ts"))
      .agg(max(col("o_orderkey")).as("asof_orderkey"),
        max_by(col("o_totalprice"), col("o_orderkey")).as("asof_price"))
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
        col("asof_orderkey"), col("asof_price"))
      .localCheckpoint(true)
    def time(name: String)(f: => Long): Unit = (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      val n = f
      println(f"[t] $name%-14s rep$r ${(System.nanoTime() - t0) / 1e9}%6.3f s rows=$n")
    }
    time("window")(AsOfJoin.backward(ev, orders, "user_id", "ts",
      Seq("asof_orderkey", "asof_price")).count())
    time("native")(AsOfJoin.nativeBackward(ev, orders, "user_id", "ts",
      Seq("asof_orderkey", "asof_price")).count())
    time("window2")(AsOfJoin.backward(ev, orders, "user_id", "ts",
      Seq("asof_orderkey", "asof_price")).count())
    time("prep_l")(ev.repartition(32, col("user_id"))
      .sortWithinPartitions("user_id", "ts").count())
    time("prep_r")(orders.repartition(32, col("user_id"))
      .sortWithinPartitions("user_id", "ts").count())
    val nat = AsOfJoin.nativeBackward(ev, orders, "user_id", "ts",
      Seq("asof_orderkey", "asof_price"))
    nat.queryExecution.toRdd.count()
    println("=== native FINAL adaptive plan ===")
    println(nat.queryExecution.executedPlan)
    val win = AsOfJoin.backward(ev, orders, "user_id", "ts",
      Seq("asof_orderkey", "asof_price"))
    win.queryExecution.toRdd.count()
    println("=== window FINAL adaptive plan ===")
    println(win.queryExecution.executedPlan)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("native_noaqe")(AsOfJoin.nativeBackward(ev, orders, "user_id", "ts",
      Seq("asof_orderkey", "asof_price")).count())
    time("window_noaqe")(AsOfJoin.backward(ev, orders, "user_id", "ts",
      Seq("asof_orderkey", "asof_price")).count())
    spark.stop()
  }
}
