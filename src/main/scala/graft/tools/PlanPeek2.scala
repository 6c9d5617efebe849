package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch (r15): dump the executed plans of the new DS-Q14/Q23 shapes
  * to see what is honestly pinnable (ReusedExchange across the
  * INTERSECT CTE's three consumers; CTE-chain aggregates).
  */
object PlanPeek2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("sql_tpcds_q14", "sql_tpcds_q23")) {
      val fn = graft.Queries.all.find(_._1 == q).get._2
      val df = fn(spark, "/root/testdata/sf0.001")
      df.collect()
      println(s"===== $q =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
