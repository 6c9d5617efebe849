package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for representative queries so the
  * shuffle/broadcast/pushdown story can be audited (dev tool).
  * Usage: runMain graft.tools.ExplainAudit <sfDir> [queryName ...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSet else Set(
      "star_fact", "e6_group_agg", "e7_window", "e8_topk", "e2_minhash",
      "e3_cosine_topk", "e11_sessions", "p1_projection")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    graft.Queries.all.filter(q => names(q._1)).foreach { case (name, fn, _) =>
      println(s"\n========== $name ==========")
      fn(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
