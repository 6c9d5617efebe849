package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-9 check for the INLINED as-of codegen: with
  * `spark.sql.codegen.fallback=false` a janino compile failure in the
  * generated merge would throw instead of silently running interpreted,
  * so a green run here proves the generated Java is real. Prints the
  * formatted plan's codegen span plus the same full-materialization A/B
  * as ProbeAsOf4.
  */
object ProbeAsOf5 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id * 2)").collect()
    val df = graft.Queries.all.find(_._1 == "j_asof_native").get._2(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    println("[cg] AsOfJoinExec in codegen stage: " +
      plan.linesIterator.filter(_.contains("AsOfJoin")).mkString(" | "))
    def best(f: => Unit): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f
        graft.Blocks.sweep(spark.sparkContext); System.gc()
        (System.nanoTime() - t0) / 1e9
      }.min
    Seq("j_asof", "j_asof_native").foreach { n =>
      val fn = graft.Queries.all.find(_._1 == n).get._2
      val cnt = best(fn(spark, dir).count())
      val full = best {
        val d = fn(spark, dir)
        d.select(xxhash64(d.columns.map(col): _*).as("h"))
          .agg(sum(col("h"))).collect()
      }
      println(f"[ab] $n%-16s count=$cnt%6.3f s   full-materialize=$full%6.3f s")
    }
    spark.stop()
  }
}
