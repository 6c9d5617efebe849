package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import java.nio.file.{Files, Paths}

/** Executed-plan audit over EVERY graded query (dev tool; the r19
  * optimization checklist artifact): one TSV row per query with the
  * shuffle count, join strategies, window/sort/codegen counts, and the
  * scan-pruning evidence (ReadSchema width + pushed-filter presence per
  * parquet scan). Runs each query once (collect — AQE-final plans) at
  * the given SF.
  * Usage: runMain graft.tools.PlanAudit <sfDir> <outFile>
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanAudit <sfDir> <outFile>")
    val (dir, outFile) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      p +: kids.flatMap(flatten)
    }

    val sb = new StringBuilder
    sb.append("query\texchanges\tbroadcast_ex\tbhj\tsmj\tshj\tbnlj\twindows\tsorts\twsc\tscans\tscan_cols\tpushed\n")
    var failures = 0
    graft.Queries.all.foreach { case (name, fn, _) =>
      try {
        val df = fn(spark, dir)
        df.collect()
        val nodes = flatten(df.queryExecution.executedPlan)
        def count(pred: SparkPlan => Boolean) = nodes.count(pred)
        val scans = nodes.collect { case f: FileSourceScanExec => f }
        val scanCols = scans.map(_.output.length).mkString(",")
        val pushed = scans.map(f =>
          if (f.metadata.getOrElse("PushedFilters", "[]") != "[]") "Y" else "n")
          .mkString(",")
        sb.append(Seq(name,
          count(_.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
          count(_.isInstanceOf[org.apache.spark.sql.execution.exchange.BroadcastExchangeExec]),
          count(_.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
          count(_.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
          count(_.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec]),
          count(_.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
          count(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
          count(_.isInstanceOf[org.apache.spark.sql.execution.SortExec]),
          count(_.isInstanceOf[WholeStageCodegenExec]),
          scans.length, scanCols, pushed).mkString("\t"))
        sb.append("\n")
      } catch { case e: Throwable =>
        failures += 1
        sb.append(s"$name\tERROR\t${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.take(1).mkString.take(120)}\n")
      }
      graft.Blocks.sweep(spark.sparkContext)
      spark.catalog.listTables().collect()
        .filter(t => t.isTemporary && t.name.matches(".*_[0-9a-f]{32}"))
        .foreach(t => spark.catalog.dropTempView(t.name))
      System.gc()
    }
    Files.writeString(Paths.get(outFile), sb.toString)
    println(s"[plan-audit] wrote $outFile (failures=$failures)")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
