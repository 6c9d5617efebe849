package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.TextAnalysis

/** Phase-level timing for e4_subword_budget (dev tool): separates the
  * subword-counts materialization from the budget window tail.
  * Usage: runMain graft.tools.ProbeSubword2 <sfDir> [cpus]
  */
object ProbeSubword2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id * 2)").collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    def time(name: String)(f: => Any): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[probe2] $name%-28s $best%6.3f s")
    }
    time("counts_checkpoint") {
      TextAnalysis.subwordCounts(docs, "doc_id", "text", 256, 6)
        .localCheckpoint(true)
    }
    val counts = TextAnalysis.subwordCounts(docs, "doc_id", "text", 256, 6)
      .localCheckpoint(true)
    time("budget_tail_given_counts") {
      TextAnalysis.tokenBudget(docs, "doc_id", "text", "source", 8000L,
        Some(counts)).orderBy("source", "doc_id").count()
    }
    time("budget_whitespace") {
      TextAnalysis.tokenBudget(docs, "doc_id", "text", "source", 8000L, None)
        .orderBy("source", "doc_id").count()
    }
    time("counts_count_only") {
      TextAnalysis.subwordCounts(docs, "doc_id", "text", 256, 6).count()
    }
    spark.stop()
  }
}
