package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Scratch: stage-level timing of Pipelines.pretrainPack (dev tool). */
object ProbePipe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val keptIds = time("c4 keptIds count") {
      val k = TextAnalysis.c4FilterFlags(docs, "doc_id", "text")
        .filter(col("kept") === 1).select("doc_id")
      k.count(); k
    }
    val semi = time("semi join count") {
      val s = docs.join(keptIds, Seq("doc_id"), "left_semi"); s.count(); s
    }
    val stripped = time("stripSharedPassages count") {
      val st = Dedup.stripSharedPassages(semi, "doc_id", "text", 32); st.count(); st
    }
    val cleaned = time("cleaned join+checkpoint") {
      val c = stripped.filter(length(col("clean_text")) > 0)
        .join(docs.select("doc_id", "lang", "source"), Seq("doc_id"))
        .localCheckpoint(true)
      c
    }
    val rebal = time("mixture count") {
      val r = TextAnalysis.mixtureSample(cleaned, "doc_id", "lang"); r.count(); r
    }
    time("pack count") {
      TextAnalysis.packSequences(rebal, "doc_id", "clean_text", "source", 256).count()
    }
    time("full pretrainPack count") {
      graft.Pipelines.pretrainPack(docs, "doc_id", "text", "lang", "source").count()
    }
    spark.stop()
  }
}
