package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Stage-level decomposition of subwordCounts (dev tool): times each
  * sub-frame in isolation to find the dominant cost.
  * Usage: runMain graft.tools.ProbeSubword3 <sfDir> [cpus]
  */
object ProbeSubword3 {
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
      println(f"[probe3] $name%-28s $best%6.3f s")
    }
    val maxSubLen = 6
    // stage 1: pre-token frequency frame
    val ptf0 = docs.select(explode(TextAnalysis.preTokens(col("text"))).as("pt"))
      .groupBy("pt").agg(count(lit(1)).as("cf"))
    time("ptf_materialize")(ptf0.localCheckpoint(true))
    val ptf = ptf0.localCheckpoint(true)
    println(s"[probe3] distinct_pts=${ptf.count()}")
    // stage 2: vocab from ptf
    time("vocab_from_ptf")(
      TextAnalysis.subwordVocabFromPtf(ptf, 256, maxSubLen).select("sub")
        .localCheckpoint(true))
    val vocab = TextAnalysis.subwordVocabFromPtf(ptf, 256, maxSubLen)
      .select("sub").localCheckpoint(true)
    // stage 3: longest-match map
    val pts = ptf.select(col("pt"), length(col("pt")).as("len"))
    def matchedF = pts
      .select(col("pt"), col("len"),
        explode(sequence(lit(0), col("len") - 1)).as("i"))
      .select(col("pt"), col("len"), col("i"),
        explode(sequence(lit(2), lit(maxSubLen))).as("l"))
      .filter(col("i") + col("l") <= col("len"))
      .select(col("pt"), col("i"), col("l"),
        expr("substr(pt, i + 1, l)").as("sub"))
      .join(broadcast(vocab), Seq("sub"))
      .groupBy("pt", "i").agg(max(col("l")).as("ml"))
      .groupBy("pt")
      .agg(map_from_entries(collect_list(struct(col("i"), col("ml"))))
        .as("mlm"))
    time("matched_map")(matchedF.localCheckpoint(true))
    val matched = matchedF.localCheckpoint(true)
    // stage 4: fold walk
    def ptCountsF = pts.join(matched, Seq("pt"), "left")
      .select(col("pt"),
        aggregate(
          sequence(lit(1), col("len")),
          struct(lit(0).as("pos"), lit(0L).as("cnt")),
          (acc, _) => {
            val pos = acc.getField("pos")
            val step = coalesce(element_at(col("mlm"), pos), lit(1))
            when(pos < col("len"),
              struct((pos + step).as("pos"),
                (acc.getField("cnt") + lit(1L)).as("cnt")))
              .otherwise(acc)
          },
          acc => acc.getField("cnt")).as("n_sub"))
    time("fold_walk")(ptCountsF.localCheckpoint(true))
    val ptCounts = ptCountsF.localCheckpoint(true)
    // stage 5: per-doc join + agg
    time("per_doc_agg")(
      docs.select(col("doc_id").as("id"),
          explode(TextAnalysis.preTokens(col("text"))).as("pt"))
        .join(ptCounts, Seq("pt"))
        .groupBy("id").agg(sum(col("n_sub")).as("n_subword"))
        .localCheckpoint(true))
    spark.stop()
  }
}
