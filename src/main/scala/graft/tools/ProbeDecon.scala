package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 probe: the semantic-decontamination scale curve. Train
  * grows with the corpus (the 100 TB side); eval is pinned to the 1×
  * slice (benchmark sets don't grow with the training corpus). Expected
  * shape: both variants are ONE train scan against a broadcast eval
  * index, so cost ∝ train volume — linear, with the exact path paying
  * |eval| dot products per row and the LSH path only bucket collisions.
  *
  * Usage: runMain graft.tools.ProbeDecon [srcSfDir] [scales]
  * (defaults /root/testdata/sf0.1 and 1,10; reuses ProbeScale's
  * replicated /tmp/graft-scale/x{k} embeddings).
  *
  * MEASURED round 16 (idle host, local[32], min of 2, fixed 400-vector
  * eval set, train 1,600 → 19,600 over ProbeScale's x1/x10 replicas):
  * exact 1.14 → 1.10 s, LSH prefilter 0.55 → 0.43 s — FLAT at ~12×
  * train volume: job fixed cost dominates entirely at these sizes, and
  * the asymptote is the one train scan by construction (no train
  * shuffle in either plan; hit rows are the only shuffled data, and
  * they grow with contamination, not with train).
  */
object ProbeDecon {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = args.drop(1).headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 10))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id * 2)").collect()

    val span = spark.read.parquet(s"$srcDir/embeddings.parquet")
      .agg(max(col("vec_id"))).collect()(0).getLong(0) + 1L

    scales.foreach { k =>
      val dir = s"/tmp/graft-scale/x$k"
      if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
        println(s"[decon] building $dir (k=$k) ...")
        ProbeScale.replicate(spark, srcDir, dir, k)
      }
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      // eval pinned to the 1x slice: benchmark sets don't grow
      val eval = e.filter(col("id") < span && pmod(col("id"), lit(5)) === 0)
      val train = e.filter(col("id") >= span || pmod(col("id"), lit(5)) =!= 0)
      val (nt, ne) = (train.count(), eval.count())
      def time(f: => Long): (Double, Long) = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        graft.Blocks.sweep(spark.sparkContext) // cleanup outside the measured window
        (dt, n)
      }.minBy(_._1)
      val (se, re) = time(graft.operators.Similarity
        .semanticDecontaminateExact(train, eval, threshold = 0.3).count())
      val (sl, rl) = time(graft.operators.Similarity
        .semanticDecontaminate(train, eval, threshold = 0.2).count())
      println(f"[decon] x$k%-3d train=$nt%8d eval=$ne%6d " +
        f"exact=$se%6.2f s ($re rows)  lsh=$sl%6.2f s ($rl rows)")
    }
    spark.stop()
  }
}
