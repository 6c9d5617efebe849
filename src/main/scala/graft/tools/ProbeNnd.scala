package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: NN-Descent recall sweep on the sf0.01 embeddings — which
  * (k, iters, initBits, reverse-cap) reaches 0.9 recall on this data?
  */
object ProbeNnd {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    def edges(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (k <- Seq(3, 10)) {
      val exact = edges(graft.operators.Similarity.bruteForceTopK(e, e, k))
      for (iters <- Seq(2, 5, 8); bits <- Seq(4, 6)) {
        val t0 = System.nanoTime()
        val approx = edges(
          graft.operators.Similarity.nnDescentGraph(e, k, iters, bits))
        val recall = (approx & exact).size.toDouble / exact.size
        println(f"k=$k iters=$iters bits=$bits recall=$recall%.4f " +
          f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
      }
    }

    // clustered fixture: 40 centroids, 25 points each, noise 0.35 — the
    // regime a kNN graph is built for (sf0.01 embeddings are isotropic:
    // within-label avg cos 0.0016 vs cross 0.0003)
    val rnd = new scala.util.Random(42)
    def unit(): Array[Float] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val cents = Array.fill(40)(unit())
    val rows = (0 until 1000).map { i =>
      val c = cents(i % 40)
      val noise = unit()
      (i.toLong, c.zip(noise).map { case (a, b) => a + 0.35f * b })
    }
    import spark.implicits._
    val cl = rows.toDF("id", "vec")
    for (k <- Seq(5, 10)) {
      val exact = edges(graft.operators.Similarity.bruteForceTopK(cl, cl, k))
      for (iters <- Seq(2, 3, 5)) {
        val approx = edges(
          graft.operators.Similarity.nnDescentGraph(cl, k, iters))
        val recall = (approx & exact).size.toDouble / exact.size
        println(f"CLUSTERED k=$k iters=$iters recall=$recall%.4f")
      }
    }
    spark.stop()
  }
}
