package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (r15): recall-vs-iters sweep for the rank-stripe init on the
  * 40-cluster fixture — the r14 id-residue stripes were accidentally
  * CRT-aligned with the fixture's `i % 40` cluster assignment (lcm(40,
  * stripe) seeding same-cluster pairs), so the honest structure-free
  * init needs its own convergence curve.
  */
object ProbeNnd2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def unit(): Array[Float] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val cents = Array.fill(40)(unit())
    val cl = (0 until 1000).map { i =>
      val c = cents(i % 40)
      val noise = unit()
      (i.toLong, c.zip(noise).map { case (a, b) => a + 0.35f * b })
    }.toDF("id", "vec")
    def edges(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = edges(graft.operators.Similarity.bruteForceTopK(cl, cl, 10))
    for (iters <- Seq(2, 3, 5); bits <- Seq(4, 6); rings <- Seq(1, 2, 4, 8)) {
      val t0 = System.nanoTime()
      val approx = edges(
        graft.operators.Similarity.nnDescentGraph(cl, 10, iters, bits,
          initRings = rings))
      val recall = (approx & exact).size.toDouble / exact.size
      println(f"CLUSTERED k=10 iters=$iters bits=$bits rings=$rings " +
        f"recall=$recall%.4f (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    spark.stop()
  }
}
