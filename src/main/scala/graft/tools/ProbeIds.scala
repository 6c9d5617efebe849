package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scratch: is denseIds-over-globalRank stable when its output frame is
  * consumed twice in one plan (the etl_subtree_agg shape)?
  *
  * Round-9 finding: at local[4] this probe passed while Verify at the
  * bench config FAILED etl_subtree_agg (49 hash diffs) — because
  * globalRank's bucketed frame fed both its offset aggregate and its
  * final join, and whether those two consumers share one range
  * exchange (ReusedExchange) is plan/scale-dependent; separate
  * materializations sample different RangePartitioner boundaries (the
  * seed includes the RDD id), and offsets-from-one + positions-from-
  * another corrupts ranks. Fixed with an eager localCheckpoint inside
  * globalRank; this probe stays as the regression's shape.
  */
object ProbeIds {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val ranked = graft.operators.Ids.denseIds(
      spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("m")),
      "o_orderkey", buckets = 32)
      .select(col("gid").as("id"), col("m"), col("o_orderkey"))
    println("n=" + ranked.count() + " distinct gid=" +
      ranked.select("id").distinct().count())
    // gid vs the window truth
    import org.apache.spark.sql.expressions.Window
    val truth = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"),
        row_number().over(Window.orderBy("o_orderkey")).cast("long").as("tid"))
    val bad = ranked.join(truth, "o_orderkey")
      .filter(col("id") =!= col("tid")).count()
    println("mismatched ids vs window truth: " + bad)
    // two consumers of the same ranked frame: do they see the same ids?
    val e = ranked.filter(col("id") >= 8)
      .select(col("id"), expr("id div 2").as("parent"))
    val joined = e.join(ranked.select(col("id"), col("m")), "id")
    println("join rows=" + joined.count() +
      " (expected " + e.count() + ")")
    spark.stop()
  }
}
