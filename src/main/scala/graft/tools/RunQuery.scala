package graft.tools

import org.apache.spark.sql.SparkSession

/** Run one graded query by name and print its rows (dev tool, not part
  * of the graded surface) — the quickest way to eyeball a query's
  * output while authoring its oracle. Usage:
  *   runMain graft.tools.RunQuery <name> [sfDir] [explain]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RunQuery <name> [sfDir] [explain]")
    val name = args(0)
    // "explain" is a flag, not the sfDir: `RunQuery q explain` must not
    // read tables from a directory literally named "explain"
    val dir = args.drop(1).find(_ != "explain")
      .getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
    val df = q(spark, dir)
    if (args.contains("explain")) df.explain("formatted")
    df.show(200, truncate = false)
    println(s"[runquery] $name rows=${df.count()}")
    spark.stop()
  }
}
