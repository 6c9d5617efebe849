package graft.star

import org.apache.spark.sql.SparkSession
import graft.Graft

/** User-facing CLI for the full star-schema ETL — the engine's equivalent
  * of the reference's `main` (`/root/reference/src/FullETLGenerator.java:39-55`).
  * Usage: runMain graft.star.StarCli <input.csv> <outDir>
  */
object StarCli {
  def main(args: Array[String]): Unit = {
    val Array(inPath, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-star-etl")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.tune(spark)
    val star = StarSchemaJob.run(spark, inPath, outDir)
    println(s"dims: geracao=${star.dimGeracao.count()} status=${star.dimStatus.count()} " +
      s"localizacao=${star.dimLocalizacao.count()} empreendimento=${star.dimEmpreendimento.count()} " +
      s"tempo=${star.dimTempo.count()} fato=${star.fato.count()}")
    spark.stop()
  }
}
