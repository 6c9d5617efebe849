package graft.tools

import org.apache.spark.sql.SparkSession

/** Codegen-compile auditor (dev tool): runs the named graded queries
  * with the CodeGenerator/WholeStageCodegen loggers at DEBUG so a
  * janino compile failure dumps the full generated source instead of
  * silently falling back to interpreted execution. Found round 11's
  * forward-as-of bug: a generated condition CONTINUED a line with
  * `||`, and the nested stripMargin templates ate the pipes (margin
  * char!), producing uncompilable Java that every run had been
  * quietly interpreting.
  *
  * Usage: runMain graft.tools.DumpGen [sfDir] [queryName ...]
  */
object DumpGen {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSet
      else Set("j_asof_forward", "j_asof_nearest", "j_asof_native")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    Seq("org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
      "org.apache.spark.sql.execution.WholeStageCodegenExec").foreach { l =>
      org.apache.log4j.LogManager.getLogger(l)
        .setLevel(org.apache.log4j.Level.DEBUG)
    }
    graft.Queries.all.filter(q => names(q._1)).foreach { case (name, fn, _) =>
      println(s"== $name rows=${fn(spark, dir).count()}")
    }
    spark.stop()
  }
}
