package graft.tools

import org.apache.spark.sql.SparkSession

/** Reliable-checkpoint cost curve (r12/r13 carryover): the same
  * iterative query (`e2_pagerank`, 6 integer rounds through
  * `Blocks.cut`) run in LOCAL posture (no checkpoint dir →
  * localCheckpoint) vs CLUSTER posture (`setCheckpointDir` → persist →
  * reliable checkpoint files → eager reclamation by `Blocks.free`) —
  * what fault tolerance for a 30-round loop actually costs per round.
  *
  * Usage: runMain graft.tools.ProbeCkpt [sfDir] (default sf0.1);
  * prints min-of-3 for each posture. Measured numbers live in the
  * `Blocks.cut` scaladoc.
  */
object ProbeCkpt {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def run(): Double = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.Queries.e2_pagerank(spark, dir).count()
        graft.Blocks.sweep(spark.sparkContext)
        (System.nanoTime() - t0) / 1e9
      }
      reps.min
    }
    val local = run()
    val ckptDir = java.nio.file.Files
      .createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(ckptDir)
    val reliable = run()
    println(f"[ckpt] e2_pagerank local=$local%.2f s  reliable=$reliable%.2f s  " +
      f"overhead=${reliable / local}%.2fx  (dir=$ckptDir)")
    spark.stop()
  }
}
