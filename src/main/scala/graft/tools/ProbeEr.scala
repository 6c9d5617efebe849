package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.EntityRes

/** Scratch: stage-level timing of etl_entity_res at sf0.1 (dev tool).
  * Round-8 item: the q-gram prefix gate cut 8.08 -> 5.8 s but the
  * verdict bar is <= 2 s; find which stage holds the rest.
  */
object ProbeEr {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id * 2)").collect()
    val cust = spark.read.parquet(s"$dir/customer.parquet").localCheckpoint(true)
    println(s"customers: ${cust.count()}")

    def time(name: String)(f: => Long): Unit = (1 to 3).foreach { r =>
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s r$r  ${(System.nanoTime() - t0) / 1e9}%8.3f s  n=$n")
    }

    time("prefixGramKeys.count") {
      EntityRes.prefixGramKeys(cust, "c_custkey", "c_name",
        Seq("c_nationkey", "c_mktsegment"), 3, 2).count()
    }
    for (q <- Seq(3, 4, 5)) time(s"candidatePairs.count q=$q") {
      EntityRes.candidatePairs(cust, "c_custkey",
        Seq("c_nationkey", "c_mktsegment"), "c_name", "c_acctbal",
        nameDenom = 9.0, numScale = 1000.0, nameWeight = 0.7,
        threshold = 0.8, qgram = q).count()
    }
    val pfx = EntityRes.prefixGramKeys(cust, "c_custkey", "c_name",
      Seq("c_nationkey", "c_mktsegment"), 3, 2).localCheckpoint(true)
    time("selfjoin+distinct (pfx ckpt)") {
      val bc = Seq("c_nationkey", "c_mktsegment")
      pfx.as("x").join(pfx.as("y"),
          bc.map(c => col(s"x.$c") === col(s"y.$c")).reduce(_ && _) &&
            col("x.g") === col("y.g") && col("x.occ") === col("y.occ") &&
            col("x.id") < col("y.id"))
        .select(col("x.id").as("id1"), col("y.id").as("id2"))
        .distinct().count()
    }
    val pairs = EntityRes.candidatePairs(cust, "c_custkey",
        Seq("c_nationkey", "c_mktsegment"), "c_name", "c_acctbal",
        nameDenom = 9.0, numScale = 1000.0, nameWeight = 0.7,
        threshold = 0.8).select("id1", "id2").localCheckpoint(true)
    time("minLabel only (pairs ckpt)") {
      graft.operators.Components.minLabel(pairs, "id1", "id2",
        cust.select("c_custkey"), "c_custkey").count()
    }
    time("resolve.count") {
      EntityRes.resolve(cust, "c_custkey",
        Seq("c_nationkey", "c_mktsegment"), "c_name", "c_acctbal",
        nameDenom = 9.0, numScale = 1000.0, nameWeight = 0.7,
        threshold = 0.8).count()
    }
    time("full query (orderBy+collect)") {
      graft.Queries.etl_entity_res(spark, dir).collect().length.toLong
    }
    spark.stop()
  }
}
