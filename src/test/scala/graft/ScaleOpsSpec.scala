package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Dedup}
import graft.sources.Bucketing

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("as-of backward join: latest right row at or before each left ts") {
    val left = Seq((1L, 100L, "e1"), (1L, 250L, "e2"), (2L, 50L, "e3"))
      .toDF("k", "ms", "ev").withColumn("ts", timestamp_millis($"ms")).drop("ms")
    val right = Seq((1L, 100L, 10.0), (1L, 200L, 20.0), (2L, 60L, 30.0))
      .toDF("k", "ms", "px").withColumn("ts", timestamp_millis($"ms")).drop("ms")
    val got = AsOfJoin.backward(left, right, "k", "ts", Seq("px"))
      .select($"ev", $"px").as[(String, Option[Double])].collect().toMap
    assert(got("e1").contains(10.0)) // same-instant right row is visible
    assert(got("e2").contains(20.0)) // latest preceding
    assert(got("e3").isEmpty)        // nothing at or before 50
  }

  test("bucketed tables join without any exchange") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    Bucketing.writeBucketed(a, "bkt_a", "k", 4, sortCol = Some("k"))
    Bucketing.writeBucketed(b, "bkt_b", "k", 4, sortCol = Some("k"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = Bucketing.readTable(spark, "bkt_a")
        .join(Bucketing.readTable(spark, "bkt_b"), "k")
      assert(j.count() == 1000)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"plan has a shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed range join == naive range join") {
    val rnd = new scala.util.Random(7)
    val l = (1 to 300).map(i => (rnd.nextInt(3).toLong, i.toLong, rnd.nextInt(10000).toLong))
      .toDF("k", "lid", "l_ms")
    val r = (1 to 300).map(i => (rnd.nextInt(3).toLong, rnd.nextInt(10000).toLong))
      .toDF("k", "r_ms")
    val w = 700L
    val naive = l.join(r, Seq("k"))
      .filter($"r_ms" >= $"l_ms" && $"r_ms" < $"l_ms" + w)
      .groupBy("lid").count().as[(Long, Long)].collect().sorted.toSeq
    val bucketed = operators.RangeJoin.bucketed(l, r, "k", "l_ms", "r_ms", w)
      .groupBy("lid").count().as[(Long, Long)].collect().sorted.toSeq
    assert(bucketed == naive)
  }

  test("partitioned layout prunes non-matching partitions at plan time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val df = (1 to 1000).map(i => (i.toLong, s"2024-01-0${i % 5 + 1}"))
      .toDF("id", "dt")
    sources.Partitioning.writePartitioned(df, dir, Seq("dt"))
    val q = sources.Partitioning.read(spark, dir).filter($"dt" === "2024-01-03")
    assert(q.count() == 200)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("dt#") && scan.contains("2024-01-03"),
      s"expected partition pruning in:\n$scan")
    // files actually read: only the matching partition directory
    val files = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!files.contains("2024-01-01") || files.contains("PartitionFilters"))
  }

  test("salted join equals plain join") {
    val left = (1 to 100).map(i => (i % 3L, i)).toDF("k", "lv")
    val right = Seq((0L, "x"), (1L, "y"), (2L, "z")).toDF("k", "rv")
    val plain = left.join(right, "k").select("k", "lv", "rv")
      .as[(Long, Int, String)].collect().sorted.toSeq
    val salted = Dedup.saltedJoin(left, right, "k", salt = 8)
      .select("k", "lv", "rv").as[(Long, Int, String)].collect().sorted.toSeq
    assert(salted == plain)
  }

  test("NativeDotRewrite replaces the HOF dot-product pattern in the optimized plan") {
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ plans.NativeDotRewrite
      // parquet source so constant folding can't collapse the projection
      val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      val df = e.select($"vec_id",
        operators.Similarity.dotHof($"embedding", $"embedding").as("d"))
      assert(df.queryExecution.optimizedPlan.toString.contains("float_vec_dot"),
        s"rewrite missing in:\n${df.queryExecution.optimizedPlan}")
      // rewritten result == native formulation, row for row
      val native = e.select($"vec_id",
        operators.Similarity.dot($"embedding", $"embedding").as("d"))
      assert(df.orderBy("vec_id").as[(Long, Double)].collect().toSeq ==
        native.orderBy("vec_id").as[(Long, Double)].collect().toSeq)
      // double arrays must NOT be rewritten
      val dbl = e.select(aggregate(
        zip_with($"embedding".cast("array<double>"), $"embedding".cast("array<double>"),
          (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("d"))
      assert(!dbl.queryExecution.optimizedPlan.toString.contains("float_vec_dot"))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("float_vec_dot available from SQL via extension registration") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT float_vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .as[Double].collect()(0)
    assert(got == 11.0)
  }
}
