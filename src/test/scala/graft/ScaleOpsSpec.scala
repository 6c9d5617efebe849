package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Dedup, Similarity}
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

  test("as-of join returns the matched row's values TOGETHER, including its nulls") {
    val left = Seq((1L, 300L, "e1")).toDF("k", "ms", "ev")
      .withColumn("ts", timestamp_millis($"ms")).drop("ms")
    // latest preceding right row has px=NULL, qty=7 — a true as-of join
    // must NOT back-fill px from the older row
    val right = Seq((1L, 100L, Some(10.0), 1L), (1L, 200L, None, 7L))
      .toDF("k", "ms", "px", "qty")
      .withColumn("ts", timestamp_millis($"ms")).drop("ms")
    val got = AsOfJoin.backward(left, right, "k", "ts", Seq("px", "qty"))
      .select($"ev", $"px", $"qty").as[(String, Option[Double], Long)].collect()(0)
    assert(got == (("e1", None, 7L)))
  }

  test("resolveFk matches NULL natural keys to their dim row (no spurious -1)") {
    val fact = Seq((Some("a"), 1), (None, 2), (Some("zz"), 3)).toDF("attr", "m")
    val dim = Seq((1, Some("a")), (2, None)).toDF("sk", "attr")
    val got = star.FactBuilder.resolveFk(fact, dim, "sk", Seq("attr"), "fk")
      .select($"m", $"fk").as[(Int, Int)].collect().toMap
    assert(got == Map(1 -> 1, 2 -> 2, 3 -> -1))
  }

  test("JDBC round-trip via in-memory Derby: write, read, partitioned read, pushdown") {
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val rows = (1 to 500).map(i => (i.toLong, s"name$i", i * 1.5))
    val df = rows.toDF("id", "name", "amount")
    sources.Jdbc.write(df, url, "t_roundtrip")
    val back = sources.Jdbc.read(spark, url, "t_roundtrip")
      .as[(Long, String, Double)].collect().sorted.toSeq
    assert(back == rows.sorted.toSeq)
    // partitioned read: same rows, several range-bounded queries
    val part = sources.Jdbc.readPartitioned(spark, url, "t_roundtrip",
      "id", 1L, 500L, numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.as[(Long, String, Double)].collect().sorted.toSeq == back)
    // filter + projection reach the generated SQL, not the Spark side
    val pushed = part.filter($"id" <= 10).select($"id")
    val scan = pushed.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters:") && scan.contains("LessThanOrEqual"),
      s"filter not pushed:\n$scan")
    assert(pushed.as[Long].collect().sorted.toSeq == (1L to 10L))
    // append lands next to the original
    sources.Jdbc.write(df.filter($"id" <= 3), url, "t_roundtrip",
      mode = org.apache.spark.sql.SaveMode.Append)
    assert(sources.Jdbc.read(spark, url, "t_roundtrip").count() == 503)
  }

  test("JSONL and ORC round-trips preserve documents; ORC pushes filters down") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    // JSONL: write, read back with the EXPLICIT schema (no inference pass)
    sources.Formats.writeJsonl(docs, s"$dir/docs_jsonl")
    val viaJson = sources.Formats
      .readJsonlStrict(spark, s"$dir/docs_jsonl", docs.schema)
      .select(docs.columns.map(col): _*)
    assert(viaJson.schema == docs.schema)
    val key = (d: org.apache.spark.sql.DataFrame) =>
      d.select($"doc_id", $"text", $"lang", $"source", $"n_chars")
        .as[(Long, String, String, String, Long)].collect().sorted.toSeq
    assert(key(viaJson) == key(docs))
    // ORC: columnar twin with parquet-grade pushdown
    sources.Formats.writeOrc(docs, s"$dir/docs_orc")
    val viaOrc = sources.Formats.readOrc(spark, s"$dir/docs_orc")
    assert(key(viaOrc) == key(docs))
    val pushed = viaOrc.filter($"doc_id" < 10).select($"doc_id")
    val plan = pushed.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]"),
      s"ORC scan did not push the filter:\n$plan")
  }

  test("JSONL corrupt-line contract: permissive nulls the row, strict fails fast") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in.json"),
      """{"id": 1, "t": "ok"}
        |{"id": 2 "t": "missing comma"}
        |{"id": 3, "t": "also ok"}
        |""".stripMargin)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", org.apache.spark.sql.types.LongType)
      .add("t", org.apache.spark.sql.types.StringType)
    val permissive = sources.Formats.readJsonl(spark, s"$dir/in.json", schema)
      .as[(Option[Long], Option[String])].collect().toSet
    assert(permissive == Set(
      (Some(1L), Some("ok")), (None, None), (Some(3L), Some("also ok"))))
    val ex = intercept[Exception] {
      sources.Formats.readJsonlStrict(spark, s"$dir/in.json", schema).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(m =>
      m.contains("FAILFAST") || m.contains("Malformed")), ex.toString)
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

  test("NativeDotRewrite is active on a Graft.tune'd session, no manual registration") {
    // SparkSpec's shared session went through Graft.tune ONLY — no
    // spark.sql.extensions config, no extraOptimizations append here.
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
  }

  test("bruteForceTopK broadcasts the QUERY side and ranks without a window") {
    val vecs = (1 to 200).map(i => (i.toLong, Array(i.toFloat, (i % 7 + 1).toFloat)))
      .toDF("id", "vec")
    val res = Similarity.bruteForceTopK(vecs.filter($"id" <= 2), vecs, k = 3)
    assert(res.count() == 6)
    val plan = res.queryExecution.executedPlan.toString
    // corpus is the streamed side: the only broadcast is the query set
    assert(plan.contains("BroadcastNestedLoopJoin BuildLeft"),
      s"query side must be the build side:\n$plan")
    // ranking is a bounded aggregate (partial per map task), not a
    // per-query window that funnels a query's candidates into one task
    assert(plan.contains("bounded_top_k"), s"expected bounded_top_k in:\n$plan")
    assert(!plan.contains("Window"), s"no window expected in:\n$plan")
  }

  test("ivfTopK cell assignment is a narrow projection (no window, no N*K shuffle)") {
    val vecs = (1 to 100).map(i => (i.toLong, Array(math.cos(i).toFloat, math.sin(i).toFloat)))
      .toDF("id", "vec")
    val res = Similarity.ivfTopK(vecs.filter($"id" <= 4), vecs,
      vecs.filter($"id" <= 4), k = 2)
    assert(res.count() > 0)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"assignment must not use a window:\n$plan")
    assert(plan.contains("bounded_top_k"))
  }

  test("BoundedTopK equals the window top-k formulation") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    val sims = (1 to 500).map { i =>
      (i % 5L, i.toLong, math.floor(rnd.nextDouble() * 1e6) / 1e6)
    }.toDF("query_id", "cand_id", "sim").repartition(7)
    val agged = sims.groupBy("query_id")
      .agg(expressions.BoundedTopK.topK($"sim", $"cand_id", 4).as("tk"))
      .select($"query_id", posexplode($"tk"))
      .select($"query_id", ($"pos" + 1).cast("int").as("rnk"),
        $"col.id".as("cand_id"), $"col.sim".as("sim"))
      .orderBy("query_id", "rnk")
      .as[(Long, Int, Long, Double)].collect().toSeq
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"cand_id")
    val windowed = sims.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 4)
      .select($"query_id", $"rnk".cast("int"), $"cand_id", $"sim")
      .orderBy("query_id", "rnk")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(agged == windowed)
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
