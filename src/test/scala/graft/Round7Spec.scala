package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Dedup, Similarity}

/** Round-7 regression pins for the ADVICE-r6 fixes: decimal second-moment
  * accumulation in standardizeDims, widening (never narrowing) as-of key
  * coercion, and the at-rest incremental dedup path.
  */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  // --- standardizeDims overflow (ADVICE r6 medium) ---------------------

  test("standardizeDims survives wide components (|v| > 2900) without overflow") {
    // pre-fix, xs = round(v * 2^20) ~ 3.2e9 and xs*xs ~ 1e19 overflowed
    // the per-element long multiply -> garbage sigma with no error
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      (i.toLong, Array(rnd.nextDouble() * 10000 - 5000, rnd.nextDouble()))
    }
    val df = rows.toDF("id", "vec")
    val z = Similarity.standardizeDims(df)
      .select(explode(col("z")).as("zv"))
      .agg(min("zv"), max("zv"), avg("zv"))
      .collect()(0)
    // standardized values of a uniform sample must land within a few
    // sigma of 0; an overflowed sxx yields NaN sigma or wild magnitudes
    assert(!z.getDouble(0).isNaN && !z.getDouble(1).isNaN)
    assert(math.abs(z.getDouble(0)) < 10 && math.abs(z.getDouble(1)) < 10)
    assert(math.abs(z.getDouble(2)) < 0.5)
  }

  test("standardizeDims second moment is exact on a distribution long-sum would wrap") {
    // one dimension, constant value v=3000: sigma must be exactly 0 and
    // every z 0.0. Pre-fix the per-element square (3000*2^20)^2 ~ 9.9e18
    // wrapped Long.MaxValue and sigma came out as a huge garbage number.
    val df = (0 until 100).map(i => (i.toLong, Array(3000.0))).toDF("id", "vec")
    val z = Similarity.standardizeDims(df)
      .select(explode(col("z")).as("zv")).distinct().as[Double].collect()
    assert(z.toSeq == Seq(0.0))
  }

  // --- as-of key widening (ADVICE r6 low) ------------------------------

  test("nativeBackward widens int-vs-bigint keys instead of truncating") {
    // right key 2^32 + 1 must NOT match left int key 1 (pre-fix the cast
    // to the left's int type truncated it to exactly 1)
    val l = Seq((1, 100L, "x")).toDF("k", "t", "lv")
    val r = Seq((4294967297L, 50L, 9.9), (1L, 60L, 1.1)).toDF("k", "t", "rv")
    val out = AsOfJoin.nativeBackward(l, r, "k", "t", Seq("rv"))
      .as[(Int, Long, String, Option[Double])].collect().toSeq
    assert(out == Seq((1, 100L, "x", Some(1.1))))
  }

  test("nativeBackward rejects non-widenable key types instead of guessing") {
    val l = Seq((1, 100L, "x")).toDF("k", "t", "lv")
    val r = Seq(("1", 50L, 9.9)).toDF("k", "t", "rv")
    intercept[IllegalArgumentException] {
      AsOfJoin.nativeBackward(l, r, "k", "t", Seq("rv"))
    }
  }

  // --- at-rest incremental dedup (ADVICE r6 low) -----------------------

  test("minhashIncrementalPairsFromRest == minhashIncrementalPairs on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val old = docs.filter(col("doc_id") % 2 === 0)
    val nw = docs.filter(col("doc_id") % 2 === 1).limit(300)
    val direct = Dedup.minhashIncrementalPairs(old, nw, "doc_id", "text")
      .select("new_id", "old_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val rest = Dedup.minhashAtRest(old, "doc_id", "text")
    assert(rest.columns.toSeq == Seq("id", "sh", "sig"))
    val viaRest = Dedup.minhashIncrementalPairsFromRest(rest, nw, "doc_id", "text")
      .select("new_id", "old_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(viaRest == direct)
    assert(direct.nonEmpty || nw.count() == 0) // fixture sanity: corpus has clones
  }

  test("nightly ingest from AT-REST history signatures == full recompute ingest") {
    // the production loop: history persists (id, sh, sig) once at accept
    // time; each nightly batch gates against those columns. The report
    // must be byte-identical to re-shingling history from text.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val h = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5)
    val b = docs.filter(col("doc_id") % 10 === 5)
    val full = graft.Pipelines.ingestReport(h, b, "doc_id", "text")
      .as[(Long, Double, String)].collect().toSet
    val rest = graft.operators.Dedup.minhashAtRest(h, "doc_id", "text")
    val viaRest = graft.Pipelines
      .ingestReportFromRest(h, rest, b, "doc_id", "text")
      .as[(Long, Double, String)].collect().toSet
    assert(viaRest == full)
    assert(full.exists(_._3 != "accepted")) // fixture sanity: gate fires
  }

  test("day-2 ingest reacts to day-1 acceptance (state actually carries)") {
    val out = graft.Queries.llm_ingest_incr(spark, "/root/testdata/sf0.001")
      .as[(Long, Double, String, Int)].collect()
    val byDay = out.groupBy(_._4)
    assert(byDay(1).nonEmpty && byDay(2).nonEmpty)
    // every day-1 doc is %10==0, every day-2 doc %10==5
    assert(byDay(1).forall(_._1 % 10 == 0) && byDay(2).forall(_._1 % 10 == 5))
    // statuses span the cascade somewhere in the fixture
    assert(out.map(_._3).toSet.contains("accepted"))
  }

  // --- greedy subword tokenization -------------------------------------

  test("e4_subword fold walk matches the sequential greedy oracle") {
    // anchors computed by the DuckDB recursive-CTE oracle (the literal
    // sequential greedy walk) on sf0.001 — if vocabulary selection,
    // longest-match semantics, or the fold walk drift, these move
    val out = graft.Queries.e4_subword(spark, "/root/testdata/sf0.001")
      .as[(Long, Long)].collect()
    assert(out.length == 500)
    val m = out.toMap
    assert(m(0L) == 43L && m(1L) == 169L)
    assert(out.map(_._2).sum == 54039L)
  }

  test("leakageSafeSplit: no near-dup pair straddles the split boundary") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val split = graft.Pipelines
      .leakageSafeSplit(docs, "doc_id", "text", jaccardThreshold = 0.4)
      .select("doc_id", "split")
    val pairs = graft.operators.Dedup
      .minhashLsh(docs, "doc_id", "text", jaccardThreshold = 0.4)
      .select("id1", "id2")
    val straddling = pairs
      .join(split.withColumnRenamed("doc_id", "id1")
        .withColumnRenamed("split", "s1"), "id1")
      .join(split.withColumnRenamed("doc_id", "id2")
        .withColumnRenamed("split", "s2"), "id2")
      .filter(col("s1") =!= col("s2"))
      .count()
    assert(straddling == 0L)
    // every doc is assigned exactly once, and both holdout buckets are
    // non-degenerate on the fixture corpus
    val bySplit = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(bySplit.values.sum == docs.count())
    assert(bySplit.keySet == Set("train", "val", "test"))
    // the per-doc split (e4_split's gate) would NOT satisfy the
    // invariant here — pin that the upgrade is doing real work
    val perDoc = docs.select(col("doc_id"),
      graft.operators.TextAnalysis
        .holdoutSplit(col("doc_id").cast("string"), 5, 5).as("split"))
    val perDocStraddling = pairs
      .join(perDoc.withColumnRenamed("doc_id", "id1")
        .withColumnRenamed("split", "s1"), "id1")
      .join(perDoc.withColumnRenamed("doc_id", "id2")
        .withColumnRenamed("split", "s2"), "id2")
      .filter(col("s1") =!= col("s2"))
      .count()
    assert(perDocStraddling > 0L)
  }

  test("subwordCounts degrades to zero counts on an empty-text corpus") {
    val df = Seq((1L, ""), (2L, "")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .subwordCounts(df, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 0L), (2L, 0L)))
  }
}
