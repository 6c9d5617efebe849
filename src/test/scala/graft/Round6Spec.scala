package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Round-6 additions: PQ exact re-rank. */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("pqRerank recall strictly improves over plain pqTopK (vs brute force)") {
    val q = emb.filter(col("id") < 8)
    val cb = emb.filter(col("id") < 8)
    val exact = Similarity.bruteForceTopK(q, emb, k = 3)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    def hits(df: org.apache.spark.sql.DataFrame): Int =
      df.select("query_id", "cand_id").as[(Long, Long)].collect()
        .count(exact.contains)
    val plain = hits(Similarity.pqTopK(q, emb, cb, k = 3, m = 4))
    val rerank = hits(Similarity.pqRerank(q, emb, cb, k = 3, c = 8, m = 4))
    // the re-rank pool recovers true neighbours that ADC quantization
    // pushed past rank 3 but not past rank 8
    assert(rerank > plain, s"rerank hits $rerank vs plain $plain")
    assert(rerank <= 24 && plain >= 0)
  }

  test("pqRerank top-k is contained in its own ADC top-c pool") {
    val q = emb.filter(col("id") < 8)
    val cb = emb.filter(col("id") < 8)
    val pool = Similarity.pqTopK(q, emb, cb, k = 8, m = 4)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val rr = Similarity.pqRerank(q, emb, cb, k = 3, c = 8, m = 4)
      .select("query_id", "cand_id").as[(Long, Long)].collect()
    assert(rr.nonEmpty && rr.forall(pool.contains))
  }

  test("ivfPqTopK with one cell == pqTopK over the recentered corpus") {
    // a single centroid c makes every residual vec - c, so IVF-PQ must
    // degenerate to plain PQ over the shifted corpus, rank for rank
    val q = emb.filter(col("id") < 6)
    val cent = emb.filter(col("id") === 0)
    val cb = emb.filter(col("id") < 8)
    val c0 = cent.collect()(0).getSeq[Float](1)
    val shift = udf((v: Seq[Float]) => v.zip(c0).map { case (a, b) => a - b })
    val shifted = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("id"), shift(col("vec")).as("vec"))
    val ivfpq = Similarity.ivfPqTopK(q, emb, cent, shifted(cb), k = 3, m = 4)
      .orderBy("query_id", "rnk").collect().toSeq
    val pq = Similarity.pqTopK(shifted(q), shifted(emb), shifted(cb), k = 3, m = 4)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(ivfpq.map(_.toSeq) == pq.map(_.toSeq) && ivfpq.nonEmpty)
  }

  test("ivfPqTopK candidates stay inside the query's probed cell") {
    val q = emb.filter(col("id") < 8)
    val cents = emb.filter(col("id") >= 8 && col("id") < 12)
    val cb = emb.filter(col("id") < 8)
    val got = Similarity.ivfPqTopK(q, emb, cents, cb, k = 5, m = 4)
      .select("query_id", "cand_id").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    // recompute cell assignments independently: argmax of the rounded
    // dot against each centroid, ties to the smallest centroid id
    val vecs = emb.as[(Long, Seq[Float])].collect().toMap
    val cs = vecs.filter { case (id, _) => id >= 8 && id < 12 }.toSeq.sortBy(_._1)
    def cell(id: Long): Long = cs.map { case (cid, cv) =>
      val d = BigDecimal(vecs(id).zip(cv)
        .map { case (a, b) => a.toDouble * b.toDouble }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      (-d, cid)
    }.min._2
    got.foreach { case (qid, cid) =>
      assert(qid != cid && cell(qid) == cell(cid), s"$qid/$cid cross cells")
    }
  }

  test("plan pins: pq/ivfpq searches scan materialized codes, not re-encode") {
    val q = emb.filter(col("id") < 8)
    // the search side of the join must read the checkpointed code RDD
    // (the barrier that stops codegen deferring the encode into the
    // join's inner loop); FloatVecDot on the corpus side above the join
    // would mean the m x ksub tree re-evaluates per pair (round-6 find)
    val pq = Similarity.pqTopK(q, emb, q, 3, 4)
    val pqPlan = pq.queryExecution.executedPlan.toString
    assert(pqPlan.contains("ExistingRDD"), pqPlan.take(1500))
    val ivfpq = Similarity.ivfPqTopK(q, emb,
      emb.filter(col("id") >= 8 && col("id") < 12), q, 3, 4)
    val ivfpqPlan = ivfpq.queryExecution.executedPlan.toString
    assert(ivfpqPlan.contains("ExistingRDD"), ivfpqPlan.take(1500))
  }

  test("plan pin: incremental dedup never self-joins the existing corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val old = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val nw = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val df = graft.operators.Dedup.minhashIncrementalPairs(
      old, nw, "doc_id", "text", jaccardThreshold = 0.4)
    // the banding joins new x old: every join in the plan is between
    // frames filtered on OPPOSITE sides of the split, so the filters
    // must both appear, and no join condition pairs two same-side scans
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD") || plan.contains("Scan parquet"))
    // cheap but real structural check: cross pairs only, verified rows
    val rows = df.select("new_id", "old_id").as[(Long, Long)].collect()
    assert(rows.forall { case (n, o) => n % 5 == 0 && o % 5 != 0 })
  }

  test("ingestReport reasons cascade: exact beats near beats quality") {
    val base = Seq.fill(12)(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa").mkString(" ")
    val hist = Seq((1L, base),
      (2L, Seq.fill(20)("one two three four five six").mkString(" ")))
      .toDF("doc_id", "text")
    val inc = Seq(
      (10L, base), // identical to history -> exact_dup (also near-dup!)
      // repeats base's opening tokens: every seam shingle already exists
      // in the cyclic base, so the shingle SET (hence the signature) is
      // IDENTICAL -> guaranteed banded candidate, but the text differs
      (11L, base + " alpha beta gamma"),
      (12L, "tiny doc"), // clean but low quality
      (13L, ("unique" + " words distinct") + (1 to 120)
        .map(i => s" tok$i").mkString) // long, diverse -> accepted
    ).toDF("doc_id", "text")
    val out = graft.Pipelines.ingestReport(hist, inc, "doc_id", "text")
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(out(10L) == "exact_dup") // priority over its near-dup status
    assert(out(11L) == "near_dup")
    assert(out(12L) == "low_quality")
    assert(out(13L) == "accepted")
  }

  test("backwardWithin nulls matches older than the tolerance") {
    import graft.operators.AsOfJoin
    val l = Seq((1L, 1000L, "a"), (1L, 5000L, "b"), (2L, 900L, "c"))
      .toDF("k", "ms", "lv")
      .withColumn("t", timestamp_millis(col("ms"))).drop("ms")
    val r = Seq((1L, 800L, 8.0), (2L, 100L, 1.0))
      .toDF("k", "ms", "rv")
      .withColumn("t", timestamp_millis(col("ms"))).drop("ms")
    val out = AsOfJoin.backwardWithin(l, r, "k", "t", Seq("rv"), maxLagMs = 1000L)
      .select("lv", "rv").as[(String, Option[Double])].collect().toMap
    assert(out("a").contains(8.0)) // 200ms old: fresh
    assert(out("b").isEmpty) // 4200ms old: matched but stale -> null
    assert(out("c").contains(1.0)) // 800ms old: fresh
    // and with no tolerance bound the stale match comes back
    val loose = AsOfJoin.backwardWithin(l, r, "k", "t", Seq("rv"), maxLagMs = 10000L)
      .select("lv", "rv").as[(String, Option[Double])].collect().toMap
    assert(loose("b").contains(8.0))
  }

  test("holdoutSplit is a stable 90/5/5-shaped partition of any key set") {
    import graft.operators.TextAnalysis
    val ids = spark.range(0, 5000)
      .select(col("id").cast("string").as("k"))
    val counts = ids
      .select(TextAnalysis.holdoutSplit(col("k"), 5, 5).as("split"))
      .groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 5000L)
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    // deterministic: same assignment on a re-run
    val again = ids
      .select(TextAnalysis.holdoutSplit(col("k"), 5, 5).as("split"))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(again == counts)
  }

  test("tpch q5: dims broadcast under the fact join, no cartesian product") {
    val df = Queries.sql_tpch_q5(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // region/nation/supplier/customer are all broadcast-sized; the only
    // shuffle-worthy join is fact-to-fact (orders x lineitem)
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    val broadcasts = "BroadcastExchange".r.findAllIn(plan).length
    assert(broadcasts >= 3, s"expected >=3 broadcast dims, got $broadcasts")
  }

  test("pqRerank with c = |corpus| equals brute force exactly") {
    val q = emb.filter(col("id") < 4)
    val cb = emb.filter(col("id") < 8)
    val n = emb.count().toInt
    val bf = Similarity.bruteForceTopK(q, emb, k = 3)
      .orderBy("query_id", "rnk").collect().toSeq
    val rr = Similarity.pqRerank(q, emb, cb, k = 3, c = n, m = 4)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(rr == bf)
  }
}
