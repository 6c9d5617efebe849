package graft

import org.apache.spark.sql.functions._

/** Round-5 batch 3: event analytics (funnel, cohort) and ETL governance
  * (snapshot diff, profiling, expectations) — properties the oracle's
  * value-hash can't express: internal consistency, reconciliation
  * invariants, and idempotence.
  */
class Round5cSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // --------------------------------------------------------------- funnel

  test("e11_funnel: stage timestamps are strictly ordered and stage = depth") {
    val rows = Queries.e11_funnel(spark, sf)
      .select($"stage", $"t_view_ms", $"t_click_ms", $"t_purchase_ms")
      .as[(Int, Option[Long], Option[Long], Option[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (stage, t1, t2, t3) =>
      // a stage can only be reached through the previous one
      assert(!(t2.isDefined && t1.isEmpty) && !(t3.isDefined && t2.isEmpty))
      assert(stage == Seq(t1, t2, t3).count(_.isDefined))
      for (a <- t1; b <- t2) assert(a < b)
      for (b <- t2; c <- t3) assert(b < c)
    }
    // the funnel is monotone: |stage>=1| >= |stage>=2| >= |stage>=3|
    val byStage = (1 to 3).map(k => rows.count(_._1 >= k))
    assert(byStage == byStage.sorted.reverse)
  }

  test("e11_funnel: a click BEFORE the first view does not advance the funnel") {
    // ts as nanosecond epochs — the driver fixture's TIMESTAMP(NANOS)
    // arrives in Spark as int64, which Queries.events expects
    def ns(h: Int): Long = h * 3600L * 1000000000L
    val ev = Seq(
      (1L, "click", ns(0)), // pre-view: ignored
      (1L, "view", ns(1)),
      (1L, "purchase", ns(2)) // no click yet
    ).toDF("user_id", "event_type", "ts")
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    // reuse the graded query by round-tripping through its events contract
    ev.select($"user_id", $"event_type", $"ts", lit(0L).as("event_id"),
        lit(0.0).as("value"), lit("").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Queries.e11_funnel(spark, dir)
      .select($"stage", $"t_click_ms").as[(Int, Option[Long])].collect()
    assert(out.toSeq == Seq((1, None))) // view only: the early click never counts
  }

  // --------------------------------------------------------------- cohort

  test("e11_cohort: offset-0 cells account for every user exactly once") {
    val out = Queries.e11_cohort(spark, sf)
      .as[(java.sql.Date, Int, Long)].collect()
    assert(out.forall(_._2 >= 0))
    val week0 = out.filter(_._2 == 0).map(_._3).sum
    val users = Queries.events(spark, sf).select("user_id").distinct().count()
    assert(week0 == users) // everyone is active in their own cohort week
    // retention can never exceed the cohort's size
    val size = out.filter(_._2 == 0).map(r => r._1 -> r._3).toMap
    out.foreach { case (cw, _, n) => assert(n <= size(cw)) }
  }

  // --------------------------------------------- snapshot diff / profile

  test("etl_snapshot_diff: classified changes reconcile |A| to |B|") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val nA = o.filter($"o_orderkey" % 97 =!= 0).count()
    val nB = o.filter($"o_orderkey" % 89 =!= 3).count()
    val d = Queries.etl_snapshot_diff(spark, sf)
      .groupBy("change_type").count().as[(String, Long)].collect().toMap
    assert(nA + d.getOrElse("insert", 0L) - d.getOrElse("delete", 0L) == nB)
    assert(d.getOrElse("update", 0L) > 0) // the fixture really exercises updates
  }

  test("etl_profile: metrics agree with directly-computed column stats") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val out = Queries.etl_profile(spark, sf)
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderpriority"))
    val (_, nulls, dist, mn, mx) = out("o_orderkey")
    assert(nulls == 0)
    assert(dist == o.select("o_orderkey").distinct().count())
    assert(mn.toLong == o.agg(min("o_orderkey")).as[Long].head())
    assert(mx.toLong == o.agg(max("o_orderkey")).as[Long].head())
    // decimal rendering carries exactly two fractional digits
    assert(out("o_totalprice")._4.matches("""-?\d+\.\d\d"""))
  }

  test("etl_expectations: clean fixture passes integrity; seeded dirt is counted") {
    val clean = Queries.etl_expectations(spark, sf)
      .as[(String, Long)].collect().toMap
    assert(clean.keySet.size == 6)
    // the synthetic star schema is referentially intact by construction
    assert(clean("orders_pk_unique") == 0)
    assert(clean("orders_fk_customer") == 0)
    assert(clean("lineitem_fk_orders") == 0)

    // corrupt a copy: duplicate a key, orphan an order, zero a price
    val dir = java.nio.file.Files.createTempDirectory("expect").toString
    val o = spark.read.parquet(s"$sf/orders.parquet")
    o.unionAll(o.limit(1)) // duplicate first key
      .unionAll(o.limit(1).withColumn("o_custkey", lit(-999L))
        .withColumn("o_orderkey", lit(-1L))
        .withColumn("o_totalprice", lit(0.0)))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    spark.read.parquet(s"$sf/customer.parquet")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val dirty = Queries.etl_expectations(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(dirty("orders_pk_unique") == 1)     // the duplicated key
    assert(dirty("orders_fk_customer") == 1)   // the orphan
    assert(dirty("orders_price_positive") == 1) // the zeroed price
  }

  // ------------------------------------------------------ pagerank / salt

  test("pageRank: integer ranks conserve mass, reward degree, fix isolates") {
    import graft.operators.Components
    // path 1-2-3 plus isolated 9: the middle node out-ranks the ends
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 9L).toDF("id")
    val pr = Components.pageRank(edges, "a", "b", nodes, "id", iters = 8)
      .as[(Long, Long)].collect().toMap
    val init = 1000000000L / 4
    val base = 15L * init / 100L
    assert(pr(9L) == base) // isolated: no inflow, pure damping base
    assert(pr(2L) > pr(1L) && pr(2L) > pr(3L)) // degree-2 centre wins
    assert(pr(1L) == pr(3L)) // symmetry is exact in integer arithmetic
    // no node exceeds total mass; every rank at least the base
    assert(pr.values.forall(v => v >= base && v <= 1000000000L))
    // determinism: a second run is bit-identical
    val again = Components.pageRank(edges, "a", "b", nodes, "id", iters = 8)
      .as[(Long, Long)].collect().toMap
    assert(again == pr)
  }

  test("e5_arrays: lambda metrics agree with direct string computation") {
    val out = Queries.e5_arrays(spark, sf)
      .as[(Long, Int, Int, Long, Int, String, Int)].collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(out.nonEmpty)
    out.foreach { case (id, nTok, nLong, total, maxLen, first, nDist) =>
      val tk = docs(id).split(" ", -1)
      assert(nTok == tk.length)
      assert(nLong == tk.count(_.length > 4))
      assert(total == tk.map(_.length.toLong).sum)
      assert(maxLen == tk.map(_.length).max)
      assert(first == tk.min)
      assert(nDist == tk.distinct.length)
    }
  }

  test("j_salted: the salted rollup equals the plain-join rollup exactly") {
    val salted = Queries.j_salted(spark, sf)
      .as[(String, Long, Double)].collect().toSeq
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val plain = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy("o_orderpriority")
      .as[(String, Long, Double)].collect().toSeq
    assert(salted == plain)
  }

  // ------------------------------------------------- q1 / multiset / nav

  test("sql_tpch_q1: internal consistency of the pricing summary") {
    val rows = Queries.sql_tpch_q1(spark, sf)
      .as[(String, String, Double, Double, Double, Double, Double, Double, Long)]
      .collect()
    assert(rows.nonEmpty && rows.length <= 6) // |returnflag| x |linestatus|
    rows.foreach { case (_, _, sumQty, sumBase, sumDisc, sumCharge, avgQty, avgPrice, n) =>
      assert(sumDisc <= sumBase) // discounts only reduce
      assert(sumCharge >= sumDisc) // tax only adds
      assert(math.abs(avgQty - sumQty / n) < 1e-9)
      assert(math.abs(avgPrice - sumBase / n) < 1e-9)
    }
  }

  test("e9_multiset: bag semantics follow the multiplicity laws") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val cntA = li.filter($"l_quantity" < 25).groupBy($"l_partkey".as("pk"))
      .count().as[(Long, Long)].collect().toMap
    val cntB = li.filter($"l_quantity" > 10).groupBy($"l_partkey".as("pk"))
      .count().as[(Long, Long)].collect().toMap
    val out = Queries.e9_multiset(spark, sf)
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (s, rs) => s -> rs.map(r => r._2 -> r._3).toMap }
    // EXCEPT ALL: max(0, a-b) copies; INTERSECT ALL: min(a, b) copies
    cntA.foreach { case (pk, a) =>
      val b = cntB.getOrElse(pk, 0L)
      assert(out("except_all").getOrElse(pk, 0L) == math.max(0L, a - b))
      assert(out("intersect_all").getOrElse(pk, 0L) == math.min(a, b))
    }
  }

  test("e7_navigation: first/second/last match the sorted group directly") {
    val out = Queries.e7_navigation(spark, sf)
      .as[(Long, Long, Double, Double, Option[Double])].collect()
    val byCust = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_custkey", $"o_orderkey", $"o_orderdate".cast("string"), $"o_totalprice")
      .as[(Long, Long, String, Double)].collect()
      .groupBy(_._1).map { case (c, rs) =>
        c -> rs.sortBy(r => (r._3, r._2)).map(_._4).toSeq }
    out.foreach { case (cust, _, fp, lp, sp) =>
      val prices = byCust(cust)
      assert(fp == prices.head && lp == prices.last)
      assert(sp == prices.drop(1).headOption)
    }
  }

  // --------------------------------------------------------- AQE skew

  test("AQE splits a skewed sort-merge join at runtime (the 100 TB guard)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // shrink the thresholds so local fixture sizes trip the optimizer
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // one pathological key carrying 50k rows vs a uniform right side
      val left = spark.range(50000).select(
        when($"id" % 100 =!= 0, lit(0L)).otherwise($"id").as("k"),
        $"id".as("payload"))
      val right = spark.range(1000).select($"id".as("k"), ($"id" * 2).as("v"))
      // no keyed aggregate downstream: splitting a skewed partition must
      // not violate any required distribution, or AQE (correctly) declines
      val joined = left.join(right, "k").select($"payload" + $"v")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  // ------------------------------------------- recall / dedup observability

  test("e3_recall_eval: recall is |exact∩approx|/k and stays in [0,1]") {
    import graft.operators.Similarity
    val out = Queries.e3_recall_eval(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(out.length == 8) // one row per query vector, zero-recall included
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val q = e.filter($"id" < 8)
    val exact = Similarity.bruteForceTopK(q, e, k = 3)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(q, e, k = 3, bits = 8)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect().toSet
    out.foreach { case (qid, nHits, recall) =>
      assert(nHits == (exact & approx).count(_._1 == qid))
      assert(recall == math.round(nHits / 3.0 * 1e6) / 1e6)
      assert(recall >= 0.0 && recall <= 1.0)
    }
  }

  test("e4_dedup_summary: per-source counts reconcile with direct computation") {
    val out = Queries.e4_dedup_summary(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(out.map(_._2).sum == docs.count())
    // exact dups: every non-first copy of an identical text, globally
    val dupTotal = docs.groupBy("text").count()
      .agg(sum($"count" - 1)).as[Long].head()
    assert(out.map(_._3).sum == dupTotal)
    out.foreach { case (_, nDocs, nExact, nNear) =>
      assert(nExact <= nDocs && nNear <= nDocs)
    }
  }

  test("e10_hll_intersect: sketch overlap estimate lands within the flag") {
    val (exactBoth, flag) = Queries.e10_hll_intersect(spark, sf)
      .as[(Long, Int)].head()
    val ev = Queries.events(spark, sf)
    val viewers = ev.filter($"event_type" === "view")
      .select("user_id").distinct().as[Long].collect().toSet
    val buyers = ev.filter($"event_type" === "purchase")
      .select("user_id").distinct().as[Long].collect().toSet
    assert(exactBoth == (viewers & buyers).size)
    assert(flag == 1)
  }

  test("e2_edit_pairs: every LSH candidate within the bound appears exactly once") {
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Queries.e2_edit_pairs(spark, sf)
      .as[(Long, Long, Int)].collect()
    assert(out.forall { case (a, b, d) => a < b && d >= 0 && d <= 40 })
    assert(out.map(p => (p._1, p._2)).distinct.length == out.length)
    // the verify stage only FILTERS the LSH candidate set
    val cand = Dedup.minhashLsh(docs, "doc_id", "text", jaccardThreshold = 0.2)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(out.forall(p => cand.contains((p._1, p._2))))
  }

  test("e11_gaps: islands are maximal, disjoint, and cover all active days") {
    val out = Queries.e11_gaps(spark, sf)
      .as[(Long, java.sql.Date, java.sql.Date, Long)].collect()
    val dayMs = 86400000L
    out.groupBy(_._1).foreach { case (_, islands) =>
      val sorted = islands.sortBy(_._2.getTime)
      sorted.foreach { case (_, s0, e0, n) =>
        assert((e0.getTime - s0.getTime) / dayMs + 1 == n) // dense run
      }
      sorted.sliding(2).foreach {
        case Array((_, _, e0, _), (_, s1, _, _)) =>
          assert(s1.getTime - e0.getTime > dayMs) // maximality: a real gap
        case _ =>
      }
    }
    val totalDays = Queries.events(spark, sf)
      .select($"user_id", to_date($"ts")).distinct().count()
    assert(out.map(_._4).sum == totalDays) // islands partition the activity
  }

  test("e6_ratio: shares are positive and sum to 1 within each status") {
    val out = Queries.e6_ratio(spark, sf)
      .as[(Long, String, Double)].collect()
    assert(out.forall(_._3 > 0))
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-5)
    }
  }

  test("e4_ngram_novelty: first doc is all-novel, an exact dup is zero-novel") {
    val out = Queries.e4_ngram_novelty(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(out.forall(r => r._3 >= 0.0 && r._3 <= 1.0))
    assert(out.minBy(_._1)._3 == 1.0) // nothing precedes the first doc
    // every non-first copy of an identical text repeats all its shingles
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dupLater = docs.groupBy("text")
      .agg(min($"doc_id").as("first"), max($"doc_id").as("last"), count(lit(1)).as("n"))
      .filter($"n" > 1).select($"last").as[Long].collect().toSet
    if (dupLater.nonEmpty) {
      val byId = out.map(r => r._1 -> r._3).toMap
      dupLater.foreach(id => assert(byId(id) == 0.0, s"dup doc $id"))
    }
  }

  test("j_interval_overlap: per-day clamp bounds and flag consistency") {
    val out = Queries.j_interval_overlap(spark, sf)
      .as[(Long, Long, Long)].collect()
    val nDays = Queries.events(spark, sf)
      .select($"user_id", to_date($"ts")).distinct()
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    out.foreach { case (u, ms, days) =>
      assert(ms >= 0 && days >= 0)
      assert((ms == 0) == (days == 0)) // the flag and the sum agree
      assert(days <= nDays(u))
      assert(ms <= days * 7200000L) // no day contributes more than 2 h
    }
  }

  test("e6_grouping_id: the bitmask identifies each aggregation level") {
    val out = Queries.e6_grouping_id(spark, sf)
      .as[(Option[String], Option[String], Long, Long)].collect()
    val total = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(out.map(_._3).toSet == Set(0L, 1L, 2L, 3L))
    // bit set <=> that dimension is aggregated away at this row
    out.foreach { case (rf, ls, gid, _) =>
      assert(((gid & 2L) != 0) == rf.isEmpty)
      assert(((gid & 1L) != 0) == ls.isEmpty)
    }
    assert(out.filter(_._3 == 3L).map(_._4).sum == total) // grand total
    assert(out.filter(_._3 == 0L).map(_._4).sum == total) // cells partition
  }

  test("e4_regex_tokens: pre-token count matches the word count on a word corpus") {
    // this corpus is purely lowercase words + single spaces, so the
    // letter-run pre-tokenizer must agree with whitespace splitting
    val out = Queries.e4_regex_tokens(spark, sf).as[(Long, Int)].collect().toMap
    spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .foreach { case (id, text) =>
        assert(out(id) == text.split(" ", -1).count(_.nonEmpty))
      }
    // and on mixed content the runs split as designed
    val mixed = Seq((1L, "abc12 x!y", "en", "t", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("retok").toString
    mixed.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // abc | 12 | ' x' | ! | y  ->  5 pre-tokens
    assert(Queries.e4_regex_tokens(spark, dir).as[(Long, Int)].head()._2 == 5)
  }

  test("e5_try_parse: corrupted rows degrade to null + flag, never an error") {
    val out = Queries.e5_try_parse(spark, sf)
      .as[(Long, Option[Int], Int)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, k, ok) =>
      if (id % 7 == 0) assert(k.isEmpty && ok == 0) // truncated payload
      else assert(k.isDefined && ok == 1)
    }
  }

  test("j_band: tiers partition all orders; the tier side broadcasts (BNLJ)") {
    val df = Queries.j_band(spark, sf)
    val out = df.as[(String, Long, Double)].collect()
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(out.map(_._2).sum == total) // bands cover, no overlap
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"non-equi band join should be a broadcast nested loop:\n$plan")
  }

  test("e10_approx_quantiles: certificates hold and exact percentiles are monotone") {
    val r = Queries.e10_approx_quantiles(spark, sf)
      .as[(Double, Double, Double, Int, Int, Int)].head()
    assert(r._1 <= r._2 && r._2 <= r._3)
    assert(r._4 == 1 && r._5 == 1 && r._6 == 1)
  }

  test("schema evolution: mergeSchema unions parquet batches written over time") {
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 9.5), (4L, "d", 7.5)).toDF("id", "v", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "score", "v"))
    val rows = merged.select($"id", $"score").as[(Long, Option[Double])]
      .collect().toMap
    assert(rows(1L).isEmpty && rows(3L).contains(9.5)) // old rows null-fill
    assert(merged.count() == 4)
  }

  test("e8_diversified: per-source cap holds and exclusions are justified") {
    import graft.operators.TextAnalysis
    val sel = Queries.e8_diversified(spark, sf)
      .as[(Long, String, Double)].collect()
    assert(sel.length == 50)
    val bySource = sel.groupBy(_._2)
    assert(bySource.values.forall(_.length <= 3)) // diversity constraint
    // every non-selected doc is either worse than the worst selected, or
    // its source already contributed 3 docs at least as good
    val all = TextAnalysis.qualityScore(
        spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text",
        carry = Seq("source"))
      .select($"doc_id", $"source", $"quality")
      .as[(Long, String, Double)].collect()
    val selIds = sel.map(_._1).toSet
    val weakest = sel.minBy(r => (r._3, -r._1)) // the last pick in rank order
    all.filterNot(r => selIds.contains(r._1)).foreach { case (id, src, q) =>
      val worse = q < weakest._3 || (q == weakest._3 && id > weakest._1)
      val better = all.filter(a => a._2 == src &&
        (a._3 > q || (a._3 == q && a._1 < id)))
      assert(worse || better.length >= 3,
        s"doc $id (q=$q, $src) was excluded without cause")
    }
  }

  test("e6_moments: exact-moment skew/kurtosis match a direct computation") {
    val out = Queries.e6_moments(spark, sf)
      .as[(String, Long, Double, Double, Double, Double)].collect()
    val byFlag = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_returnflag", $"l_quantity").as[(String, Double)].collect()
      .groupBy(_._1)
    assert(out.map(_._1).toSet == byFlag.keySet)
    out.foreach { case (flag, n, mean, v, skew, kurt) =>
      val xs = byFlag(flag).map(_._2)
      assert(n == xs.length && v >= 0)
      val m = xs.sum / n
      val cen = xs.map(_ - m)
      val vv = cen.map(c => c * c).sum / n
      assert(math.abs(mean - m) < 1e-4)
      assert(math.abs(skew - cen.map(c => c * c * c).sum / n / math.pow(vv, 1.5)) < 1e-4)
      assert(math.abs(kurt - (cen.map(c => c * c * c * c).sum / n / (vv * vv) - 3)) < 1e-4)
    }
  }

  test("e11_transitions: rows are probabilities; counts cover every adjacency") {
    val out = Queries.e11_transitions(spark, sf)
      .as[(String, String, Long, Double)].collect()
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4) // each row of the matrix
    }
    val ev = Queries.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(out.map(_._3).sum == expected) // one transition per adjacent pair
  }

  test("Scd2.applyChanges == full rebuild; empty batch is identity") {
    import graft.star.Scd2
    val ev = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select($"o_custkey", $"o_orderkey", $"o_orderpriority",
        $"valid_from".cast("string"), $"valid_to".cast("string"),
        $"version", $"is_current")
      .as[(Long, Long, String, String, Option[String], Int, Int)]
      .collect().sortBy(r => (r._1, r._6))
    val full = Scd2.build(ev, Seq("o_custkey"), col("o_orderdate"),
      Seq(col("o_orderkey")), Seq("o_orderpriority"))
    val cutoff = to_date($"o_orderdate") < lit("1999-01-01")
    val prior = Scd2.build(ev.filter(cutoff), Seq("o_custkey"),
      col("o_orderdate"), Seq(col("o_orderkey")), Seq("o_orderpriority"))
    val applied = Scd2.applyChanges(prior, ev.filter(!cutoff),
      Seq("o_custkey"), col("o_orderdate"), Seq(col("o_orderkey")),
      Seq("o_orderpriority"))
    assert(key(applied).toSeq == key(full).toSeq)
    // identity: an empty change batch must leave the dimension untouched
    val idem = Scd2.applyChanges(prior, ev.filter(lit(false)),
      Seq("o_custkey"), col("o_orderdate"), Seq(col("o_orderkey")),
      Seq("o_orderpriority"))
    assert(key(idem).toSeq == key(prior).toSeq)
  }

  test("e11_anomaly: flagged z-scores match a direct trailing-window computation") {
    val out = Queries.e11_anomaly(spark, sf)
      .as[(Long, java.sql.Date, Long, Double)].collect()
    assert(out.forall(r => math.abs(r._4) > 2))
    val daily = Queries.events(spark, sf)
      .groupBy($"user_id", to_date($"ts").as("day")).count()
      .as[(Long, java.sql.Date, Long)].collect()
      .groupBy(_._1).map { case (u, rs) => u -> rs.sortBy(_._2.getTime) }
    out.foreach { case (u, day, c, z) =>
      val series = daily(u)
      val i = series.indexWhere(_._2 == day)
      val trail = series.slice(math.max(0, i - 7), i).map(_._3.toDouble)
      assert(trail.length >= 3 && series(i)._3 == c)
      val m = trail.sum / trail.length
      val sd = math.sqrt(trail.map(x => x * x).sum / trail.length - m * m)
      assert(math.abs(z - (c - m) / sd) < 1e-4, s"user $u day $day")
    }
  }

  test("e6_mode: the mode is the group's true argmax with lexicographic ties") {
    val counts = Queries.events(spark, sf)
      .groupBy("user_id", "event_type").count()
      .as[(Long, String, Long)].collect()
      .groupBy(_._1)
    val out = Queries.e6_mode(spark, sf)
      .as[(Long, String, Long)].collect()
    assert(out.map(_._1).toSet == counts.keySet)
    out.foreach { case (u, mode, n) =>
      val grp = counts(u)
      assert(n == grp.map(_._3).max)
      // among max-count values, the lexicographically smallest wins
      assert(mode == grp.filter(_._3 == n).map(_._2).min)
    }
  }
}
