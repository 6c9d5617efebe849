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
