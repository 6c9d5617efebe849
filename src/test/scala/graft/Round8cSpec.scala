package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 fourth-wave pins: each new statistic is re-derived through an
  * INDEPENDENT in-engine formulation (per-row rank windows, naive pair
  * counting, driver-side normal equations) and must agree with the
  * distinct-compressed / moment-based production query exactly — the
  * DuckDB oracle then checks cross-engine portability on top.
  */
class Round8cSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("e6_spearman: distinct-compressed ranks == per-row rank windows (independent formulation)") {
    val got = Queries.e6_spearman(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap

    // independent oracle: tie-averaged ranks via per-row windows (the
    // formulation the production query avoids for scale), plain double
    // moments — must agree at the rounded precision
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"), col("l_quantity").as("x"),
        col("l_extendedprice").as("y"))
    def r2(c: String) =
      rank().over(Window.partitionBy("l_returnflag").orderBy(c)).cast("long") * 2 +
        count(lit(1)).over(Window.partitionBy("l_returnflag", c)) - 1
    val naive = li.select(col("l_returnflag"), r2("x").as("rx"), r2("y").as("ry"))
      .groupBy("l_returnflag").agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("rx").cast("double")).as("sx"), sum(col("ry").cast("double")).as("sy"),
        sum(col("rx").cast("double") * col("ry")).as("sxy"),
        sum(col("rx").cast("double") * col("rx")).as("sxx"),
        sum(col("ry").cast("double") * col("ry")).as("syy"))
      .collect().map { r =>
        val (n, sx, sy, sxy, sxx, syy) = (r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
        r.getString(0) ->
          (n * sxy - sx * sy) / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      }.toMap

    assert(got.keySet == naive.keySet)
    got.foreach { case (g, rho) =>
      assert(math.abs(rho) <= 1.0)
      assert(math.abs(rho - naive(g)) < 1e-5, s"group $g: $rho vs ${naive(g)}")
    }
    // the synthetic lineitem draws price independently of quantity, so
    // rho is near zero — the pin is the equality above, not the sign
    assert(got.values.forall(r => math.abs(r) < 0.5))
  }

  test("e6_mannwhitney: U equals naive pair counting; z is a finite standardization") {
    val row = Queries.e6_mannwhitney(spark, sf).collect().head
    val (n1, n2, u, z) = (row.getLong(0), row.getLong(1), row.getDouble(2), row.getDouble(3))

    val ev = spark.read.parquet(s"$sf/events.parquet")
      .where(col("event_type").isin("click", "purchase"))
      .select("event_type", "value").collect()
    val a = ev.filter(_.getString(0) == "purchase").map(_.getDouble(1))
    val b = ev.filter(_.getString(0) == "click").map(_.getDouble(1))
    assert(n1 == a.length && n2 == b.length)
    // naive O(n1·n2) definition: U1 = #{va > vb} + ½·#{va == vb}
    var wins = 0.0
    for (va <- a; vb <- b) {
      if (va > vb) wins += 1.0
      else if (va == vb) wins += 0.5
    }
    assert(math.abs(u - wins) < 1e-6, s"U $u vs naive $wins")
    assert(!z.isNaN && !z.isInfinite)
    assert(u >= 0 && u <= n1.toDouble * n2)
  }

  test("e6_ols2: coefficients match driver-side normal equations; R2 in [0,1]") {
    val got = Queries.e6_ols2(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap

    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_quantity", "l_discount", "l_extendedprice").collect()
    got.keySet.foreach { g =>
      val sub = rows.filter(_.getString(0) == g)
      val n = sub.length.toDouble
      val x1 = sub.map(_.getDouble(1)); val x2 = sub.map(_.getDouble(2))
      val y = sub.map(_.getDouble(3))
      def dot(u: Array[Double], v: Array[Double]) = u.zip(v).map { case (p, q) => p * q }.sum
      val (s1, s2, sy) = (x1.sum, x2.sum, y.sum)
      val a11 = dot(x1, x1) - s1 * s1 / n
      val a12 = dot(x1, x2) - s1 * s2 / n
      val a22 = dot(x2, x2) - s2 * s2 / n
      val c1 = dot(x1, y) - s1 * sy / n
      val c2 = dot(x2, y) - s2 * sy / n
      val det = a11 * a22 - a12 * a12
      val b1 = (a22 * c1 - a12 * c2) / det
      val b2 = (a11 * c2 - a12 * c1) / det
      val b0 = (sy - b1 * s1 - b2 * s2) / n
      val (gb1, gb2, gb0, r2) = got(g)
      assert(math.abs(gb1 - b1) < 1e-4 * math.max(1, math.abs(b1)), s"$g b1 $gb1 vs $b1")
      assert(math.abs(gb2 - b2) < 1e-3 * math.max(1, math.abs(b2)), s"$g b2 $gb2 vs $b2")
      assert(math.abs(gb0 - b0) < 1e-2 * math.max(1, math.abs(b0)), s"$g b0 $gb0 vs $b0")
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("e6_basket_lift: ratios re-derive from driver-side counting; pairs bounded by singles") {
    val got = Queries.e6_basket_lift(spark, sf).collect()
    assert(got.length == 20)

    val items = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/part.parquet"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("o"), col("p_brand").as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
    val nOrders = items.map(_._1).distinct.length.toDouble
    val single = items.groupBy(_._2).map { case (b, xs) => b -> xs.length }
    val byOrder = items.groupBy(_._1).map { case (_, xs) => xs.map(_._2).toSet }

    got.foreach { r =>
      val (b1, b2, nBoth) = (r.getString(0), r.getString(1), r.getLong(2))
      val naive = byOrder.count(s => s(b1) && s(b2)).toLong
      assert(nBoth == naive, s"($b1,$b2) $nBoth vs $naive")
      assert(nBoth <= math.min(single(b1), single(b2)))
      assert(math.abs(r.getDouble(3) - nBoth / nOrders) < 1e-6)
      assert(math.abs(r.getDouble(4) - nBoth.toDouble / single(b1)) < 1e-6)
      assert(math.abs(r.getDouble(5) -
        nBoth * nOrders / (single(b1).toDouble * single(b2))) < 1e-6)
    }
  }

  test("e6_permtest: p-value well-formed and invariant under input partitioning") {
    val a = Queries.e6_permtest(spark, sf).collect().head
    val (n1, n2, nGe, p) = (a.getLong(0), a.getLong(1), a.getLong(3), a.getDouble(4))
    assert(n1 > 0 && n2 > 0)
    assert(nGe >= 0 && nGe <= 64)
    assert(math.abs(p - (nGe + 1) / 65.0) < 1e-6)
    // hash-deterministic null distribution: a second evaluation (fresh
    // plan, different parallelism upstream) must reproduce every field
    val b = Queries.e6_permtest(spark, sf).collect().head
    assert(a == b)
  }

  test("bfsHops: frontier expansion equals plain-Scala BFS on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814)
    for (trial <- 0 until 3) {
      val n = 60 + trial * 40
      val edges = (0 until n * 2).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val seeds = (0 until n by 13).map(_.toLong)
      val rounds = 3
      val got = graft.operators.Components.bfsHops(
        edges.toDF("s", "d"), "s", "d", seeds.toDF("id"), "id", rounds)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

      // oracle: breadth-first over an adjacency map
      val adj = scala.collection.mutable.Map[Long, List[Long]]().withDefaultValue(Nil)
      edges.foreach { case (a, b) => adj(a) ::= b; adj(b) ::= a }
      val dist = scala.collection.mutable.Map[Long, Int]()
      seeds.foreach(dist(_) = 0)
      var frontier = seeds.toSet
      for (r <- 1 to rounds) {
        frontier = frontier.flatMap(adj).filterNot(dist.contains)
        frontier.foreach(dist(_) = r)
      }
      assert(got == dist.toMap, s"trial $trial")
    }
  }

  test("e11_ohlc: open/close/volume re-derive from driver-side ordering") {
    val got = Queries.e11_ohlc(spark, sf).collect()
    assert(got.nonEmpty)
    val ev = graft.Queries.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3), r.getDouble(4)))
    val byKey = ev.groupBy(t => (t._1, t._2))
    got.foreach { r =>
      val rows = byKey((r.getString(0), r.getDate(1).toString)).sortBy(t => (t._3, t._4))
      assert(r.getLong(2) == rows.length)
      assert(math.abs(r.getDouble(3) - rows.head._5) < 1e-6, "open = first by (ts, event_id)")
      assert(math.abs(r.getDouble(4) - rows.map(_._5).max) < 1e-6)
      assert(math.abs(r.getDouble(5) - rows.map(_._5).min) < 1e-6)
      assert(math.abs(r.getDouble(6) - rows.last._5) < 1e-6, "close = last by (ts, event_id)")
      assert(r.getDouble(3) <= r.getDouble(4) + 1e-9 && r.getDouble(5) <= r.getDouble(3) + 1e-9)
    }
  }

  test("e4_langid_eval: recall shares row-normalize to 1 per labeled lang") {
    val rows = Queries.e4_langid_eval(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (lang, cells) =>
      val tot = cells.map(_.getDouble(3)).sum
      assert(math.abs(tot - 1.0) < 1e-4, s"$lang recall shares sum $tot")
    }
    // n is conserved: cell counts sum to the corpus size
    val corpus = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(2)).sum == corpus)
  }

  test("e6_kendall: cell-histogram C/D equal naive O(n^2) pair counting") {
    val got = Queries.e6_kendall(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_quantity", "l_discount").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    got.foreach { case (g, (n, conc, disc, tau)) =>
      val sub = rows.filter(_._1 == g)
      assert(n == sub.length)
      var (c, d) = (0L, 0L)
      for (i <- sub.indices; j <- (i + 1) until sub.length) {
        val dx = java.lang.Double.compare(sub(i)._2, sub(j)._2)
        val dy = java.lang.Double.compare(sub(i)._3, sub(j)._3)
        if (dx != 0 && dy != 0) { if (dx == dy) c += 1 else d += 1 }
      }
      assert(conc == c, s"$g concordant $conc vs $c")
      assert(disc == d, s"$g discordant $disc vs $d")
      assert(math.abs(tau) <= 1.0)
    }
  }

  test("e11_theilsen: slope/intercept re-derive from driver-side pairwise medians") {
    val got = Queries.e11_theilsen(spark, sf).collect()
    assert(got.nonEmpty)
    val daily = graft.Queries.events(spark, sf)
      .groupBy(col("event_type"), expr("unix_millis(ts) div 86400000").as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def median(xs: Array[Double]): Double = {
      val s = xs.sorted
      val h = (s.length - 1) / 2.0
      val (lo, hi) = (s(h.floor.toInt), s(h.ceil.toInt))
      lo + (hi - lo) * (h - h.floor)
    }
    got.foreach { r =>
      val (et, nDays, slope, ic) = (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      val pts = daily.filter(_._1 == et).map(t => (t._2, t._3)).sortBy(_._1)
      assert(nDays == pts.length)
      val slopes = for (i <- pts.indices.toArray; j <- (i + 1) until pts.length)
        yield (pts(j)._2 - pts(i)._2).toDouble / (pts(j)._1 - pts(i)._1)
      assert(math.abs(slope - median(slopes)) < 1e-5, s"$et slope")
      val ics = pts.map { case (d2, c2) => c2.toDouble - slope * d2 }
      assert(math.abs(ic - median(ics)) < 1e-5, s"$et intercept")
    }
  }

  test("e6_anova: F and eta^2 re-derive from driver-side group moments") {
    val r = Queries.e6_anova(spark, sf).collect().head
    val (k, n, f, eta) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    val vals = graft.Queries.events(spark, sf)
      .select(col("event_type"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)).cast("double"))
      .collect().map(row => (row.getString(0), row.getDouble(1)))
    val groups = vals.groupBy(_._1).values.map(_.map(_._2)).toArray
    assert(k == groups.length && n == vals.length)
    val grand = vals.map(_._2).sum / n
    val ssb = groups.map(g => g.length * math.pow(g.sum / g.length - grand, 2)).sum
    val ssw = groups.map(g => { val m = g.sum / g.length; g.map(x => (x - m) * (x - m)).sum }).sum
    val fN = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(f - fN) < 1e-3 * math.max(1, fN), s"F $f vs $fN")
    assert(math.abs(eta - ssb / (ssb + ssw)) < 1e-4)
    assert(eta >= 0 && eta <= 1)
  }

  test("e6_split_gain: gains re-derive from driver-side split evaluation; best-first") {
    val got = Queries.e6_split_gain(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == 5)
    assert(got.map(_._4).sliding(2).forall(p => p(0) >= p(1) - 1e-12), "gain-desc order")

    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_quantity", "l_returnflag").collect()
      .map(r => (r.getDouble(0), r.getString(1)))
    def gini(xs: Array[(Double, String)]): Double =
      1.0 - Seq("A", "N", "R").map { c =>
        val p = xs.count(_._2 == c).toDouble / xs.length; p * p
      }.sum
    val parent = gini(rows)
    got.foreach { case (th, nl, nr, gain) =>
      val (l, rr) = rows.partition(_._1 <= th)
      assert(nl == l.length && nr == rr.length)
      val expect = parent -
        (l.length.toDouble / rows.length * gini(l) + rr.length.toDouble / rows.length * gini(rr))
      assert(math.abs(gain - expect) < 1e-5, s"threshold $th: $gain vs $expect")
    }
  }

  test("e10_bottomk_sample: exactly k, hash-ascending, invariant under repartitioning") {
    val a = Queries.e10_bottomk_sample(spark, sf).collect()
    assert(a.length == 64)
    val hs = a.map(_.getLong(2))
    assert(hs.sliding(2).forall(p => p(0) <= p(1)), "hash ascending")
    // the same k ids regardless of physical layout: BoundedTopK merges
    // partials, so partitioning cannot change the winners
    val b = Queries.e10_bottomk_sample(spark, sf).collect()
    assert(a.map(_.getLong(1)).toSeq == b.map(_.getLong(1)).toSeq)
    // matches a full-sort formulation
    val brute = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), graft.functions.portableStringHash(col("doc_id").cast("string")).as("h"))
      .orderBy("h", "doc_id").limit(64).collect().map(_.getLong(0)).toSeq
    assert(a.map(_.getLong(1)).toSeq == brute)
  }

  test("e6_bootstrap: deterministic CI brackets the observed mean") {
    val a = Queries.e6_bootstrap(spark, sf).collect().head
    val (n, mean, lo, hi) = (a.getLong(0), a.getDouble(1), a.getDouble(2), a.getDouble(3))
    assert(n > 0 && lo <= hi)
    assert(lo <= mean && mean <= hi,
      s"95% bootstrap CI [$lo, $hi] should bracket the point estimate $mean")
    assert(Queries.e6_bootstrap(spark, sf).collect().head == a, "hash-deterministic")
  }

  test("e11_interval_merge: matches driver-side sweep-line merge per user") {
    val got = Queries.e11_interval_merge(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val iv = graft.Queries.events(spark, sf)
      .select(col("user_id"), unix_millis(col("ts")).as("st")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(1) + 1800000L))
    iv.groupBy(_._1).foreach { case (u, xs) =>
      val sorted = xs.map(t => (t._2, t._3)).sortBy(identity)
      val merged = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      sorted.foreach { case (s0, e0) =>
        if (merged.nonEmpty && s0 <= merged.last._2)
          merged(merged.length - 1) = (merged.last._1, math.max(merged.last._2, e0))
        else merged += ((s0, e0))
      }
      val (n, cov, mx) = got(u)
      assert(n == merged.length, s"user $u count")
      assert(cov == merged.map(m => m._2 - m._1).sum, s"user $u coverage")
      assert(mx == merged.map(m => m._2 - m._1).max, s"user $u max")
    }
  }

  test("etl_checksum: invariant under row order/partitioning; sensitive to one cell") {
    val a = Queries.etl_checksum(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(a.keySet == Set("orders", "customer"))

    def fingerprint(df: org.apache.spark.sql.DataFrame): Long = df
      .select(graft.functions.portableStringHash(concat_ws("|",
        col("o_orderkey").cast("string"), col("o_custkey").cast("string"),
        col("o_orderstatus"),
        col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)).cast("string"),
        col("o_orderdate").cast("date").cast("string"), col("o_orderpriority"))).as("h"))
      .agg(sum(col("h")).cast(org.apache.spark.sql.types.DecimalType(38, 0)).cast("long"))
      .collect().head.getLong(0)

    val orders = spark.read.parquet(s"$sf/orders.parquet")
    assert(fingerprint(orders) == a("orders")._2)
    // physical layout must not matter: the sum commutes
    assert(fingerprint(orders.repartition(13)) == a("orders")._2)
    assert(fingerprint(orders.orderBy(col("o_totalprice").desc)) == a("orders")._2)
    // one changed cell must move the checksum
    val perturbed = orders.withColumn("o_totalprice",
      when(col("o_orderkey") === orders.select(min("o_orderkey")).collect().head.getLong(0),
        col("o_totalprice") + 0.01).otherwise(col("o_totalprice")))
    assert(fingerprint(perturbed) != a("orders")._2)
  }

  test("e3_probe_sweep: recall is monotone in nprobe and capped at 1") {
    val rows = Queries.e3_probe_sweep(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 4))
    assert(rows.map(_._3).sliding(2).forall(p => p(0) <= p(1) + 1e-12),
      "probing more cells can only add candidates")
    assert(rows.forall(r => r._3 >= 0 && r._3 <= 1.0))
    assert(rows.forall(r => math.abs(r._3 - r._2 / 24.0) < 1e-6))
  }

  test("e2_node_jaccard: matches driver-side neighbor-set computation") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val pairs = graft.operators.Similarity.nearDupPairs(e, threshold = 0.1, bits = 8)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set.empty)
    pairs.foreach { case (a, b) => adj(a) += b; adj(b) += a }

    val got = Queries.e2_node_jaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // every reported pair re-derives; every qualifying pair is reported
    got.foreach { case ((u, v), (c, j)) =>
      val inter = (adj(u) & adj(v)).size
      assert(c == inter, s"($u,$v) common $c vs $inter")
      val expect = inter.toDouble / (adj(u).size + adj(v).size - inter)
      assert(math.abs(j - expect) < 1e-6)
    }
    val all = for {
      u <- adj.keys; v <- adj.keys if u < v
      inter = (adj(u) & adj(v)).size if inter > 0
      j = inter.toDouble / (adj(u).size + adj(v).size - inter) if j >= 0.5 - 1e-9
    } yield (u, v)
    assert(all.toSet == got.keySet, "qualifying pair sets agree")
  }

  test("e11_growth: deltas re-derive from weekly counts") {
    val got = Queries.e11_growth(spark, sf).collect()
    assert(got.nonEmpty)
    val weekly = graft.Queries.events(spark, sf)
      .groupBy(col("event_type"), expr("(unix_millis(ts) div 86400000 + 3) div 7").as("week"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    got.foreach { r =>
      val (et, wk, n, d) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n == weekly((et, wk)))
      val prev = weekly((et, wk - 1))
      assert(d == n - prev, s"$et week $wk delta")
      assert(math.abs(r.getDouble(4) - (n - prev).toDouble / prev) < 1e-6)
    }
  }

  test("etl_late_dim_repair: orphan accounting conserves; repair closes every orphan") {
    val rows = Queries.etl_late_dim_repair(spark, sf).collect()
    assert(rows.nonEmpty)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey", "o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    rows.foreach { r =>
      val (st, nf, before, rep, after) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(before == rep + after, s"$st: orphans must be repaired or remain")
      assert(after == 0, s"$st: every order FK exists, so repair closes all orphans")
      val sub = orders.filter(_._2 == st)
      assert(nf == sub.length)
      assert(before == sub.count(_._1 % 19 == 4), s"$st: orphan cohort")
    }
  }

  test("e4_quality_calibration: deciles partition the corpus") {
    val rows = Queries.e4_quality_calibration(spark, sf).collect()
    val corpus = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == corpus, "every doc lands in one decile")
    assert(rows.map(_.getInt(0)).distinct.length == rows.length)
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 9))
    assert(rows.forall(r => r.getDouble(2) >= 0 && r.getDouble(2) <= 1))
  }

  test("e6_mutual_info: information inequalities hold; matches driver-side computation") {
    val r = Queries.e6_mutual_info(spark, sf).collect().head
    val (n, mi, hl, hs, nmi) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(mi >= -1e-9, "MI is nonnegative")
    assert(mi <= math.min(hl, hs) + 1e-9, "MI bounded by min entropy")
    assert(nmi >= -1e-9 && nmi <= 1 + 1e-9)

    val cells = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "source").collect().map(r2 => (r2.getString(0), r2.getString(1)))
    assert(n == cells.length)
    val joint = cells.groupBy(identity).map { case (k, v) => k -> v.length.toDouble }
    val pl = cells.groupBy(_._1).map { case (k, v) => k -> v.length.toDouble }
    val ps = cells.groupBy(_._2).map { case (k, v) => k -> v.length.toDouble }
    val nn = cells.length.toDouble
    val miN = joint.map { case ((l, s0), c) =>
      (c / nn) * math.log(c * nn / (pl(l) * ps(s0)))
    }.sum
    assert(math.abs(mi - miN) < 1e-5, s"MI $mi vs $miN")
  }

  test("e11_decompose: strength in [0,1]; matches driver-side decomposition") {
    val got = Queries.e11_decompose(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.nonEmpty)
    val daily = graft.Queries.events(spark, sf)
      .groupBy(col("event_type"), expr("unix_millis(ts) div 86400000").as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (et, (nDays, strength)) =>
      assert(strength >= 0 && strength <= 1, s"$et strength $strength")
      val pts = daily.filter(_._1 == et).map(t => (t._2, t._3)).sortBy(_._1)
      val byDay = pts.toMap
      // centered MA(7) on interior days only
      val interior = pts.filter { case (d, _) =>
        (-3 to 3).forall(o => byDay.contains(d + o)) }
      assert(nDays == interior.length, s"$et interior days")
      val det = interior.map { case (d, c) =>
        (d, c.toDouble - (-3 to 3).map(o => byDay(d + o)).sum / 7.0) }
      val seas = det.groupBy { case (d, _) => (d + 4) % 7 }
        .map { case (k, v) => k -> v.map(_._2).sum / v.length }
      val rem = det.map { case (d, x) => x - seas((d + 4) % 7) }
      val expect = math.max(0.0,
        1.0 - rem.map(x => x * x).sum / det.map(_._2).map(x => x * x).sum)
      assert(math.abs(strength - expect) < 1e-5, s"$et $strength vs $expect")
    }
  }

  test("e6_simpson: group slopes re-derive; pooled slope is the moment sum") {
    val rows = Queries.e6_simpson(spark, sf).collect()
    assert(rows.length == 3)
    val pooled = rows.head.getDouble(3)
    assert(rows.forall(_.getDouble(3) == pooled), "one pooled slope")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    def slope(xs: Array[(Double, Double)]): Double = {
      val n = xs.length.toDouble
      val (sx, sy) = (xs.map(_._1).sum, xs.map(_._2).sum)
      val sxy = xs.map(t => t._1 * t._2).sum
      val sxx = xs.map(t => t._1 * t._1).sum
      (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }
    rows.foreach { r =>
      val g = r.getString(0)
      val sub = li.filter(_._1 == g).map(t => (t._2, t._3))
      assert(math.abs(r.getDouble(2) - slope(sub)) < 1e-3, s"$g slope")
      assert(r.getBoolean(4) ==
        (math.signum(r.getDouble(2)) != math.signum(pooled)))
    }
    assert(math.abs(pooled - slope(li.map(t => (t._2, t._3)))) < 1e-3)
  }

  test("e4_collocations: PMI re-derives from driver-side counts; floor respected") {
    val got = Queries.e4_collocations(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 20)
    assert(got.forall(_._2 >= 5), "count floor")
    assert(got.map(_._3).sliding(2).forall(p => p(0) >= p(1) - 1e-12), "pmi-desc")

    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0).split(" ", -1).toSeq)
    val uni = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val big = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    var nBig = 0L
    docs.foreach { tk =>
      tk.foreach(w => uni(w) += 1)
      if (tk.length >= 2) {
        tk.sliding(2).foreach(p => big(p.mkString(" ")) += 1)
        nBig += tk.length - 1
      }
    }
    val nTok = uni.values.sum
    got.foreach { case (bg, c, pmi) =>
      assert(c == big(bg), s"$bg count")
      val Array(w1, w2) = bg.split(" ", 2)
      val expect = math.log(c.toDouble * nTok * nTok / (nBig.toDouble * uni(w1) * uni(w2)))
      assert(math.abs(pmi - expect) < 1e-5, s"$bg pmi $pmi vs $expect")
    }
  }

  test("e2_transitivity: scalar summary consistent with the per-node triangle frame") {
    val r = Queries.e2_transitivity(spark, sf).collect().head
    val (nodes, tri, wedges, t) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(t >= 0 && t <= 1 + 1e-9, "transitivity is a closed-wedge fraction")
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val stats = graft.operators.Components.triangleStats(
      graft.operators.Similarity.nearDupPairs(e, threshold = 0.1, bits = 8),
      "id1", "id2").collect()
    assert(nodes == stats.length)
    assert(tri == stats.map(_.getLong(2)).sum / 3)
    assert(wedges == stats.map(x => { val d = x.getLong(1); d * (d - 1) / 2 }).sum)
    assert(math.abs(t - 3.0 * tri / wedges) < 1e-6)
  }

  test("e11_rolling_slope: window moments equal driver-side OLS per trailing week") {
    val got = Queries.e11_rolling_slope(spark, sf).collect()
    assert(got.nonEmpty)
    val daily = graft.Queries.events(spark, sf)
      .groupBy(col("event_type"), expr("unix_millis(ts) div 86400000").as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = daily.groupBy(_._1).map { case (k, v) =>
      k -> v.map(t => (t._2, t._3)).sortBy(_._1) }
    got.foreach { r =>
      val (et, day, slope) = (r.getString(0), r.getLong(1), r.getDouble(2))
      val pts = byType(et)
      val i = pts.indexWhere(_._1 == day)
      val wpts = pts.slice(i - 6, i + 1)
      assert(wpts.length == 7, "full trailing window")
      val n = 7.0
      val sx = wpts.map(_._1.toDouble).sum; val sy = wpts.map(_._2.toDouble).sum
      val sxy = wpts.map(t => t._1.toDouble * t._2).sum
      val sxx = wpts.map(t => t._1.toDouble * t._1).sum
      val expect = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(slope - expect) < 1e-4, s"$et day $day: $slope vs $expect")
    }
  }

  test("e11_churn: churned + retained == active; last week excluded") {
    val rows = Queries.e11_churn(spark, sf).collect()
    assert(rows.nonEmpty)
    val uw = graft.Queries.events(spark, sf)
      .select(col("user_id"), expr("(unix_millis(ts) div 86400000 + 3) div 7").as("week"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byWeek = uw.groupBy(_._2).map { case (w, v) => w -> v.map(_._1).toSet }
    val maxWeek = byWeek.keys.max
    assert(rows.forall(_.getLong(0) < maxWeek))
    rows.foreach { r =>
      val (wk, active, churned, rate) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(active == byWeek(wk).size)
      val expect = (byWeek(wk) -- byWeek.getOrElse(wk + 1, Set.empty)).size
      assert(churned == expect, s"week $wk churned")
      assert(math.abs(rate - expect.toDouble / active) < 1e-6)
    }
  }

  test("e10_hll_rolling: window union equals a direct 7-day sketch; exact within 5%") {
    import org.apache.spark.sql.functions._
    val rows = Queries.e10_hll_rolling(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(2) == 1), "estimates within 5% of exact everywhere")
    // union-of-daily == direct sketch over the same 7 days (register-max
    // losslessness), probed on one interior day
    val ev = graft.Queries.events(spark, sf)
      .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"))
    val probe = rows(rows.length / 2).getLong(0)
    val direct = ev.filter(col("day").between(probe - 6, probe))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))")).collect().head.getLong(0)
    val viaUnion = ev.filter(col("day").between(probe - 6, probe))
      .groupBy("day").agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))")).collect().head.getLong(0)
    assert(direct == viaUnion, "sketch algebra is lossless")
  }

  test("e6_proptest: counts conserve and z matches the pooled formula") {
    val r = Queries.e6_proptest(spark, sf).collect().head
    val (n1, k1, n2, k2, diff, z) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))
    assert(k1 <= n1 && k2 <= n2)
    val total = graft.Queries.events(spark, sf).count()
    assert(n1 + n2 == total, "halves partition the events")
    val (p1, p2) = (k1.toDouble / n1, k2.toDouble / n2)
    assert(math.abs(diff - (p1 - p2)) < 1e-6)
    val pp = (k1 + k2).toDouble / (n1 + n2)
    val expect = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2))
    assert(math.abs(z - expect) < 1e-5)
  }

  test("e2_cross_lang_dups: groups re-derive from driver-side prefix keys") {
    val got = Queries.e2_cross_lang_dups(spark, sf).collect()
    assert(got.nonEmpty, "the corpus has shared-prefix groups")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).take(8).mkString(" ")))
    val groups = docs.groupBy(_._3).filter(_._2.length >= 2)
    assert(got.length == groups.size)
    val byMembers = got.map(r => r.getString(4) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    groups.values.foreach { g =>
      val members = g.map(_._1).sorted.mkString(",")
      val (nd, nl, xl) = byMembers(members)
      assert(nd == g.length)
      assert(nl == g.map(_._2).distinct.length)
      assert(xl == (if (nl >= 2) 1 else 0))
    }
  }

  test("graft_calendar TVF: SQL relation equals the Column-API generator; literals enforced") {
    val tuned = graft.Graft.tune(spark)
    val viaSql = tuned.sql(
      "SELECT * FROM graft_calendar('2001-07-28', '2001-09-03')").collect()
    val viaApi = graft.star.CalendarDim
      .overRange(tuned, "2001-07-28", "2001-09-03").collect()
    assert(viaSql.length == 38 && viaApi.length == 38)
    assert(viaSql.map(_.toString).sorted.sameElements(viaApi.map(_.toString).sorted))
    // date literals (not just strings) also accepted
    val viaDate = tuned.sql(
      "SELECT count(*) AS n FROM graft_calendar(DATE'2001-01-01', DATE'2001-12-31')")
      .collect().head.getLong(0)
    assert(viaDate == 365)
    // non-literal bounds must be rejected, not silently mis-planned
    intercept[Exception] {
      tuned.sql("SELECT * FROM graft_calendar(current_date(), '2001-02-01')").collect()
    }
  }

  test("e6_kappa: po/pe re-derive from the confusion matrix; kappa <= po") {
    val r = Queries.e6_kappa(spark, sf).collect().head
    val (n, agree, po, pe, kappa) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val cells = Queries.e4_langid_eval(spark, sf).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    assert(n == cells.map(_._3).sum)
    assert(agree == cells.filter(c => c._1 == c._2).map(_._3).sum)
    val peN = cells.groupBy(_._1).map { case (l, v) =>
      v.map(_._3).sum.toDouble * cells.filter(_._2 == l).map(_._3).sum
    }.sum / (n.toDouble * n)
    assert(math.abs(pe - peN) < 1e-5)
    assert(math.abs(kappa - (po - pe) / (1 - pe)) < 1e-5)
    assert(kappa <= po + 1e-9, "chance correction can only reduce agreement")
  }

  test("e4_quality_auc: equals naive pairwise comparison probability") {
    val r = Queries.e4_quality_auc(spark, sf).collect().head
    val (nEn, nOther, auc) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(auc >= 0 && auc <= 1)
    val q = graft.operators.TextAnalysis.qualityScore(
        spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text",
        carry = Seq("lang"))
      .select(col("quality"), (col("lang") === "en").as("is_en")).collect()
      .map(x => (x.getDouble(0), x.getBoolean(1)))
    val en = q.filter(_._2).map(_._1); val other = q.filterNot(_._2).map(_._1)
    assert(nEn == en.length && nOther == other.length)
    var wins = 0.0
    for (a <- en; b <- other) {
      if (a > b) wins += 1.0 else if (a == b) wins += 0.5
    }
    assert(math.abs(auc - wins / (en.length.toDouble * other.length)) < 1e-5)
  }

  test("e2_adamic_adar: scores re-derive from neighbor sets and degrees") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val pairs = graft.operators.Similarity.nearDupPairs(e, threshold = 0.1, bits = 8)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set.empty)
    pairs.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val got = Queries.e2_adamic_adar(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (u, v, nc, aa) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val shared = adj(u) & adj(v)
      assert(nc == shared.size)
      val expect = shared.toSeq.map { w =>
        BigDecimal(1.0 / math.log(adj(w).size))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.sum
      assert(math.abs(aa - expect) < 1e-5, s"($u,$v) $aa vs $expect")
    }
    assert(got.map(_.getDouble(3)).sliding(2).forall(p => p(0) >= p(1) - 1e-12))
  }

  test("e8_topk_at_rest: two-level shard merge equals the direct global top-k") {
    val got = Queries.e8_topk_at_rest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == 20)
    val direct = graft.operators.TextAnalysis.qualityScore(
        spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text")
      .select("doc_id", "quality")
      .orderBy(col("quality").desc, col("doc_id")).limit(20).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == direct.toSeq, "shard-list merge is lossless")
  }

  test("e2_modularity: Q re-derives from components and is within [-0.5, 1]") {
    val r = Queries.e2_modularity(spark, sf).collect().head
    val (m, nc, q) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(q >= -0.5 && q <= 1.0)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val pairs = graft.operators.Similarity.nearDupPairs(e, threshold = 0.1, bits = 8)
      .select("id1", "id2").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(m == pairs.length)
    // driver-side union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r0 = find(p); parent(x) = r0; r0 }
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val comp = pairs.flatMap(p => Seq(p._1, p._2)).distinct.map(x => x -> find(x)).toMap
    assert(nc == comp.values.toSet.size)
    val comms: Seq[Long] = comp.values.toSet.toSeq
    val mIn: Map[Long, Int] = comms.map { (c: Long) =>
      c -> pairs.count(p => comp(p._1) == c && comp(p._2) == c) }.toMap
    val dC: Map[Long, Int] = comms.map { (c: Long) =>
      c -> pairs.map(p => Seq(p._1, p._2).count(comp(_) == c)).sum }.toMap
    val expect: Double = comms.map { (c: Long) =>
      BigDecimal(mIn(c).toDouble / m - math.pow(dC(c) / (2.0 * m), 2))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble }.sum
    assert(math.abs(q - expect) < 1e-5, s"Q $q vs $expect")
  }

  test("e4_zipf: slope/intercept re-derive from the frequency spectrum") {
    val r = Queries.e4_zipf(spark, sf).collect().head
    val (n, slope, ic) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    val freq = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity).map { case (w, v) => (w, v.length) }.toSeq
    assert(n == freq.length)
    val ranked = freq.sortBy { case (w, c) => (-c, w) }.zipWithIndex
      .map { case ((_, c), i) =>
        (math.floor(math.log(i + 1.0) * 1e6 + 0.5), math.floor(math.log(c.toDouble) * 1e6 + 0.5)) }
    val nn = ranked.length.toDouble
    val sx = ranked.map(_._1).sum; val sy = ranked.map(_._2).sum
    val sxy = ranked.map(t => t._1 * t._2).sum; val sxx = ranked.map(t => t._1 * t._1).sum
    val sl = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    assert(math.abs(slope - sl) < 1e-4, s"slope $slope vs $sl")
    assert(math.abs(ic - (sy - sl * sx) / nn / 1e6) < 1e-4)
    assert(slope < 0, "frequency decreases with rank")
  }

  test("e11_drawdown: peak-to-trough re-derives from the daily series") {
    val got = Queries.e11_drawdown(spark, sf).collect()
    assert(got.nonEmpty)
    val daily = graft.Queries.events(spark, sf)
      .groupBy(col("event_type"), expr("unix_millis(ts) div 86400000").as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got.foreach { r =>
      val (et, nd, drop, dd) = (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val pts = daily.filter(_._1 == et).sortBy(_._2).map(_._3)
      assert(nd == pts.length)
      var peak = Long.MinValue; var worst = 0L; var worstRel = 0.0
      pts.foreach { c =>
        peak = math.max(peak, c)
        worst = math.max(worst, peak - c)
        worstRel = math.max(worstRel, (peak - c).toDouble / peak)
      }
      assert(drop == worst, s"$et drop")
      assert(math.abs(dd - worstRel) < 1e-6)
    }
  }

  test("e3_hash_embed: sparse inverted-index cosine equals driver-side dense vectors") {
    val got = Queries.e3_hash_embed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // dense 16-dim reference via the same portable hash
    def hashTok(t: String): Int = {
      var a = 7L
      t.foreach(ch => a = (a * 31 + ch.toLong) % graft.functions.HashPrime)
      (a % 16).toInt
    }
    val vecs = docs.map { case (id, text) =>
      val v = new Array[Double](16)
      text.split(" ", -1).foreach(t => v(hashTok(t)) += 1.0)
      id -> v
    }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    got.foreach { case ((q, _), (cand, sim)) =>
      assert(math.abs(sim - cos(vecs(q), vecs(cand))) < 1e-5, s"($q,$cand)")
    }
    // per query the ranked sims are the true top-3
    got.keys.map(_._1).toSeq.distinct.foreach { q0 =>
      val best = vecs.filter(_._1 != q0).map { case (c, v) => (c, cos(vecs(q0), v)) }
        .toSeq.sortBy { case (c, s0) =>
          (-BigDecimal(s0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, c) }
        .take(3).map(_._1)
      val gotIds = (1 to 3).flatMap(rk => got.get((q0, rk)).map(_._1))
      assert(gotIds == best, s"query $q0: $gotIds vs $best")
    }
  }

  test("e10_hist_rest: merged-histogram quantiles equal raw-column percentiles") {
    val r = Queries.e10_hist_rest(spark, sf).collect().head
    val (n, p25, p50, p75, p95) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val vals = graft.Queries.events(spark, sf)
      .where(col("event_type") === "purchase")
      .select(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))
        .cast("double")).collect().map(_.getDouble(0)).sorted
    assert(n == vals.length)
    def qc(p: Double): Double = {
      val h = p * (vals.length - 1)
      val (k0, k1) = (h.floor.toInt, h.ceil.toInt)
      vals(k0) + (vals(k1) - vals(k0)) * (h - k0)
    }
    assert(math.abs(p25 - qc(0.25)) < 1e-6)
    assert(math.abs(p50 - qc(0.5)) < 1e-6)
    assert(math.abs(p75 - qc(0.75)) < 1e-6)
    assert(math.abs(p95 - qc(0.95)) < 1e-6)
  }

  test("etl_pseudonymize: stable mapping, loss accounting, collisions re-derive") {
    val r = Queries.etl_pseudonymize(spark, sf).collect().head
    val (nu, np, lost, ncoll) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(lost == nu - np)
    val ids = graft.Queries.events(spark, sf)
      .select("user_id").distinct().collect().map(_.getLong(0))
    assert(nu == ids.length)
    def pseudo(id: Long): Long = {
      var a = 7L
      s"s8#$id".foreach(ch => a = (a * 31 + ch.toLong) % graft.functions.HashPrime)
      a
    }
    val groups = ids.groupBy(pseudo)
    assert(np == groups.size)
    assert(ncoll == groups.values.filter(_.length >= 2).map(_.length).sum)
    // stability: a second run maps identically
    assert(Queries.etl_pseudonymize(spark, sf).collect().head == r)
  }

  test("e11_dow_hour: cells partition all events; shares sum to 1") {
    val rows = Queries.e11_dow_hour(spark, sf).collect()
    val total = graft.Queries.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == total)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-3)
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 6))
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 23))
  }

  test("e6_cramers_v: chi2 consistent with V; V in [0,1]") {
    val r = Queries.e6_cramers_v(spark, sf).collect().head
    val (n, chi2, v) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(v >= 0 && v <= 1 + 1e-9)
    val cells = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "source").collect()
      .map(x => (x.getString(0), x.getString(1)))
    assert(n == cells.length)
    val rDim = cells.map(_._1).distinct.length
    val kDim = cells.map(_._2).distinct.length
    assert(math.abs(v - math.sqrt(chi2 / (n.toDouble * math.min(rDim - 1, kDim - 1)))) < 1e-5)
    // chi2 against a driver-side computation
    val nn = cells.length.toDouble
    val joint = cells.groupBy(identity).map { case (k2, x) => k2 -> x.length.toDouble }
    val pl = cells.groupBy(_._1).map { case (k2, x) => k2 -> x.length.toDouble }
    val ps = cells.groupBy(_._2).map { case (k2, x) => k2 -> x.length.toDouble }
    val expect = joint.map { case ((l, s0), c) =>
      val e0 = pl(l) * ps(s0) / nn
      (c - e0) * (c - e0) / e0
    }.sum
    assert(math.abs(chi2 - expect) < 1e-3, s"chi2 $chi2 vs $expect")
  }

  test("e11_interarrival: moments and median re-derive from per-user gaps") {
    val got = Queries.e11_interarrival(spark, sf).collect()
    assert(got.nonEmpty)
    val ev = graft.Queries.events(spark, sf)
      .select(col("event_type"), col("user_id"), unix_millis(col("ts")).as("t"),
        col("event_id")).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    got.foreach { r =>
      val (et, nG, meanG, cv, p50) = (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val gaps: Array[Double] = ev.filter(_._1 == et).groupBy(_._2).values.flatMap { u =>
        val ts = u.sortBy(x => (x._3, x._4)).map(_._3)
        ts.zip(ts.drop(1)).map { case (a, b) => (b - a).toDouble }
      }.toArray.sorted
      assert(nG == gaps.length)
      val m = gaps.sum / gaps.length
      assert(math.abs(meanG - m) < 1e-2)
      val vr = gaps.map(g => (g - m) * (g - m)).sum / (gaps.length - 1)
      assert(math.abs(cv - math.sqrt(vr) / m) < 1e-4, s"$et cv")
      val h = 0.5 * (gaps.length - 1)
      val medN = gaps(h.floor.toInt) + (gaps(h.ceil.toInt) - gaps(h.floor.toInt)) * (h - h.floor)
      assert(math.abs(p50 - medN) < 1e-2, s"$et median")
    }
  }

  test("e6_partial_corr: matches driver-side three-way correlation algebra") {
    val got = Queries.e6_partial_corr(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_quantity", "l_extendedprice", "l_discount")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    def corr(a: Array[Double], b: Array[Double]): Double = {
      val n = a.length.toDouble
      val (sa, sb) = (a.sum, b.sum)
      val sab = a.zip(b).map { case (p, q) => p * q }.sum
      val (saa, sbb) = (a.map(p => p * p).sum, b.map(p => p * p).sum)
      (n * sab - sa * sb) / (math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb))
    }
    got.foreach { case (g, (rxy, rpart)) =>
      val sub = li.filter(_._1 == g)
      val (x, y, z) = (sub.map(_._2), sub.map(_._3), sub.map(_._4))
      assert(math.abs(rxy - corr(x, y)) < 1e-4)
      val (rxz, ryz) = (corr(x, z), corr(y, z))
      val expect = (corr(x, y) - rxz * ryz) /
        math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
      assert(math.abs(rpart - expect) < 1e-4, s"$g partial")
      assert(math.abs(rpart) <= 1 + 1e-9)
    }
  }

  test("e4_heaps: growth curve is monotone and matches driver-side prefixes") {
    val rows = Queries.e4_heaps(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 10)
    assert(rows.map(_._2).sliding(2).forall(p => p(0) <= p(1)), "tokens monotone")
    assert(rows.map(_._3).sliding(2).forall(p => p(0) <= p(1)), "types monotone")
    val beta = rows.head._4
    assert(rows.forall(_._4 == beta), "one global exponent")
    // the synthetic corpus draws from a ~31-term vocabulary that
    // saturates by the first checkpoint, so beta lands at 0 — exactly
    // the "template corpus" signature the fingerprint exists to expose
    assert(beta >= 0 && beta <= 1.05, s"Heaps exponent $beta")

    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val mx = docs.map(_._1).max
    rows.foreach { case (i, nTok, nTyp, _) =>
      val th = mx * i / 10
      val pre = docs.filter(_._1 <= th).flatMap(_._2)
      assert(nTok == pre.length, s"checkpoint $i tokens")
      assert(nTyp == pre.distinct.length, s"checkpoint $i types")
    }
  }

  test("etl_reconcile: the reconciliation triangle accounts for every key") {
    val r = Queries.etl_reconcile(spark, sf).collect().head
    val (joined, hOnly, lOnly, matched, maxGap) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getDouble(4))
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val lines = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey").collect().map(_.getLong(0)).toSet
    assert(joined == (orders & lines).size)
    assert(hOnly == (orders -- lines).size)
    assert(lOnly == (lines -- orders).size)
    assert(matched <= joined, "a match requires both sides")
    assert(maxGap >= 0)
    // on this synthetic data header and line prices are independent, so
    // near-universal mismatch is the CORRECT verdict, not a bug
    assert(matched < joined)
  }

  test("e11_ltv: cumulative per-user value re-derives from signup cohorts") {
    val got = Queries.e11_ltv(spark, sf).collect()
    assert(got.nonEmpty)
    val ev = graft.Queries.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        expr("(unix_millis(ts) div 86400000 + 3) div 7").as("week"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)).cast("double"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val cohort = ev.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, v) => u -> v.map(_._3).min }
    got.groupBy(_.getLong(0)).foreach { case (c, rows) =>
      val users = cohort.filter(_._2 == c).keys.toSet
      assert(rows.head.getLong(2) == users.size, s"cohort $c census")
      var cum = 0.0
      rows.sortBy(_.getInt(1)).foreach { r =>
        val off = r.getInt(1)
        val wk = ev.filter(e => e._2 == "purchase" && users(e._1) && e._3 == c + off)
          .map(_._4).sum
        assert(math.abs(r.getDouble(3) - wk) < 1e-2, s"cohort $c offset $off weekly")
        cum += wk
        assert(math.abs(r.getDouble(4) - cum / users.size) < 1e-3, s"cohort $c offset $off ltv")
      }
    }
  }

  test("e6_srm: arm counts partition the users; chi2 matches the GOF formula") {
    val r = Queries.e6_srm(spark, sf).collect().head
    val (n, na, nb, chi2, flag) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getInt(4))
    assert(na + nb == n)
    val e0 = n / 2.0
    val expect = (na - e0) * (na - e0) / e0 + (nb - e0) * (nb - e0) / e0
    assert(math.abs(chi2 - expect) < 1e-5)
    assert(flag == (if (expect > 3.841) 1 else 0))
    // a healthy hash allocator must NOT trip SRM on this population
    assert(flag == 0, s"hash split is biased: $na vs $nb (chi2 $chi2)")
  }
}
