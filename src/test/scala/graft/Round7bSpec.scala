package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bloom, Components, Ids, Privacy, Similarity, TextAnalysis}

/** Batch-24 operator pins: winnowing's shared-run guarantee, the privacy
  * gates' invariants, Bloom's no-false-negative contract, the two-phase
  * global-id formulation against the naive window, and rank-metric
  * boundary cases.
  */
class Round7bSpec extends SparkSpec {
  import spark.implicits._

  // --- winnowing -------------------------------------------------------

  test("winnow: documents sharing a run of >= w+k-1 tokens share a fingerprint") {
    // k=4, w=5: guarantee threshold is 8 shared tokens
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val d1 = s"one two $shared three"
    val d2 = s"nine eight seven $shared"
    val df = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val fps = TextAnalysis.winnow(df, "doc_id", "text", k = 4, w = 5)
      .collect().groupBy(_.getLong(0)).map { case (k, v) =>
        k -> v.map(_.getLong(1)).toSet
      }
    assert(fps(1L).intersect(fps(2L)).nonEmpty)
  }

  test("winnow: disjoint documents share no fingerprint; short docs handled") {
    val df = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "k l m n o p q r s t"),
      (3L, "u v w x"), // exactly k tokens -> 1 gram -> 1 whole-doc window
      (4L, "u v w")    // < k tokens -> absent
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnow(df, "doc_id", "text", k = 4, w = 5)
      .collect().groupBy(_.getLong(0)).map { case (k, v) =>
        k -> v.map(_.getLong(1)).toSet
      }
    assert(fps(1L).intersect(fps(2L)).isEmpty)
    assert(fps(3L).size == 1)
    assert(!fps.contains(4L))
  }

  test("winnow density: fingerprint count is far below gram count") {
    // winnowing samples ~2/(w+1) of the gram stream; pin an upper bound
    val text = (0 until 400).map(i => s"t${i % 37}").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val nFp = TextAnalysis.winnow(df, "doc_id", "text", k = 4, w = 5).count()
    assert(nFp > 0 && nFp < 400 / 2)
  }

  // --- privacy gates ---------------------------------------------------

  test("kAnonymitySuppress: surviving QI groups all have size >= k; small groups fully masked") {
    val df = (0 until 40).map(i => (i.toLong, s"qi${i % 3}", "v")) ++
      Seq((100L, "rare", "v")) // singleton group
    val out = Privacy.kAnonymitySuppress(
      df.toDF("id", "qi", "payload"), Seq("qi"), k = 5).collect()
    val survivors = out.filter(_.getAs[Int]("suppressed") == 0)
    assert(survivors.groupBy(_.getAs[String]("qi")).values.forall(_.length >= 5))
    val masked = out.filter(_.getAs[Int]("suppressed") == 1)
    assert(masked.length == 1 && masked.head.getAs[String]("qi") == "*")
    assert(masked.head.getAs[Long]("group_n") == 1L)
  }

  test("lDiversity flags homogeneous groups") {
    val df = Seq(
      ("g1", "a"), ("g1", "b"), ("g1", "c"),
      ("g2", "a"), ("g2", "a"), ("g2", "a")).toDF("qi", "sens")
    val out = Privacy.lDiversity(df, Seq("qi"), "sens", l = 2)
      .collect().map(r => r.getString(0) -> r.getAs[Int]("diverse")).toMap
    assert(out("g1") == 1 && out("g2") == 0)
  }

  // --- Bloom -----------------------------------------------------------

  test("Bloom: zero false negatives; FP rate bounded on disjoint probes") {
    val members = (0L until 2000L).map(i => i * 7919L % 1000000007L)
    val mDf = members.toDF("x")
    val bits = 1 << 17
    val bloom = Bloom.build(mDf, bits, 5)
    val probed = mDf.filter(Bloom.mightContain(col("x"), bloom, bits, 5)).count()
    assert(probed == members.size, "false negative: a member was rejected")
    // disjoint probe set (different residues): expected FP ~ (1-e^-kn/m)^k
    // ~ 0.2% at n=2000, m=2^17, k=5; assert a loose 5% ceiling
    val others = (0L until 2000L).map(i => (i * 7919L + 3L) % 1000000007L)
      .filterNot(members.toSet)
    val fp = others.toDF("x")
      .filter(Bloom.mightContain(col("x"), bloom, bits, 5)).count()
    assert(fp.toDouble / others.size < 0.05, s"FP rate too high: $fp/${others.size}")
  }

  // --- global dense ids ------------------------------------------------

  test("denseIds == naive global row_number, including under key skew") {
    // clumped keys: most mass lands in one fixed-width bucket
    val keys = (1L to 500L) ++ (100000L to 100050L) ++ Seq(999999999L)
    val df = keys.toDF("k")
    val got = Ids.denseIds(df, "k", buckets = 16)
      .select("k", "gid").as[(Long, Long)].collect().sortBy(_._1)
    val want = keys.sorted.zipWithIndex.map { case (k, i) => (k, i + 1L) }
    assert(got.toSeq == want)
  }

  test("denseIds: single-bucket degenerate range still yields dense 1..N") {
    val df = Seq(5L, 3L, 4L).toDF("k")
    val got = Ids.denseIds(df, "k", buckets = 32)
      .select("k", "gid").as[(Long, Long)].collect().sortBy(_._2)
    assert(got.toSeq == Seq((3L, 1L), (4L, 2L), (5L, 3L)))
  }

  test("denseIds: default bucket count (cluster-derived) matches the window oracle") {
    // buckets <= 0 derives max(64, defaultParallelism) — the documented
    // contract; pins the path no production caller exercises yet
    val keys = (1L to 300L).map(k => k * 7 % 311)
    val df = keys.distinct.toDF("k")
    val got = Ids.denseIds(df, "k")
      .select("k", "gid").as[(Long, Long)].collect().sortBy(_._1)
    val want = keys.distinct.sorted.zipWithIndex.map { case (k, i) => (k, i + 1L) }
    assert(got.toSeq == want)
  }

  test("denseIds: re-materialization is deterministic without a checkpoint pin") {
    // the bucket id is a pure function of the key (literal cut points),
    // so two independent actions over the same plan agree — the property
    // the old RangePartitioner bucketing (RDD-id-seeded sampler) lacked
    val df = (1L to 2000L).map(k => (k * 2654435761L) % 99991L).distinct.toDF("k")
    val ids = Ids.denseIds(df, "k", buckets = 16)
    val first = ids.select("k", "gid").as[(Long, Long)].collect().sortBy(_._1)
    val second = ids.select("k", "gid").as[(Long, Long)].collect().sortBy(_._1)
    assert(first.toSeq == second.toSeq)
    // and no lineage truncation: the logical plan carries no checkpoint
    assert(!ids.queryExecution.analyzed.toString.contains("LogicalRDD"),
      "plan contains a materialized RDD scan — checkpoint crept back in")
  }

  // --- triangles -------------------------------------------------------

  test("triangleStats: K4 gives every node 3 triangles and coeff 1; a path gives 0") {
    // K4 on {1,2,3,4} plus a pendant path 4-5-6
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("id1", "id2")
    val m = Components.triangleStats(edges, "id1", "id2")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    for (v <- 1L to 3L) assert(m(v) == ((3L, 3L, 1.0)), s"node $v: ${m(v)}")
    assert(m(4L) == ((4L, 3L, 0.5))) // deg 4, 3 tris, 2*3/(4*3)
    assert(m(5L) == ((2L, 0L, 0.0)))
    assert(m(6L) == ((1L, 0L, 0.0)))
  }

  test("triangleStats counts each triangle once regardless of edge order given") {
    // same triangle presented with reversed pairs — canonicalization dedups
    val edges = Seq((2L, 1L), (3L, 1L), (3L, 2L)).toDF("id1", "id2")
    val out = Components.triangleStats(
      edges.select(least(col("id1"), col("id2")).as("id1"),
        greatest(col("id1"), col("id2")).as("id2")), "id1", "id2")
      .collect().map(r => r.getLong(2)).toSeq
    assert(out == Seq(1L, 1L, 1L))
  }

  // --- covariance ------------------------------------------------------

  test("dimCovariance matches direct computation and is symmetric-complete") {
    val vecs = Seq(
      (1L, Array(1.0, 2.0, 3.0)),
      (2L, Array(2.0, 4.0, 1.0)),
      (3L, Array(3.0, 6.0, 2.0)),
      (4L, Array(4.0, 8.0, 5.0))).toDF("id", "vec")
    val got = Similarity.dimCovariance(vecs, dims = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.size == 6)
    // dim2 = 2*dim1 exactly: cov(1,2) = 2*var(1); population variance
    // of {1,2,3,4} = 1.25
    assert(math.abs(got((1, 1)) - 1.25) < 1e-5)
    assert(math.abs(got((1, 2)) - 2.5) < 1e-5)
    assert(math.abs(got((2, 2)) - 5.0) < 1e-5)
    // hand: cov(1,3) = E[xy]-E[x]E[y] = (3+2+6+20)/4 - 2.5*2.75
    assert(math.abs(got((1, 3)) - (31.0 / 4 - 2.5 * 2.75)) < 1e-5)
  }

  // --- winnow pairs ----------------------------------------------------

  test("winnowPairs surfaces pairs with long shared runs, skips disjoint docs") {
    val run = (0 until 30).map(i => s"s$i").mkString(" ")
    val df = Seq(
      (1L, s"intro $run outro"),
      (2L, s"$run completely different tail here"),
      (3L, "nothing in common with anything at all zz yy xx ww vv uu tt")
    ).toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowPairs(df, "doc_id", "text", k = 4, w = 5,
      minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  // --- PCA -------------------------------------------------------------

  test("pcaComponent recovers a planted dominant direction, sign-fixed positive") {
    // all variance lies along (1,2,0): component must converge there
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map { i =>
      val s = rnd.nextDouble() * 4 - 2
      val noise = rnd.nextDouble() * 0.01
      (i.toLong, Array(s * 1.0, s * 2.0, noise))
    }
    val v = Similarity.pcaComponent(rows.toDF("id", "vec"), dims = 3, iters = 10)
    val t = math.sqrt(5.0)
    assert(math.abs(v(0) - 1 / t) < 0.01 && math.abs(v(1) - 2 / t) < 0.01)
    assert(math.abs(v(2)) < 0.05)
    assert(v(0) > 0) // sign convention
    // unit norm
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
  }

  test("pcaProject: projections of the planted data match s * |(1,2)| direction") {
    val rows = Seq((1L, Array(1.0, 2.0, 0.0)), (2L, Array(-1.0, -2.0, 0.0)),
      (3L, Array(2.0, 4.0, 0.0)), (4L, Array(0.0, 0.0, 0.0)))
    val got = Similarity.pcaProject(rows.toDF("id", "vec"), dims = 3, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val t = math.sqrt(5.0)
    assert(math.abs(got(1L) - t) < 1e-4)     // (1,2)·(1,2)/√5 = √5
    assert(math.abs(got(2L) + t) < 1e-4)
    assert(math.abs(got(3L) - 2 * t) < 1e-4)
    assert(got(4L) == 0.0)
  }

  // --- curriculum ------------------------------------------------------

  test("curriculum: phases follow quality thresholds; packing respects the lane budget") {
    // high-quality docs: long + diverse; low-quality: tiny repetitive
    val good = (1 to 4).map(i =>
      (i.toLong, "src0", (0 until 120).map(j => s"the w${i}_$j of to in is").mkString(" ")))
    val bad = (10 to 12).map(i => (i.toLong, "src0", "x x x x"))
    val out = Pipelines.curriculum((good ++ bad).toDF("doc_id", "source", "text"),
      "doc_id", "text", "source", ctx = 256)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(4), r.getLong(5))).toMap
    // bad docs land in a LATER phase than good docs
    val goodPhase = out(1L)._1; val badPhase = out(10L)._1
    assert(goodPhase < badPhase, s"good=$goodPhase bad=$badPhase")
    // within the good lane (720 tokens each... doc tokens = 120*6), the
    // running 256-budget advances seq_id monotonically with doc_id
    val seqs = (1 to 4).map(i => out(i.toLong)._2)
    assert(seqs == seqs.sorted)
    assert(seqs.distinct.size > 1, "multiple sequences expected")
  }

  // --- skew report -----------------------------------------------------

  test("skew report math: share and max/avg factor on a crafted skew") {
    val df = (Seq.fill(6)(1) ++ Seq.fill(2)(2) ++ Seq.fill(2)(3) ++ Seq(4, 5))
      .toDF("l_suppkey") // hmm: query is bound to lineitem; test the math inline
    val counts = df.groupBy("l_suppkey").agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"), max(col("cnt")).as("max_cnt"))
    val top = counts.crossJoin(broadcast(stats))
      .select(col("l_suppkey"), col("cnt"),
        round(col("cnt").cast("double") / col("n_rows"), 6).as("share"),
        round(col("max_cnt").cast("double") * col("n_keys") / col("n_rows"), 6)
          .as("skew_factor"))
      .orderBy(col("cnt").desc, col("l_suppkey")).limit(2)
      .collect()
    assert(top(0).getInt(0) == 1 && top(0).getLong(1) == 6L)
    assert(top(0).getDouble(2) == 0.5)        // 6 of 12 rows
    assert(top(0).getDouble(3) == 2.5)        // max 6 / avg 2.4
  }

  // --- rank metrics ----------------------------------------------------

  test("rankMetrics boundary cases: all-relevant ndcg=1, none-relevant 0, first-hit mrr") {
    // query 1: candidates all share its label -> mrr=1, ndcg=1
    // query 2: no candidate shares      -> mrr=0, ndcg=0, n_rel=0
    // query 3: first relevant at rank 2 -> mrr=0.5
    val ranked = Seq(
      (1L, 1, 11L), (1L, 2, 12L),
      (2L, 1, 11L), (2L, 2, 12L),
      (3L, 1, 14L), (3L, 2, 13L), (3L, 3, 11L)
    ).toDF("query_id", "rnk", "cand_id")
    val labels = Seq((1L, 1), (2L, 2), (3L, 1),
      (11L, 1), (12L, 1), (13L, 1), (14L, 3)).toDF("id", "label")
    val m = Similarity.rankMetrics(ranked, labels, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(m(1L) == ((2L, 1.0, 1.0)))
    assert(m(2L) == ((0L, 0.0, 0.0)))
    assert(m(3L)._1 == 2L && m(3L)._2 == 0.5)
    // q3: rel at ranks 2,3 -> dcg = w2 + w3, idcg = w1 + w2 -> ndcg < 1
    val w = Similarity.dcgWeight _
    val expect = BigDecimal((w(2) + w(3)) / (w(1) + w(2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m(3L)._3 == expect)
  }

  // --- prototypicality triage -----------------------------------------

  test("protoPrune: farthest-from-centroid tail is outlier, closest is redundant, ties break by id") {
    // label 0, n=5, tailFrac=0.2 -> tail=1 each side. Centroid leans
    // toward [1,0]; the antipodal vector is the unique outlier; the
    // three identical [1,0] rows tie on cosine, so the LARGEST id among
    // them takes the single redundant slot (rank ties break by id).
    val vs = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(1f, 0f), 0), (3L, Array(1f, 0f), 0),
      (4L, Array(0.9f, 0.1f), 0), (5L, Array(-1f, 0f), 0)
    ).toDF("id", "vec", "label")
    val out = Similarity.protoPrune(vs, dims = 2, tailFrac = 0.2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(5L) == "outlier")
    assert(out(3L) == "redundant")
    assert(out(1L) == "keep" && out(2L) == "keep" && out(4L) == "keep")
  }

  // --- entity resolution ----------------------------------------------

  test("entityRes: merges within a block, never across blocks, canonical = min id") {
    // 1 & 2: same block, 1-char name edit, close balance -> one entity.
    // 3: IDENTICAL name/balance to 1 but different block -> never paired
    //    (blocking is a hard gate). 4: same block as 1 but name too far.
    val recs = Seq(
      (1L, "Customer#000000001", 7, "AUTO", 100.0),
      (2L, "Customer#000000002", 7, "AUTO", 150.0),
      (3L, "Customer#000000001", 8, "AUTO", 100.0),
      (4L, "Customer#000000999", 7, "AUTO", 100.0)
    ).toDF("id", "name", "nation", "segment", "bal")
    val out = graft.operators.EntityRes.resolve(recs, "id",
        Seq("nation", "segment"), "name", "bal",
        nameDenom = 9.0, numScale = 1000.0, nameWeight = 0.7,
        threshold = 0.8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getInt(2), r.getLong(3))).toMap
    assert(out(1L) == ((1L, 1, 2L)))  // canonical of the {1,2} entity
    assert(out(2L) == ((1L, 0, 2L)))  // merged into 1
    assert(out(3L) == ((3L, 1, 1L)))  // blocked away despite identical name
    assert(out(4L) == ((4L, 1, 1L)))  // name distance beyond threshold
  }
}
