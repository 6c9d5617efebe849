package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Round-5 operators: sequence packing, mixture sampling, shared-passage
  * removal, semantic dedup.
  */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------------------------- packing

  private val packCorpus = Seq(
    // source A: 3 docs of 100 tokens each; ctx=128
    ("A", 1L, Seq.fill(100)("w").mkString(" ")),
    ("A", 2L, Seq.fill(100)("w").mkString(" ")),
    ("A", 3L, Seq.fill(100)("w").mkString(" ")),
    // source B: one long doc spanning several bins
    ("B", 4L, Seq.fill(300)("w").mkString(" "))
  ).toDF("source", "doc_id", "text")

  test("packSequences: bins advance by cumulative token count, per shard") {
    val got = TextAnalysis.packSequences(packCorpus, "doc_id", "text", "source", ctx = 128)
      .select($"doc_id", $"n_tokens", $"bin", $"bin_off")
      .as[(Long, Long, Long, Int)].collect().sortBy(_._1)
    // A: offsets 0, 100, 200 -> bins 0, 0, 1; offsets within bin 0, 100, 72
    assert(got(0) == ((1L, 100L, 0L, 0)))
    assert(got(1) == ((2L, 100L, 0L, 100)))
    assert(got(2) == ((3L, 100L, 1L, 72)))
    // B restarts at offset 0 in its own shard
    assert(got(3) == ((4L, 300L, 0L, 0)))
  }

  test("packSequences: bin_off is always inside the context window") {
    val got = TextAnalysis.packSequences(packCorpus, "doc_id", "text", "source", ctx = 64)
    assert(got.filter($"bin_off" < 0 || $"bin_off" >= 64).count() == 0)
  }

  // -------------------------------------------------------------- mixture

  test("mixtureSample: smallest stratum kept whole, larger flattened toward sqrt") {
    // 'small' has 40 docs, 'big' has 360 -> p_big = sqrt(40/360) = 1/3
    val docs = ((1 to 40).map(i => (i.toLong, "small")) ++
      (41 to 400).map(i => (i.toLong, "big"))).toDF("doc_id", "stratum")
    val kept = TextAnalysis.mixtureSample(docs, "doc_id", "stratum")
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(kept("small") == 40) // permille 1000: the whole stratum survives
    // affine-mixed hash gate at permille 333: expected ~120 of 360
    assert(kept("big") > 80 && kept("big") < 170,
      s"big stratum kept ${kept("big")}, expected ~120")
  }

  test("mixtureSample is idempotent on its own output's strata rates only " +
    "when rates are recomputed — a kept row's hash gate is stable") {
    val docs = (1 to 100).map(i => (i.toLong, if (i <= 20) "s" else "b"))
      .toDF("doc_id", "stratum")
    val once = TextAnalysis.mixtureSample(docs, "doc_id", "stratum")
    // the same (key, permille) gate re-applied keeps exactly the same rows
    val twiceSame = once.join(
      TextAnalysis.mixtureSample(docs, "doc_id", "stratum"), Seq("doc_id", "stratum"))
    assert(once.count() == twiceSame.count())
  }

  // ------------------------------------------------------ shared passages

  private val shared32 = (1 to 32).map(i => s"boiler$i").mkString(" ")

  test("stripSharedPassages removes cross-doc chunks and reassembles in order") {
    val uniqueA = (1 to 32).map(i => s"a$i").mkString(" ")
    val uniqueB = (1 to 32).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$uniqueA $shared32"),      // unique chunk then boilerplate
      (2L, s"$shared32 $uniqueB"),      // boilerplate then unique chunk
      (3L, uniqueB)                     // appears once per doc -> chunk is
    ).toDF("doc_id", "text")            //   shared across docs 2 and 3
    val got = Dedup.stripSharedPassages(docs, "doc_id", "text", window = 32)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, uniqueA, 1L)))
    assert(got(1) == ((2L, "", 2L))) // both its chunks were shared
    assert(got(2) == ((3L, "", 1L)))
  }

  test("stripSharedPassages keeps a corpus with no shared passages intact") {
    val docs = Seq(
      (1L, (1 to 40).map(i => s"x$i").mkString(" ")),
      (2L, (1 to 40).map(i => s"y$i").mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.stripSharedPassages(docs, "doc_id", "text", window = 32)
    assert(got.filter($"n_removed" > 0).count() == 0)
    // reassembly is the identity when nothing is removed
    val joined = got.join(docs, "doc_id")
      .filter($"clean_text" =!= $"text")
    assert(joined.count() == 0)
  }

  // ------------------------------------------------------- inverted index

  test("invertedIndex: postings sorted, df counts distinct docs, cf total") {
    val docs = Seq(
      (3L, "b a b"),
      (1L, "a c"),
      (2L, "a")).toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndex(docs, "doc_id", "text")
      .as[(String, Long, Long, String)].collect().sortBy(_._1)
    assert(got(0) == (("a", 3L, 3L, "1,2,3")))
    assert(got(1) == (("b", 1L, 2L, "3"))) // cf counts the repeat, df doesn't
    assert(got(2) == (("c", 1L, 1L, "1")))
  }

  // ------------------------------------------------------ vocab coverage

  test("vocabCoverage: in-vocab fraction per doc, OOV docs score zero") {
    // vocab of size 2 -> {x (5 hits), y (3)}; z is out-of-vocab
    val docs = Seq(
      (1L, "x x y z"),   // 3 of 4 in vocab
      (2L, "x y y x x"), // all in vocab
      (3L, "z z")        // none
    ).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(docs, "doc_id", "text", vocabSize = 2)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 4L, 0.75)))
    assert(got(1) == ((2L, 5L, 1.0)))
    assert(got(2) == ((3L, 2L, 0.0)))
  }

  // ------------------------------------------- incremental agg refresh

  test("refreshAgg: chained incremental refreshes == one-shot aggregation") {
    import org.apache.spark.sql.DataFrame
    val rows = (1 to 300).map(i => (i.toLong % 7, i.toLong, (i % 13).toLong))
      .toDF("k", "id", "v")
    def agg(df: DataFrame) = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"v").as("sum_v"))
    // three micro-batches folded one at a time
    val b = Seq(rows.filter($"id" % 3 === 0), rows.filter($"id" % 3 === 1),
      rows.filter($"id" % 3 === 2)).map(agg)
    val incremental = b.reduce(
      operators.Merge.refreshAgg(_, _, Seq("k"), Seq("n", "sum_v")))
    val oneShot = agg(rows)
    assert(incremental.orderBy("k").as[(Long, Long, Long)].collect().toSeq ==
      oneShot.orderBy("k").as[(Long, Long, Long)].collect().toSeq)
  }

  // ------------------------------------------------- Misra-Gries sketch

  test("frequent-items sketch: heavy hitters survive, undercount bounded") {
    val k = 10
    // 3 heavy tokens (600/300/150 of n=1550) + 500 singletons
    val stream = Seq.fill(600)("hot1") ++ Seq.fill(300)("hot2") ++
      Seq.fill(150)("hot3") ++ (1 to 500).map(i => s"tail$i")
    val n = stream.length
    val df = scala.util.Random.shuffle(stream).map(t => Tuple1(t)).toDF("text")
      .repartition(8) // force partial sketches + merge
    val got = TextAnalysis.heavyHitterTokens(df, "text", k)
      .as[(Int, String, Long)].collect()
    val est = got.map(r => r._2 -> r._3).toMap
    val bound = n / (k + 1)
    // survivor guarantee: freq > n/(k+1) => present
    Seq("hot1" -> 600, "hot2" -> 300, "hot3" -> 150).foreach { case (t, f) =>
      assert(f <= bound || est.contains(t), s"$t (freq $f) missing from $est")
      // undercount bound (error adds across the merge tree; 2x slack)
      est.get(t).foreach(e =>
        assert(e <= f && e >= f - 2 * bound, s"$t est $e vs true $f"))
    }
    assert(got.length <= k)
  }

  test("frequent-items sketch merges partials without losing dominant items") {
    // dominant item spread across many partitions, tail items local to each
    val rows = (1 to 2000).map(i =>
      if (i % 2 == 0) "dom" else s"t${i % 97}")
    val got = TextAnalysis.heavyHitterTokens(
      rows.map(Tuple1(_)).toDF("text").repartition(16), "text", 5)
      .as[(Int, String, Long)].collect()
    assert(got.head._2 == "dom", s"dominant item not first: ${got.toSeq}")
  }

  // -------------------------------------------------- unigram LM scoring

  test("unigramLogProb: repeated-token docs score higher than rare-token docs") {
    val docs = Seq(
      (1L, "a a a a"),       // all tokens common -> high (less negative)
      (2L, "q r s t")        // all singletons -> low
    ).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got(0)._3 > got(1)._3)
    // doc 1: p(a) = 4/8 -> avg log = ln(0.5)
    assert(math.abs(got(0)._3 - math.log(0.5)) < 1e-5)
    // doc 2: each p = 1/8
    assert(math.abs(got(1)._3 - math.log(0.125)) < 1e-5)
  }

  // ------------------------------------------------------ C4 rule filter

  test("c4FilterFlags: each rule rejects its own pathology") {
    val good = (1 to 30).map(i => s"the w$i").mkString(" ") // 60 tokens, stopwords, varied
    val docs = Seq(
      (1L, good),
      (2L, "the short doc"),                              // r_len fails
      (3L, (1 to 30).map(_ => "supercalifragilistic").mkString(" ")), // r_mtl + r_rep fail
      (4L, (1 to 30).map(i => s"w$i x$i").mkString(" "))  // no stopword -> r_stop fails
    ).toDF("doc_id", "text")
    val got = TextAnalysis.c4FilterFlags(docs, "doc_id", "text")
      .as[(Long, Int, Int, Int, Int, Int)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 1, 1, 1, 1, 1)))
    assert(got(1)._2 == 0 && got(1)._6 == 0)              // too short
    assert(got(2)._3 == 0 && got(2)._5 == 0 && got(2)._6 == 0) // long tokens, repetitive
    assert(got(3)._4 == 0 && got(3)._6 == 0)              // no stopword
  }

  // -------------------------------------------------------- semantic dedup

  test("semanticDedup groups transitive near-identical vectors, min-id survivor") {
    def vec(x: Float, y: Float) = Array(x, y, 0f, 0f)
    val corpus = Seq(
      (10L, vec(1f, 0.00f)),   // A ~ B ~ C chain (cosine near 1)
      (11L, vec(1f, 0.01f)),
      (12L, vec(1f, 0.02f)),
      (20L, vec(0f, 1f))       // orthogonal singleton
    ).toDF("id", "vec")
    val comp = Similarity.semanticDedup(corpus, threshold = 0.9, bits = 4)
      .as[(Long, Long)].collect().toMap
    assert(comp(10L) == 10L && comp(11L) == 10L && comp(12L) == 10L)
    assert(comp(20L) == 20L)
    // survivors = ids that label their own component
    assert(comp.values.toSet == Set(10L, 20L))
  }

  test("semanticDedup: components partition the corpus (sizes sum to N)") {
    val corpus = (1 to 50).map { i =>
      (i.toLong, Array(math.cos(i / 8.0).toFloat, math.sin(i / 8.0).toFloat, 0f, 0f))
    }.toDF("id", "vec")
    val cc = Similarity.semanticDedup(corpus, threshold = 0.98, bits = 2)
    assert(cc.count() == 50)
    assert(cc.groupBy("comp").count().agg(sum("count")).as[Long].head() == 50L)
    // every component label is a member of its own component
    val labels = cc.select($"comp".as("lbl")).distinct()
    val selfLabeled = cc.filter($"id" === $"comp").select($"id".as("slbl"))
    assert(labels.join(selfLabeled, $"lbl" === $"slbl", "left_anti").count() == 0)
  }
}
