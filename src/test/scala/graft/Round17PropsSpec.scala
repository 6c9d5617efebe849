package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Property laws for the round-17 contracts over ARBITRARY small vector
  * corpora (random dims/sizes/seeds, gapped ids):
  *
  *   - the entry-rep index is a true mergeable aggregate: folding ANY
  *     partition of the corpus through `entryRepsMerge`, in any order
  *     and any number of slices, equals `entryReps` over the whole
  *     corpus key for key — the law that makes the at-rest index
  *     maintainable without ever re-scanning the standing corpus;
  *   - IVF decontamination with the probe dial wide open equals the
  *     exact path (cells PARTITION the eval set, so probing every cell
  *     scores every pair) for arbitrary centroid choices — including
  *     centroids that are not corpus members;
  *   - fewer probes only remove candidates: flags ⊆ exact flags with
  *     counts and best sims bounded.
  */
object Round17PropsSpec extends Properties("graft.round17") {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val corpusGen: Gen[(List[(Long, Array[Float])], Int, Int)] =
    for {
      n <- Gen.chooseNum(1, 40)
      dims <- Gen.chooseNum(2, 12)
      seed <- Gen.chooseNum(0, 10000)
      slices <- Gen.chooseNum(2, 4)
    } yield {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until n).map(i =>
        (i.toLong * 7 + (i % 3), Array.fill(dims)(rnd.nextGaussian().toFloat)))
        .toList
      (rows, slices, seed)
    }

  property("entryRepsMerge over any corpus partition equals the fresh derivation") =
    Prop.forAll(corpusGen) { case (rows, slices, seed) =>
      val df = rows.toDF("id", "vec")
      val parts = (0 until slices).map(j =>
        rows.zipWithIndex.filter(_._2 % slices == j).map(_._1))
      // fold slice by slice, exactly as an ingest loop maintains the index
      val nonEmpty = parts.filter(_.nonEmpty)
      val folded = nonEmpty.tail
        .foldLeft(Similarity.entryReps(nonEmpty.head.toDF("id", "vec"))) {
          (acc, batch) =>
            Similarity.entryRepsMerge(acc, batch.toDF("id", "vec"))
        }
      val got = folded.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = Similarity.entryReps(df).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      (got == want) :| s"seed=$seed slices=$slices got=$got want=$want"
    }

  private val deconGen: Gen[(List[(Long, Array[Float])], List[(Long, Array[Float])], List[(Long, Array[Float])], Double)] =
    for {
      nt <- Gen.chooseNum(1, 20)
      ne <- Gen.chooseNum(1, 8)
      k <- Gen.chooseNum(1, 4)
      dims <- Gen.chooseNum(2, 8)
      seed <- Gen.chooseNum(0, 10000)
      tau <- Gen.oneOf(0.0, 0.3, 0.7)
    } yield {
      val rnd = new scala.util.Random(seed)
      def vec(): Array[Float] =
        Array.fill(dims)(rnd.nextGaussian().toFloat + 0.01f)
      val train = (0 until nt).map(i => (i.toLong * 3, vec())).toList
      val eval = (0 until ne).map(j => (1000L + j * 7, vec())).toList
      // arbitrary centroids, not necessarily corpus members
      val cents = (0 until k).map(c => (2000L + c, vec())).toList
      (train, eval, cents, tau)
    }

  private def flags(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Double)] =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  property("IVF decontamination at nprobe = nlist equals the exact path") =
    Prop.forAll(deconGen) { case (train, eval, cents, tau) =>
      val exact = flags(Similarity.semanticDecontaminateExact(
        train.toDF("id", "vec"), eval.toDF("id", "vec"), tau))
      val full = flags(Similarity.semanticDecontaminateIvf(
        train.toDF("id", "vec"), eval.toDF("id", "vec"),
        cents.toDF("id", "vec"), tau, nprobe = cents.size))
      (full == exact) :| s"full=$full exact=$exact"
    }

  private val eventsGen: Gen[(List[(Long, Long, Long)], Int, Int)] =
    for {
      n <- Gen.chooseNum(1, 120)
      keys <- Gen.chooseNum(1, 6)
      seed <- Gen.chooseNum(0, 10000)
      c1 <- Gen.chooseNum(20, 50) // split percentiles of the ts span
      c2 <- Gen.chooseNum(55, 90)
    } yield {
      val rnd = new scala.util.Random(seed)
      // ts spread over ~5 gap-lengths so sessions split and fuse across
      // the cuts; duplicate timestamps allowed on purpose
      val rows = (0 until n).map(i =>
        (rnd.nextInt(keys).toLong, rnd.nextInt(3000000).toLong.max(0L),
          i.toLong)).toList
      (rows, c1, c2)
    }

  property("sessionsFold over any event-time split equals the full snapshot") =
    Prop.forAll(eventsGen) { case (rows, c1, c2) =>
      import graft.operators.Sessionize
      def df(xs: List[(Long, Long, Long)]) = xs.toDF("user_id", "tsMs", "event_id")
        .select(col("user_id"), timestamp_millis(col("tsMs")).as("ts"),
          col("event_id"))
      val (mn, mx) = (rows.map(_._2).min, rows.map(_._2).max)
      val t1 = mn + (mx - mn) * c1 / 100
      val t2 = mn + (mx - mn) * c2 / 100
      // non-empty day slices in event-time order (empty days skipped —
      // the fold contract requires a non-empty batch)
      val slices = Seq(
        rows.filter(_._2 <= t1),
        rows.filter(r => r._2 > t1 && r._2 <= t2),
        rows.filter(_._2 > t2)).filter(_.nonEmpty)
      val folded = slices.tail.foldLeft(
        Sessionize.sessionsSnapshot(df(slices.head), "user_id", "ts",
          "event_id", 10)) { (snap, day) =>
        Sessionize.sessionsFold(snap, df(day), "user_id", "ts", "event_id", 10)
      }
      def canon(d: org.apache.spark.sql.DataFrame) =
        d.select("user_id", "start_ms", "end_ms", "n_events", "open")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getInt(4))).sorted.toSeq
      val got = canon(folded)
      val want = canon(Sessionize.sessionsSnapshot(df(rows), "user_id", "ts",
        "event_id", 10))
      (got == want) :| s"got=$got\nwant=$want"
    }

  property("fewer probes only remove candidates (flags/counts/sims bounded)") =
    Prop.forAll(deconGen) { case (train, eval, cents, tau) =>
      val exact = flags(Similarity.semanticDecontaminateExact(
        train.toDF("id", "vec"), eval.toDF("id", "vec"), tau))
      val one = flags(Similarity.semanticDecontaminateIvf(
        train.toDF("id", "vec"), eval.toDF("id", "vec"),
        cents.toDF("id", "vec"), tau, nprobe = 1))
      one.forall { case (id, (n, s)) =>
        exact.get(id).exists { case (ne, se) => n <= ne && s <= se }
      } :| s"one=$one exceeds exact=$exact"
    }
}
