package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Property laws for semantic decontamination over ARBITRARY small
  * train/eval vector sets (random dims, sizes down to 1, gapped ids):
  *
  *   - the EXACT path equals an independently-computed in-Scala brute
  *     force (flags, match counts, best sim, deterministic best match)
  *     — an engine-independent truth, not engine-vs-engine;
  *   - the LSH prefilter only ever removes candidates: flags ⊆ exact
  *     flags, and per flagged id n_matches/best_sim never exceed the
  *     exact path's;
  *   - a verbatim eval copy of a train vector always flags that train
  *     id with best_sim 1 on BOTH paths (identical vectors share every
  *     ring bucket).
  */
object Round16PropsSpec extends Properties("graft.round16") {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private val setsGen: Gen[(List[(Long, Array[Float])], List[(Long, Array[Float])], Double)] =
    for {
      nt <- Gen.chooseNum(1, 25)
      ne <- Gen.chooseNum(1, 10)
      dims <- Gen.chooseNum(2, 8)
      seed <- Gen.chooseNum(0, 10000)
      tau <- Gen.oneOf(0.0, 0.3, 0.7, 0.95)
    } yield {
      val rnd = new scala.util.Random(seed)
      def vec(): Array[Float] =
        Array.fill(dims)(rnd.nextGaussian().toFloat + 0.01f)
      val train = (0 until nt).map(i => (i.toLong * 3, vec())).toList
      val eval = (0 until ne).map(j => (1000L + j * 7, vec())).toList
      (train, eval, tau)
    }

  private def cosRound(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def reference(train: List[(Long, Array[Float])],
                        eval: List[(Long, Array[Float])],
                        tau: Double): Map[Long, (Long, Double, Long)] =
    train.flatMap { case (tid, tv) =>
      val hits = eval.map { case (eid, ev) => (eid, cosRound(tv, ev)) }
        .filter(_._2 >= tau)
      if (hits.isEmpty) None
      else {
        val best = hits.minBy { case (eid, s) => (-s, eid) }
        Some(tid -> ((hits.size.toLong, best._2, best._1)))
      }
    }.toMap

  private def collectFlags(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Double, Long)] =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap

  // Codegen may sum the dot product in a different association order
  // than the in-Scala reference; a one-ulp delta can flip HALF_UP
  // rounding at a .5e-6 boundary (r16 advice). Flags and counts must
  // still agree exactly; best_sim gets a ±1e-6 tolerance, and a
  // best-match-id flip is accepted only when an actual rounding delta
  // explains it (bit-equal sims must tie-break identically).
  private def approxSame(got: Map[Long, (Long, Double, Long)],
                         want: Map[Long, (Long, Double, Long)]): Boolean =
    got.keySet == want.keySet && got.forall { case (id, (n, s, b)) =>
      val (nw, sw, bw) = want(id)
      n == nw && math.abs(s - sw) <= 1e-6 && (b == bw || s != sw)
    }

  property("exact path equals the in-Scala brute force") =
    Prop.forAll(setsGen) { case (train, eval, tau) =>
      val got = collectFlags(Similarity.semanticDecontaminateExact(
        train.toDF("id", "vec"), eval.toDF("id", "vec"), tau))
      val want = reference(train, eval, tau)
      approxSame(got, want) :| s"got $got\nwant $want"
    }

  property("LSH prefilter only removes candidates (flags/counts/sims bounded by exact)") =
    Prop.forAll(setsGen) { case (train, eval, tau) =>
      val lsh = collectFlags(Similarity.semanticDecontaminate(
        train.toDF("id", "vec"), eval.toDF("id", "vec"), tau,
        bits = 4, rings = 2))
      val exact = reference(train, eval, tau)
      lsh.forall { case (id, (n, s, _)) =>
        exact.get(id).exists { case (ne, se, _) => n <= ne && s <= se }
      } :| s"lsh $lsh exceeds exact $exact"
    }

  property("a verbatim eval copy always flags its train id with best_sim 1 on both paths") =
    Prop.forAll(setsGen) { case (train, eval, _) =>
      val (copyId, copyVec) = train.head
      val planted = (5000L, copyVec) :: eval
      def bestSim(df: org.apache.spark.sql.DataFrame): Option[Double] =
        collectFlags(df).get(copyId).map(_._2)
      val ex = bestSim(Similarity.semanticDecontaminateExact(
        train.toDF("id", "vec"), planted.toDF("id", "vec"), 0.999))
      val ls = bestSim(Similarity.semanticDecontaminate(
        train.toDF("id", "vec"), planted.toDF("id", "vec"), 0.999,
        bits = 4, rings = 2))
      (ex.contains(1.0) && ls.contains(1.0)) :| s"exact=$ex lsh=$ls"
    }
}
