package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Property laws for the round-6 operators. Batched like PropertiesSpec:
  * each property evaluates a whole generated dataset per trial.
  */
object Round6PropsSpec extends Properties("graft.round6") {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val word: Gen[String] = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
  private val doc: Gen[String] =
    Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val corpus: Gen[List[(Long, String)]] =
    Gen.chooseNum(4, 16).flatMap(n => Gen.listOfN(n, doc))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  property("tokenDrift: JS(X, X) == 0 and JS is symmetric") =
    Prop.forAll(corpus, corpus) { (as, bs) =>
      (as.nonEmpty && bs.nonEmpty) ==> {
        val a = as.toDF("doc_id", "text")
        val b = bs.toDF("doc_id", "text")
        val self = TextAnalysis.tokenDrift(a, a, "text")
          .select("js_divergence").as[Double].head()
        val ab = TextAnalysis.tokenDrift(a, b, "text")
          .select("js_divergence").as[Double].head()
        val ba = TextAnalysis.tokenDrift(b, a, "text")
          .select("js_divergence").as[Double].head()
        self == 0.0 && ab == ba && ab >= 0.0
      }
    }

  private val vec: Gen[Seq[Float]] =
    Gen.listOfN(8, Gen.chooseNum(-1000, 1000).map(_ / 500.0f)).map(_.toSeq)

  property("standardizeDims: per-dim mean ~ 0 and std ~ 1 after scaling") =
    Prop.forAll(Gen.chooseNum(5, 20).flatMap(n => Gen.listOfN(n, vec))) { vs =>
      // degenerate (constant) dims standardize to 0, so require spread
      val spread = (0 until 8).forall(i => vs.map(_(i)).distinct.size > 1)
      spread ==> {
        val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("id", "vec")
        val z = Similarity.standardizeDims(df).select("z")
          .as[Seq[Double]].collect()
        val n = z.length.toDouble
        (0 until 8).forall { i =>
          val col = z.map(_(i))
          val mu = col.sum / n
          val sd = math.sqrt(col.map(x => (x - mu) * (x - mu)).sum / n)
          math.abs(mu) < 1e-4 && math.abs(sd - 1.0) < 1e-3
        }
      }
    }

  property("incremental pairs == full-corpus pairs restricted to the split") =
    Prop.forAll(corpus) { docs =>
      (docs.size >= 6) ==> {
        val df = docs.toDF("doc_id", "text")
        val old = df.filter(col("doc_id") % 2 === 0)
        val nw = df.filter(col("doc_id") % 2 =!= 0)
        val inc = Dedup.minhashIncrementalPairs(old, nw, "doc_id", "text",
            jaccardThreshold = 0.4)
          .select("new_id", "old_id").as[(Long, Long)].collect().toSet
        val full = Dedup.minhashLsh(df, "doc_id", "text",
            jaccardThreshold = 0.4)
          .select("id1", "id2").as[(Long, Long)].collect()
          .flatMap { case (a, b) =>
            if (a % 2 != 0 && b % 2 == 0) Some((a, b))
            else if (b % 2 != 0 && a % 2 == 0) Some((b, a))
            else None
          }.toSet
        inc == full
      }
    }
}
