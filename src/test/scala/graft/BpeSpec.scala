package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import graft.operators.TextAnalysis

/** bpeLearn (distributed pair-count argmax + fold merge) against the
  * literal sequential BPE trainer it must reproduce: same merge table,
  * same per-word subword counts, under random corpora.
  */
object BpeSpec extends Properties("graft.bpe") {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  /** Reference trainer: textbook get_stats / merge loop. Pair counts
    * include overlapping occurrences; ties break (count desc, a asc,
    * b asc); merges apply greedily left-to-right non-overlapping.
    */
  private def naiveBpe(words: Map[String, Long], nMerges: Int)
      : (Seq[(String, String, Long)], Map[String, Int]) = {
    var syms: Map[String, (Long, Vector[String])] =
      words.map { case (w, f) => w -> (f, w.map(_.toString).toVector) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    for (_ <- 1 to nMerges if !done) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((_, (f, ss)) <- syms; i <- 0 until ss.length - 1)
        pc((ss(i), ss(i + 1))) = pc.getOrElse((ss(i), ss(i + 1)), 0L) + f
      if (pc.isEmpty) done = true
      else {
        val ((a, b), cnt) =
          pc.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        merges += ((a, b, cnt))
        syms = syms.map { case (w, (f, ss)) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < ss.length) {
            if (i + 1 < ss.length && ss(i) == a && ss(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += ss(i); i += 1 }
          }
          w -> (f, out.result())
        }
      }
    }
    (merges.toSeq, syms.map { case (w, (_, ss)) => w -> ss.length })
  }

  private val word: Gen[String] = for {
    n <- Gen.choose(1, 7)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd'))
  } yield cs.mkString

  private val corpus: Gen[List[String]] =
    Gen.choose(3, 25).flatMap(n => Gen.listOfN(n, word))

  property("distributed trainer == sequential trainer (merges and counts)") =
    Prop.forAll(corpus) { docs =>
      val df = docs.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("id", "text")
      val (gotMerges, trained) = TextAnalysis.bpeLearn(df, "text", nMerges = 5)
      val gotCounts = trained.collect()
        .map(r => r.getString(0) -> r.getLong(2).toInt).toMap
      // the reference trains on whitespace pre-token frequencies; here
      // each doc is one word, matching preTokens on single-word text
      val freq = docs.filter(_.nonEmpty).groupBy(identity)
        .map { case (w, ws) => w -> ws.size.toLong }
      val (wantMerges, wantCounts) = naiveBpe(freq, 5)
      val mergesOk = gotMerges == wantMerges
      val countsOk = gotCounts == wantCounts
      (mergesOk :| s"merges: got=$gotMerges want=$wantMerges") &&
        (countsOk :| s"counts: got=$gotCounts want=$wantCounts")
    }
}
