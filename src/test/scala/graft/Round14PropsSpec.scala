package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Property laws for the round-14 graph tier over ARBITRARY small
  * vector sets (random dims, degenerate sizes down to 1 vector, ids
  * with gaps):
  *
  *   - nnDescentGraph: at most k neighbours per vertex, no self-edges,
  *     every edge's sim equals the independently-computed rounded
  *     cosine, and every endpoint is a corpus id;
  *   - knnGraphExtend: every batch vertex gets a list, old→old edges
  *     are a subset of the day-1 graph (old lists change only by a
  *     newcomer entering), and edge sims stay consistent.
  */
object Round14PropsSpec extends Properties("graft.round14") {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val corpusGen: Gen[List[(Long, Array[Float])]] = for {
    n <- Gen.chooseNum(1, 40)
    dims <- Gen.chooseNum(2, 8)
    seed <- Gen.chooseNum(0, 10000)
  } yield {
    val rnd = new scala.util.Random(seed)
    // ids with gaps (×3) — the stripe init must not assume density
    (0 until n).map { i =>
      (i.toLong * 3, Array.fill(dims)((rnd.nextGaussian().toFloat max -4f)
        .min(4f) + 0.01f * i))
    }.toList
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

  property("nnDescentGraph invariants") = Prop.forAll(corpusGen) { rows =>
    val byId = rows.toMap
    val df = rows.toDF("id", "vec")
    val g = Similarity.nnDescentGraph(df, k = 3, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val perQuery = g.groupBy(_._1)
    val degOk = perQuery.forall(_._2.length <= 3)
    val noSelf = g.forall { case (q, c, _) => q != c }
    val idsOk = g.forall { case (q, c, _) => byId.contains(q) && byId.contains(c) }
    val simOk = g.forall { case (q, c, s) =>
      math.abs(s - cosRound(byId(q), byId(c))) < 1e-9 }
    (degOk :| "at most k per vertex") &&
      (noSelf :| "no self edges") &&
      (idsOk :| "endpoints are corpus ids") &&
      (simOk :| "sims are rounded cosines")
  }

  property("knnGraphExtend invariants") = Prop.forAll(corpusGen) { rows =>
    (rows.length >= 4) ==> {
      val byId = rows.toMap
      val df = rows.toDF("id", "vec")
      val old = df.filter(col("id") % 2 === 0)
      val batch = df.filter(col("id") % 2 =!= 0)
      val day1 = Similarity.nnDescentGraph(old, k = 3, iters = 1)
      val day1Edges = day1.select("query_id", "cand_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ext = Similarity.knnGraphExtend(day1, old, batch,
          k = 3, beam = 3, hops = 1, entries = 2)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      val batchIds = rows.map(_._1).filter(_ % 2 != 0).toSet
      val covered = batchIds.forall(b => ext.exists(_._1 == b))
      val oldOldSubset = ext.forall { case (q, c, _) =>
        q % 2 != 0 || c % 2 != 0 || day1Edges((q, c)) }
      val simOk = ext.forall { case (q, c, s) =>
        math.abs(s - cosRound(byId(q), byId(c))) < 1e-9 }
      (covered :| "every batch vertex gets a list") &&
        (oldOldSubset :| "old->old edges come from day 1") &&
        (simOk :| "sims are rounded cosines")
    }
  }

  // each case drives several multi-job Spark operators — bound the count
  // like the other heavy property suites
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5)
}
