package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Ids

/** Property laws for the round-9 rank machinery, against plain-Scala
  * references on arbitrary generated inputs:
  *  - `Ids.globalRank` equals sorted-position row_number for ANY value
  *    multiset (duplicates included), direction, and bucket count —
  *    including buckets > n and all-values-equal degenerate frames;
  *  - `Ids.ntileFromRank` satisfies ntile's defining law directly (at
  *    most two bucket sizes differing by one, larger buckets first,
  *    monotone in rank) rather than round-tripping through Spark's
  *    ntile, so the arithmetic is pinned to the SPEC, not to another
  *    implementation.
  */
object Round9PropsSpec extends Properties("graft.round9") {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val frameGen: Gen[(List[Int], Boolean, Int)] = for {
    n <- Gen.chooseNum(1, 120)
    vs <- Gen.listOfN(n, Gen.chooseNum(-5, 5)) // dense ties by design
    asc <- Gen.oneOf(true, false)
    buckets <- Gen.chooseNum(2, 20)
  } yield (vs, asc, buckets)

  property("globalRank == sorted position for any multiset / direction / buckets") =
    Prop.forAll(frameGen) { case (vs, asc, buckets) =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toDouble) }
        .toDF("uid", "v")
      val got = Ids.globalRank(df, col("v"), asc, col("uid"), buckets)
        .select("uid", "__rank").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ref = vs.zipWithIndex
        .map { case (v, i) => (v.toDouble, i.toLong) }
        .sortBy { case (v, uid) => (if (asc) v else -v, uid) }
        .zipWithIndex.map { case ((_, uid), pos) => uid -> (pos + 1L) }
        .toMap
      (got == ref) :| s"got $got expected $ref"
    }

  private val ntileGen: Gen[(Int, Int)] = for {
    n <- Gen.chooseNum(1, 500)
    k <- Gen.chooseNum(1, 50)
  } yield (n, k)

  property("ntileFromRank: sizes differ by <=1, larger first, buckets 1..min(n,k), monotone") =
    Prop.forAll(ntileGen) { case (n, k) =>
      val buckets = spark.range(1, n + 1)
        .select(Ids.ntileFromRank(col("id"), lit(n.toLong), k).as("b"))
        .collect().map(_.getInt(0))
      val sizes = buckets.groupBy(identity).toSeq.sortBy(_._1)
        .map { case (b, rows) => (b, rows.length) }
      val distinctSizes = sizes.map(_._2).distinct
      val monotone = buckets.sameElements(buckets.sorted)
      val contiguous = sizes.map(_._1) == (1 to math.min(n, k)).toSeq
      val atMostTwo = distinctSizes.size <= 2 &&
        (distinctSizes.size < 2 || math.abs(distinctSizes(0) - distinctSizes(1)) == 1)
      val largerFirst = sizes.map(_._2) == sizes.map(_._2).sortBy(-_)
      (monotone :| "bucket must be monotone in rank") &&
        (contiguous :| s"buckets must be 1..min(n,k): $sizes") &&
        (atMostTwo :| s"sizes must differ by <=1: $sizes") &&
        (largerFirst :| s"larger buckets must come first: $sizes")
    }
}
