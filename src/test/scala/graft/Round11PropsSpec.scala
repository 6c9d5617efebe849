package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Property law for the fused SimHash expression: for ARBITRARY strings
  * (mixed-alphabet tokens, runs of spaces, leading/trailing spaces,
  * empty strings, non-BMP codepoints) and arbitrary bit widths,
  * `Dedup.simhashText` equals a plain-Scala reference of the documented
  * semantics — split on every single space with trailing empties kept
  * (Java `split(" ", -1)`), polyhash each token over CODEPOINTS
  * (seed 7, acc*31+cp mod 1e9+7), ±1 tally per bit, bit set when the
  * tally is positive. Pinning to an independent in-process reference
  * (not the HOF twin) means the law holds even if both Spark
  * formulations shared a bug.
  */
object Round11PropsSpec extends Properties("graft.round11") {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val tokenChar: Gen[String] = Gen.frequency(
    6 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf("é", "ß", "中", "ю", "ω").map(_.toString),
    1 -> Gen.const("😀"), // non-BMP emoji (surrogate pair)
    1 -> Gen.const(" "))            // extra spaces INSIDE the string
  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 40)
    cs <- Gen.listOfN(n, tokenChar)
  } yield cs.mkString

  private def refSimhash(s: String, bits: Int): Long = {
    val tallies = new Array[Int](bits)
    s.split(" ", -1).foreach { tok =>
      var h = 7L
      var i = 0
      while (i < tok.length) {
        val cp = tok.codePointAt(i)
        h = (h * 31L + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      var k = 0
      while (k < bits) {
        if (((h >> k) & 1L) == 1L) tallies(k) += 1 else tallies(k) -= 1
        k += 1
      }
    }
    (0 until bits).foldLeft(0L)((acc, k) =>
      if (tallies(k) > 0) acc | (1L << k) else acc)
  }

  property("simhashText == independent reference for arbitrary text and bits") =
    Prop.forAll(Gen.listOfN(12, textGen), Gen.oneOf(1, 7, 24, 30, 63)) {
      (texts, bits) =>
        val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("id", "text")
          .select(col("id"), Dedup.simhashText(col("text"), bits).as("s"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = texts.zipWithIndex
          .map { case (t, i) => i.toLong -> refSimhash(t, bits) }.toMap
        (got == want) :| s"got=$got want=$want bits=$bits"
    }
}
