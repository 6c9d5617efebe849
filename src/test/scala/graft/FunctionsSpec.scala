package graft

import org.apache.spark.sql.functions._
import graft.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("F1 parseBrDouble: BR format, empty, garbage, null") {
    val got = Seq("1.234,56", "0,5", "100", "", "abc", null)
      .toDF("s").select(parseBrDouble($"s")).as[Double].collect()
    assert(got.toSeq == Seq(1234.56, 0.5, 100.0, 0.0, 0.0, 0.0))
  }

  test("F1 parseBrDouble: full Double.parseDouble grammar after separator swap") {
    // the reference delegates to Double.parseDouble — leading-dot, sign,
    // exponent, whitespace and f/d suffix all parse (ADVICE round 1)
    val got = Seq(",5", "+1", "1e3", " 2,5 ", "7,", "1,5f", "-,25", "1e", "--1")
      .toDF("s").select(parseBrDouble($"s")).as[Double].collect()
    assert(got.toSeq == Seq(0.5, 1.0, 1000.0, 2.5, 7.0, 1.5, -0.25, 0.0, 0.0))
  }

  test("F2 parsePrefixDate: prefix, short, malformed, null") {
    val got = Seq("1995-03-01T10:00:00", "2001-12-31", "1995", "xxxx-yy-zz", null)
      .toDF("s").select(parsePrefixDate($"s").cast("string")).as[String].collect()
    assert(got.toSeq == Seq("1995-03-01", "2001-12-31", null, null, null))
  }

  test("F3 parseDateKey: yyyyMMdd int, 0 sentinel") {
    val got = Seq("1995-03-01T10:00:00", "", null, "bad")
      .toDF("s").select(parseDateKey($"s")).as[Int].collect()
    assert(got.toSeq == Seq(19950301, 0, 0, 0))
  }

  test("P3 naIfEmpty: empty, whitespace, null -> N/A; value passes") {
    val got = Seq("S", "", "   ", null)
      .toDF("s").select(naIfEmpty($"s")).as[String].collect()
    assert(got.toSeq == Seq("S", "N/A", "N/A", "N/A"))
  }

  test("F5 formatDecimalComma: 2dp, comma, no grouping") {
    val got = Seq(1234.5, 0.0, 99.999).toDF("x")
      .select(formatDecimalComma($"x")).as[String].collect()
    assert(got.toSeq == Seq("1234,50", "0,00", "100,00"))
  }

  test("F5 . F1 round-trip identity on 2dp doubles") {
    val xs = Seq(0.25, 1.5, 12345.67, 0.01)
    val got = xs.toDF("x").select(parseBrDouble(formatDecimalComma($"x")))
      .as[Double].collect()
    assert(got.toSeq == xs)
  }

  test("G1 pt-BR month and weekday names, quarter edges") {
    val got = Seq("2024-01-01", "2024-04-15", "2024-07-31", "2024-10-06", "2024-03-02")
      .toDF("s").select(to_date($"s").as("d"))
      .select(ptBrMonthName($"d"), ptBrWeekdayName($"d"), quarterLabel($"d"))
      .as[(String, String, String)].collect()
    assert(got(0) == (("janeiro", "segunda-feira", "T1")))
    assert(got(1) == (("abril", "segunda-feira", "T2")))
    assert(got(2) == (("julho", "quarta-feira", "T3")))
    assert(got(3) == (("outubro", "domingo", "T4")))
    assert(got(4) == (("março", "sábado", "T1")))
  }

  test("portableStringHash: deterministic, matches hand-rolled fold") {
    def ref(s: String): Long =
      s.foldLeft(7L)((acc, ch) => ((acc * 31 + ch.toInt) % HashPrime + HashPrime) % HashPrime)
    val words = Seq("spark", "join", "the", "a")
    val got = words.toDF("w").select(portableStringHash($"w")).as[Long].collect()
    assert(got.toSeq == words.map(ref))
  }

  test("native portable hash == HOF twin, including non-BMP codepoints") {
    // ascii/latin/CJK/astral (surrogate pair), empty, and the chars the
    // corpus actually uses — the native codegen loop and the split("")
    // + aggregate formulation must agree codepoint for codepoint
    val words = Seq("spark", "", "café", "päö", "中文字", "€5", "a😀b", "😀",
      "doc 42; x", "1234567890")
    val rows = words.toDF("w")
      .select(portableStringHash($"w").as("native"),
        portableStringHashHof($"w").as("hof"))
      .as[(Long, Long)].collect()
    rows.zip(words).foreach { case ((n, h), w) =>
      assert(n == h, s"mismatch on '$w': native=$n hof=$h")
    }
  }

  test("native portable hash: null in, null out; SQL surface registered") {
    GraftExtensions.register(spark)
    val got = Seq(Some("x"), None).toDF("w")
      .selectExpr("portable_hash(w)").as[Option[Long]].collect()
    assert(got(0).isDefined && got(1).isEmpty)
  }

  test("native aggregates reach SQL text: bitmap_distinct, cms, frequent_items") {
    GraftExtensions.register(spark)
    Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("v").createOrReplaceTempView("__na")
    assert(spark.sql("SELECT bitmap_distinct(v, 16) FROM __na")
      .collect()(0).getLong(0) == 3L)
    val sk = spark.sql(
      "SELECT count_min_sketch_portable(cast(v as string), 2, 8) FROM __na")
      .collect()(0).getSeq[Long](0)
    assert(sk.length == 16 && sk.sum == 12L, "2 rows x 6 items each")
    val hh = spark.sql("SELECT frequent_items(cast(v as string), 2) FROM __na")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(hh.map(_.getString(0)).contains("3"), "dominant item survives")
    // non-literal size parameter must be rejected, not misread
    val err = intercept[Exception] {
      spark.sql("SELECT bitmap_distinct(v, cast(v as int)) FROM __na").collect()
    }
    assert(err.getMessage != null)
  }
}
