package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._
import graft.operators.Sessionize

/** Property law for the round-18 late-day fold: for an ARBITRARY
  * partition of an arbitrary event set into "history" and "batch" — no
  * event-time ordering between the two sides at all, so the batch can
  * be entirely late, partially late per key, interleaved, duplicated
  * timestamps, keys on one side only — `sessionsFoldLate` over the
  * history snapshot equals full re-sessionization of everything,
  * hash-exactly. This is strictly stronger than the gated fold's
  * contract: the handler's interval merge must reproduce event-level
  * sessionization from SESSION-granularity inputs (fusion across
  * multiple closed sessions, containment, overlap), which is exactly
  * the claim the graded row e11_sessions_incr_late makes on real data.
  */
object Round18PropsSpec extends Properties("graft.round18") {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private val splitGen: Gen[(List[(Long, Long, Long)], List[Boolean], Int)] =
    for {
      n <- Gen.chooseNum(1, 100)
      keys <- Gen.chooseNum(1, 6)
      seed <- Gen.chooseNum(0, 100000)
    } yield {
      val rnd = new scala.util.Random(seed)
      // ts spread over ~5 gap-lengths; duplicates allowed on purpose
      val rows = (0 until n).map(i =>
        (rnd.nextInt(keys).toLong, rnd.nextInt(3000000).toLong.max(0L),
          i.toLong)).toList
      val mask = rows.map(_ => rnd.nextBoolean())
      (rows, mask, seed)
    }

  private def df(xs: List[(Long, Long, Long)]) =
    xs.toDF("user_id", "tsMs", "event_id")
      .select(col("user_id"), timestamp_millis(col("tsMs")).as("ts"),
        col("event_id"))

  private def canon(d: org.apache.spark.sql.DataFrame) =
    d.select("user_id", "start_ms", "end_ms", "n_events", "open")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).sorted.toSeq

  property("sessionsFoldLate over ANY history/batch split equals the full snapshot") =
    Prop.forAll(splitGen) { case (rows, mask, seed) =>
      val hist = rows.zip(mask).collect { case (r, true) => r }
      val batch = rows.zip(mask).collect { case (r, false) => r }
      val got = canon(Sessionize.sessionsFoldLate(
        Sessionize.sessionsSnapshot(df(hist), "user_id", "ts", "event_id", 10),
        df(batch), "user_id", "ts", "event_id", 10))
      val want = canon(Sessionize.sessionsSnapshot(df(rows), "user_id", "ts",
        "event_id", 10))
      (got == want) :| s"seed=$seed got=$got\nwant=$want"
    }
}
