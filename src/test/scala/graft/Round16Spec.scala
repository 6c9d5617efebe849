package graft

/** Round-16 pins: in-contract OUT-OF-ORDER events across micro-batches
  * in the event-time stateful operators (r15 advice item 1 — the
  * medium). Within one micro-batch the operator sorts its input, so the
  * only unsorted path is a CARRIED state meeting a next-batch event
  * with wm <= ts < state.lastMs (non-late, within gap): the r15 merge
  * assigned `lastMs = ts`, REGRESSING the session end (possibly below
  * the start) and the timeout computed from it. r16 clamps
  * `lastMs = max(lastMs, ts)` / `startMs = min(startMs, ts)` (and the
  * min-start analog in intervalMergeEventTime), so a straggler widens
  * the session exactly as the batch sessionizer over the same events
  * would.
  */
class Round16Spec extends SparkSpec {

  private val base = 1700000000000L
  private def min(m: Long): Long = base + m * 60000L

  test("sessionsEventTime: in-contract cross-batch straggler widens, never regresses, the session") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[StreamingOps.Event]
    val q = StreamingOps.sessionsEventTime(in.toDS(), gapMinutes = 10,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("sess_straggler")
      .outputMode("append").start()
    try {
      // batch 1: key 1 open session [+0, +8]; key 2 open session
      // [+7, +8]; key 9 pushes the watermark to +15 - 10 = +5
      in.addData(
        StreamingOps.Event(1L, min(0), 0.0), StreamingOps.Event(1L, min(8), 0.0),
        StreamingOps.Event(2L, min(7), 0.0), StreamingOps.Event(2L, min(8), 0.0),
        StreamingOps.Event(9L, min(15), 0.0))
      q.processAllAvailable()
      // batch 2: +6 is NON-LATE (watermark +5) but older than both
      // carried lastMs values — and older than key 2's startMs; +25 is
      // > gap past +8, so it closes both sessions in-function
      in.addData(
        StreamingOps.Event(1L, min(6), 0.0), StreamingOps.Event(1L, min(25), 0.0),
        StreamingOps.Event(2L, min(6), 0.0), StreamingOps.Event(2L, min(25), 0.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM sess_straggler WHERE key IN (1, 2)")
        .as[StreamingOps.SessionOut].collect()
        .map(r => r.key -> ((r.start_ms, r.end_ms, r.n_events))).toMap
      // batch semantics over {0,6,8} / {6,7,8}: one widened session each.
      // the r15 unclamped merge emitted (0, 6) and (7, 6) — end < start
      assert(rows == Map(
          1L -> ((min(0), min(8), 3L)),
          2L -> ((min(6), min(8), 3L))),
        s"straggler must widen the carried session: $rows")
    } finally q.stop()
  }

  test("intervalMergeEventTime: in-contract cross-batch straggler min-clamps the island start") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[StreamingOps.Event]
    val q = StreamingOps.intervalMergeEventTime(in.toDS(),
        intervalMs = 10 * 60000L, watermark = "10 minutes")
      .writeStream.format("memory").queryName("iv_straggler")
      .outputMode("append").start()
    try {
      // batch 1: key 1 island [+7, +17]; key 9 watermark -> +5
      in.addData(StreamingOps.Event(1L, min(7), 0.0),
        StreamingOps.Event(9L, min(15), 0.0))
      q.processAllAvailable()
      // batch 2: +6 is non-late and OLDER than the island start — its
      // interval [+6, +16] overlaps, so the sweep-line start is +6;
      // +40 > maxEnd closes the island in-function
      in.addData(StreamingOps.Event(1L, min(6), 0.0),
        StreamingOps.Event(1L, min(40), 0.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM iv_straggler WHERE key = 1")
        .as[StreamingOps.IntervalOut].collect()
      assert(rows.length == 1 && rows(0).start_ms == min(6)
          && rows(0).end_ms == min(17) && rows(0).n_events == 2,
        s"straggler must pull the island start back to +6: ${rows.toSeq}")
    } finally q.stop()
  }
}
