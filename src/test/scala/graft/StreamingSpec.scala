package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming tumbling window matches batch semantics after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L // aligned-ish epoch ms
    val input = MemoryStream[(Long, Long, Double)]
    val df = input.toDF().toDF("user_id", "ms", "value")
      .withColumn("ts", timestamp_millis($"ms"))
    val agg = StreamingOps.tumbling(df, "user_id", "ts", "value", minutes = 10,
      watermark = "0 seconds")
    val q = agg.writeStream.format("memory").queryName("tumb")
      .outputMode("append").start()
    try {
      input.addData((5L, base, 1.0), (5L, base + 60000, 2.0))
      q.processAllAvailable()
      // push watermark far past the first window so it emits
      input.addData((5L, base + 3600 * 1000, 9.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM tumb ORDER BY w_start_ms")
        .as[(Long, Long, Long, Double)].collect()
      assert(rows.nonEmpty)
      val first = rows.head
      assert(first._2 % 600000 == 0 && first._3 == 2 && first._4 == 3.0)
    } finally q.stop()
  }

  test("streaming dedup keeps the first occurrence per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    val input = MemoryStream[(Long, String, Long)]
    val df = input.toDF().toDF("id", "content", "ms")
      .withColumn("ts", timestamp_millis($"ms"))
    val dd = StreamingOps.dedup(df, "ts", Seq("content"), watermark = "10 minutes")
    val q = dd.writeStream.format("memory").queryName("ddup")
      .outputMode("append").start()
    try {
      input.addData((1L, "a", base), (2L, "a", base + 1000), (3L, "b", base + 2000))
      q.processAllAvailable()
      // same content again in a later batch, still inside the watermark
      input.addData((4L, "a", base + 3000), (5L, "c", base + 4000))
      q.processAllAvailable()
      val got = spark.sql("SELECT content FROM ddup").as[String].collect().sorted
      assert(got.toSeq == Seq("a", "b", "c"))
    } finally q.stop()
  }

  test("stateful sessionization emits closed sessions across batches") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    val input = MemoryStream[StreamingOps.Event]
    val out = StreamingOps.sessions(input.toDS(), gapMinutes = 10)
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      input.addData(StreamingOps.Event(7L, base, 1.0),
        StreamingOps.Event(7L, base + 60000, 1.0))
      q.processAllAvailable()
      // 30-minute gap -> previous session closes on next event
      input.addData(StreamingOps.Event(7L, base + 31 * 60000, 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM sess").as[StreamingOps.SessionOut].collect()
      assert(rows.length == 1)
      assert(rows(0).n_events == 2 && rows(0).start_ms == base)
    } finally q.stop()
  }
}
