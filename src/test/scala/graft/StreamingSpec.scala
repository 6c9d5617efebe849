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

  test("windowed CMS: incremental state merge equals the batch sketch, estimates never undercount") {
    implicit val sqlCtx = spark.sqlContext
    import graft.expressions.CountMinSketch
    val base = 1700000000000L
    val (d, w) = (4, 64)
    val input = MemoryStream[(String, Long)]
    val df = input.toDF().toDF("item", "ms")
      .withColumn("ts", timestamp_millis($"ms"))
    val agg = StreamingOps.windowedSketch(df, "item", "ts", minutes = 10,
      depth = d, width = w, watermark = "0 seconds")
    val q = agg.writeStream.format("memory").queryName("wsk")
      .outputMode("append").start()
    try {
      // one window's items arrive over TWO micro-batches: the sketch
      // must merge partials exactly
      val batch1 = Seq.fill(30)("hot") ++ (1 to 10).map(i => s"a$i")
      val batch2 = Seq.fill(20)("hot") ++ (1 to 10).map(i => s"b$i")
      input.addData(batch1.map(it => (it, base + 1000)): _*)
      q.processAllAvailable()
      input.addData(batch2.map(it => (it, base + 2000)): _*)
      q.processAllAvailable()
      input.addData(("flush", base + 3600 * 1000)) // advance the watermark
      q.processAllAvailable()
      val rows = spark.sql("SELECT w_start_ms, sketch FROM wsk").collect()
      assert(rows.length == 1, s"expected one closed window, got ${rows.length}")
      val cells = rows.head.getSeq[Long](1)
      // incremental == batch: rebuild the sketch from the union in one go
      val batchCells = (batch1 ++ batch2).toDF("item")
        .agg(CountMinSketch.sketch(col("item"), d, w))
        .collect()(0).getSeq[Long](0)
      assert(cells == batchCells,
        "streamed partial-merge sketch must be bit-identical to the batch sketch")
      // probe: the hot item's estimate never undercounts its true 50
      val h = CountMinSketch.portableHash("hot")
      val est = (0 until d).map(i => cells(i * w + CountMinSketch.bucket(h, i, w))).min
      assert(est >= 50, s"hot estimate $est < 50")
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

  test("stream-static enrich: per-batch broadcast lookup, unmatched keys keep nulls") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("cust_id", "tier")
    val input = MemoryStream[(Long, Long)]
    val df = input.toDF().toDF("event_id", "cust_id")
    val q = StreamingOps.enrich(df, dim, "cust_id")
      .writeStream.format("memory").queryName("enr")
      .outputMode("append").start()
    try {
      input.addData((10L, 1L), (11L, 3L)) // 3 has no dim row
      q.processAllAvailable()
      input.addData((12L, 2L)) // the join works across batches too
      q.processAllAvailable()
      val got = spark.sql("SELECT event_id, tier FROM enr ORDER BY event_id")
        .as[(Long, Option[String])].collect().toSeq
      assert(got == Seq((10L, Some("gold")), (11L, None), (12L, Some("silver"))))
    } finally q.stop()
  }

  test("late data: inside-watermark events count, outside-watermark events drop") {
    implicit val sqlCtx = spark.sqlContext
    val min = 60000L
    val base = 1700000400000L // multiple of 10 min: W0 = [base, base+10m)
    val input = MemoryStream[(Long, Long, Double)]
    val df = input.toDF().toDF("user_id", "ms", "value")
      .withColumn("ts", timestamp_millis($"ms"))
    val agg = StreamingOps.tumbling(df, "user_id", "ts", "value", minutes = 10,
      watermark = "10 minutes")
    val q = agg.writeStream.format("memory").queryName("late")
      .outputMode("append").start()
    try {
      // in-order arrivals into W0
      input.addData((1L, base + 1 * min, 1.0), (1L, base + 2 * min, 2.0))
      q.processAllAvailable()
      // jump ahead: max event time base+25m -> watermark base+15m; W0
      // (end base+10m) closes and emits on the next batch
      input.addData((1L, base + 25 * min, 3.0))
      q.processAllAvailable()
      // three late arrivals against watermark = base+15m. The drop rule
      // is WINDOW-based: a late row is discarded iff its window is
      // already finalized (window.end <= watermark), not merely because
      // its event time trails the watermark:
      //   base+16m — still-open W1 [10m,20m)                  -> counted
      //   base+12m — below the watermark but W1 end 20m > 15m -> counted
      //   base+ 3m — W0 end 10m <= 15m, finalized and emitted -> DROPPED
      input.addData((1L, base + 16 * min, 4.0),
        (1L, base + 3 * min, 5.0), (1L, base + 12 * min, 6.0))
      q.processAllAvailable()
      // push the watermark past W1 and W2 so they finalize
      input.addData((1L, base + 70 * min, 7.0))
      q.processAllAvailable()
      input.addData((1L, base + 100 * min, 8.0))
      q.processAllAvailable()
      val emitted = spark.sql("SELECT * FROM late ORDER BY w_start_ms")
        .as[(Long, Long, Long, Double)].collect()
        .filter(_._2 < base + 40 * min) // W0..W2; later windows may be open
      // W0: the two in-order events ONLY (base+3m was dropped);
      // W1: both late-but-open arrivals; W2: the watermark-advancing event
      assert(emitted.map(r => (r._2, r._3, r._4)).toSeq == Seq(
        (base, 2L, 3.0),
        (base + 10 * min, 2L, 10.0),
        (base + 20 * min, 1L, 3.0)))
      // append-mode streaming over late data == batch over the ACCEPTED
      // events: the dropped row is the only divergence
      val accepted = Seq(
        (1L, base + 1 * min, 1.0), (1L, base + 2 * min, 2.0),
        (1L, base + 25 * min, 3.0), (1L, base + 16 * min, 4.0),
        (1L, base + 12 * min, 6.0))
        .toDF("user_id", "ms", "value")
        .withColumn("ts", timestamp_millis($"ms"))
      val batch = operators.Sessionize
        .tumbling(accepted, "user_id", "ts", "value", minutes = 10)
        .filter($"w_start_ms" < base + 40 * min)
        .select($"user_id", $"w_start_ms", $"n_events", $"sum_value")
        .as[(Long, Long, Long, Double)].collect().sortBy(_._2).toSeq
      assert(emitted.toSeq == batch)
      // watermark-driven state EVICTION: 5 distinct windows were touched;
      // finalized ones must have left the state store
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows < 5, s"expected evicted window state, got $stateRows rows")
    } finally q.stop()
  }

  test("dedup state evicts past the watermark: re-arrival after horizon survives") {
    implicit val sqlCtx = spark.sqlContext
    val min = 60000L
    val base = 1700000000000L
    val input = MemoryStream[(Long, String, Long)]
    val df = input.toDF().toDF("id", "content", "ms")
      .withColumn("ts", timestamp_millis($"ms"))
    val dd = StreamingOps.dedup(df, "ts", Seq("content"), watermark = "10 minutes")
    val q = dd.writeStream.format("memory").queryName("ddlate")
      .outputMode("append").start()
    try {
      input.addData((1L, "a", base))
      q.processAllAvailable()
      // duplicate inside the horizon -> suppressed
      input.addData((2L, "a", base + 5 * min))
      q.processAllAvailable()
      // advance event time far past the horizon, then repeat the content:
      // its state entry was evicted, so the "duplicate" legitimately
      // re-emits — within-watermark dedup semantics, bounded state
      input.addData((3L, "z", base + 60 * min))
      q.processAllAvailable()
      input.addData((4L, "a", base + 61 * min))
      q.processAllAvailable()
      val got = spark.sql("SELECT id FROM ddlate").as[Long].collect().sorted
      assert(got.toSeq == Seq(1L, 3L, 4L),
        s"expected re-emit after horizon, got ${got.mkString(",")}")
    } finally q.stop()
  }

  test("stream-stream interval join == batch bucketed range join") {
    implicit val sqlCtx = spark.sqlContext
    val min = 60000L
    val base = 1700000400000L
    val imps = MemoryStream[(Long, Long)]
    val clicks = MemoryStream[(Long, Long)]
    val li = imps.toDF().toDF("k", "lms")
      .withColumn("lts", timestamp_millis($"lms"))
    val ri = clicks.toDF().toDF("k", "rms")
      .withColumn("rts", timestamp_millis($"rms"))
    val joined = StreamingOps.intervalJoin(li, ri, "k", "lts", "rts",
      lagMinutes = 10)
    val q = joined.writeStream.format("memory").queryName("ivj")
      .outputMode("append").start()
    val impRows = Seq((1L, base), (1L, base + 20 * min), (2L, base + min))
    val clickRows = Seq(
      (1L, base + 5 * min),  // attributes to imp@base only
      (1L, base + 25 * min), // attributes to imp@+20m only
      (2L, base + 12 * min), // 11m after imp@+1m -> outside the lag
      (3L, base + 2 * min))  // no impression for key 3
    try {
      // impressions first, clicks across two later batches (out of order
      // within the horizon — the buffered state must still match them)
      input2(imps, impRows); q.processAllAvailable()
      input2(clicks, clickRows.take(2)); q.processAllAvailable()
      input2(clicks, clickRows.drop(2)); q.processAllAvailable()
      val got = spark.sql("SELECT k, lms, rms FROM ivj")
        .as[(Long, Long, Long)].collect().sorted.toSeq
      val batch = operators.RangeJoin.bucketed(
        impRows.toDF("k", "lms"), clickRows.toDF("k", "rms"),
        "k", "lms", "rms", windowMs = 10 * min)
        .select($"k", $"lms", $"rms")
        .as[(Long, Long, Long)].collect().sorted.toSeq
      assert(got == batch)
      assert(got == Seq((1L, base, base + 5 * min),
        (1L, base + 20 * min, base + 25 * min)))
    } finally q.stop()
  }

  private def input2(s: MemoryStream[(Long, Long)],
                     rows: Seq[(Long, Long)]): Unit = { s.addData(rows); () }

  test("streaming near-dup dedup: same-signature docs suppressed within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000400000L
    val input = MemoryStream[(Long, String, Long)]
    val df = input.toDF().toDF("id", "text", "ms")
      .withColumn("ts", timestamp_millis($"ms"))
    val dd = StreamingOps.nearDupDedup(df, "ts", "text", watermark = "10 minutes")
    val q = dd.writeStream.format("memory").queryName("nddup")
      .outputMode("append").start()
    try {
      val a = "alpha beta gamma delta epsilon zeta"
      input.addData((1L, a, base), (2L, "one two three four five six", base + 1000))
      q.processAllAvailable()
      // identical token multiset -> identical signature -> suppressed;
      // genuinely different text survives
      input.addData((3L, a, base + 2000),
        (4L, "seven eight nine ten eleven twelve", base + 3000))
      q.processAllAvailable()
      val got = spark.sql("SELECT id FROM nddup").as[Long].collect().sorted
      assert(got.toSeq == Seq(1L, 2L, 4L))
    } finally q.stop()
  }

  test("windowed state survives a query restart via the checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val min = 60000L
    val base = 1700000400000L
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val input = MemoryStream[(Long, Long, Double)]
    val agg = StreamingOps.tumbling(
      input.toDF().toDF("user_id", "ms", "value")
        .withColumn("ts", timestamp_millis($"ms")),
      "user_id", "ts", "value", minutes = 10, watermark = "10 minutes")
    def start() = agg.writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    val q1 = start()
    try {
      // W0 and an OPEN W1 live in state; then W0 is flushed out
      input.addData((1L, base + 1 * min, 1.0), (1L, base + 11 * min, 2.0))
      q1.processAllAvailable()
      input.addData((1L, base + 25 * min, 3.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart against the SAME checkpoint: the open W1/W2 state and the
    // watermark must come back; a second W1 event merges into the
    // RECOVERED bucket, then everything is flushed
    val q2 = start()
    try {
      input.addData((1L, base + 12 * min, 4.0))
      q2.processAllAvailable()
      input.addData((1L, base + 60 * min, 9.0))
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = spark.read.parquet(s"$dir/out")
      .select($"w_start_ms", $"n_events", $"sum_value")
      .as[(Long, Long, Double)].collect().sorted.toSeq
    // W1 n=2 proves the pre-restart event was recovered, not lost or
    // double-counted; exactly-once: no window appears twice
    assert(rows == Seq(
      (base, 1L, 1.0),
      (base + 10 * min, 2L, 6.0),
      (base + 20 * min, 1L, 3.0)))
  }

  test("streaming CDC upsert maintains the parquet snapshot across batches") {
    implicit val sqlCtx = spark.sqlContext
    val snap = java.nio.file.Files.createTempDirectory("graft-cdc").toFile.getAbsolutePath
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc-ckpt").toFile.getAbsolutePath
    // initial snapshot: keys 1..3
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "attr")
      .write.mode("overwrite").parquet(snap)
    val input = MemoryStream[(Long, String, Long, String)]
    val changes = input.toDF().toDF("k", "attr", "seq", "op")
    val q = StreamingOps.cdcUpsert(changes, snap, key = Seq("k"),
      orderCol = "seq", checkpoint = ckpt)
    try {
      // batch 1: update k=2 twice (later seq wins), insert k=4, delete k=3
      input.addData((2L, "b1", 1L, "U"), (2L, "b2", 2L, "U"),
        (4L, "d", 1L, "U"), (3L, "x", 1L, "D"))
      q.processAllAvailable()
      val s1 = spark.read.parquet(snap).as[(Long, String)].collect().sorted.toSeq
      assert(s1 == Seq((1L, "a"), (2L, "b2"), (4L, "d")))
      // batch 2: re-insert a deleted key, update the batch-1 insert
      input.addData((3L, "c2", 3L, "U"), (4L, "d2", 4L, "U"))
      q.processAllAvailable()
      val s2 = spark.read.parquet(snap).as[(Long, String)].collect().sorted.toSeq
      assert(s2 == Seq((1L, "a"), (2L, "b2"), (3L, "c2"), (4L, "d2")))
    } finally q.stop()
  }

  test("frequent-items sketch aggregates incrementally over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val agg = input.toDF().toDF("token")
      .agg(graft.expressions.FrequentItems.sketch(col("token"), 5).as("hh"))
      .select(posexplode(col("hh")))
      .select(col("col.item").as("item"), col("col.est").as("est"))
    val q = agg.writeStream.format("memory").queryName("hhs")
      .outputMode("complete").start()
    try {
      input.addData(Seq.fill(50)("dom") ++ (1 to 30).map(i => s"t$i"): _*)
      q.processAllAvailable()
      input.addData(Seq.fill(40)("dom") ++ (31 to 60).map(i => s"t$i"): _*)
      q.processAllAvailable()
      val top = spark.sql("SELECT item, est FROM hhs ORDER BY est DESC")
        .as[(String, Long)].collect()
      // the dominant item survives incremental state merge across batches
      assert(top.head._1 == "dom" && top.head._2 >= 50, s"got ${top.toSeq}")
      assert(top.length <= 5)
    } finally q.stop()
  }

  test("streaming as-of: single-candidate state matches the batch operator across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.{AsOfIn, AsOfOut}
    val input = MemoryStream[AsOfIn]
    val q = StreamingOps.asOfBackward(input.toDS())
      .writeStream.format("memory").queryName("saof")
      .outputMode("append").start()
    try {
      // batch 1: key 1 gets a right then a left (match), a same-instant
      // tie (rt == lt matches, inclusive), and key 2 a left with NO right
      input.addData(
        AsOfIn(1L, 100L, 10.0, isLeft = false),
        AsOfIn(1L, 150L, 1.0, isLeft = true),
        AsOfIn(1L, 200L, 20.0, isLeft = false),
        AsOfIn(1L, 200L, 2.0, isLeft = true),
        AsOfIn(2L, 50L, 9.0, isLeft = true))
      q.processAllAvailable()
      // batch 2: the key-1 candidate (ts 200) must carry in state; a
      // newer right then supersedes it
      input.addData(
        AsOfIn(1L, 300L, 3.0, isLeft = true),
        AsOfIn(1L, 400L, 40.0, isLeft = false),
        AsOfIn(1L, 450L, 4.0, isLeft = true))
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM saof ORDER BY key, left_ms")
        .as[AsOfOut].collect().toSeq
      val expected = Seq(
        AsOfOut(1L, 150L, 1.0, 100L, 10.0),
        AsOfOut(1L, 200L, 2.0, 200L, 20.0), // inclusive same-instant tie
        AsOfOut(1L, 300L, 3.0, 200L, 20.0), // state carried across batches
        AsOfOut(1L, 450L, 4.0, 400L, 40.0),
        AsOfOut(2L, 50L, 9.0, null, null))  // no right ever: null extension
      assert(got == expected, s"got $got")
      // and the batch-native operator agrees on the same data
      import spark.implicits._
      val left = Seq((1L, 150L, 1.0), (1L, 200L, 2.0), (1L, 300L, 3.0),
        (1L, 450L, 4.0), (2L, 50L, 9.0)).toDF("k", "ts", "lv")
      val right = Seq((1L, 100L, 10.0), (1L, 200L, 20.0), (1L, 400L, 40.0))
        .toDF("k", "ts", "rv")
      val batch = graft.operators.AsOfJoin.nativeBackward(
        left, right, "k", "ts", Seq("rv"))
        .select(col("k"), col("ts"), col("lv"), col("rv"))
        .orderBy("k", "ts").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) null else r.getDouble(3)))
      val streamed = got.map(o =>
        (o.key, o.left_ms, o.left_value, o.right_value))
      assert(batch.toSeq == streamed,
        "streaming state twin must equal the native batch as-of")
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

  test("streaming interval merge: closed islands match the batch sweep-line across batches") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    val iv = 30 * 60000L // the batch query's 30-minute window
    val input = MemoryStream[StreamingOps.Event]
    val out = StreamingOps.intervalMerge(input.toDS(), intervalMs = iv)
    val q = out.writeStream.format("memory").queryName("ivm")
      .outputMode("append").start()
    try {
      // batch 1: three overlapping events -> one open island
      input.addData(StreamingOps.Event(5L, base, 1.0),
        StreamingOps.Event(5L, base + 10 * 60000, 1.0),
        StreamingOps.Event(5L, base + 25 * 60000, 1.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM ivm").count() == 0, "island still open")
      // batch 2: beyond the running max end -> island closes
      input.addData(StreamingOps.Event(5L, base + 90 * 60000, 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM ivm").as[StreamingOps.IntervalOut].collect()
      assert(rows.length == 1)
      assert(rows(0).start_ms == base)
      assert(rows(0).end_ms == base + 25 * 60000 + iv, "end = running max of event ends")
      assert(rows(0).n_events == 3)
      // a second key's state is independent
      input.addData(StreamingOps.Event(6L, base, 1.0),
        StreamingOps.Event(6L, base + 120 * 60000, 1.0))
      q.processAllAvailable()
      val byKey = spark.sql("SELECT * FROM ivm").as[StreamingOps.IntervalOut]
        .collect().groupBy(_.key)
      assert(byKey(6L).length == 1 && byKey(6L).head.n_events == 1)
      assert(byKey(5L).length == 1, "key 5 unchanged")
    } finally q.stop()
  }

  test("streaming image dedup: re-encoded duplicate suppressed, distinct images and garbage survive") {
    implicit val sqlCtx = spark.sqlContext
    def bmp(fmt: String, f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val g = f(x, y) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, baos)
      baos.toByteArray
    }
    val base = 1700000800000L
    val grad = (x: Int, y: Int) => (x * 3 + y * 2) % 256
    val checker = (x: Int, y: Int) => if ((x / 8 + y / 8) % 2 == 0) 230 else 20
    val input = MemoryStream[(Long, Array[Byte], Long)]
    val df = input.toDF().toDF("media_id", "payload", "ms")
      .withColumn("ts", timestamp_millis($"ms"))
    val dd = StreamingOps.imageDedup(df, "ts", watermark = "10 minutes")
    val q = dd.writeStream.format("memory").queryName("imgdd")
      .outputMode("append").start()
    try {
      input.addData((1L, bmp("bmp", grad), base),
        (2L, bmp("bmp", checker), base + 1000))
      q.processAllAvailable()
      // the SAME picture re-encoded as PNG -> same raster -> same dHash
      // -> suppressed; two distinct garbage payloads both survive
      input.addData((3L, bmp("png", grad), base + 2000),
        (4L, "junk one".getBytes("UTF-8"), base + 3000),
        (5L, "junk two".getBytes("UTF-8"), base + 4000))
      q.processAllAvailable()
      val got = spark.sql("SELECT media_id FROM imgdd").as[Long].collect().sorted
      assert(got.toSeq == Seq(1L, 2L, 4L, 5L))
    } finally q.stop()
  }
}
