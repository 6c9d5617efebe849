package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Pins the schema-adaptive events-ts contract (round-7 incident).
  *
  * Parquet TIMESTAMP(NANOS) read differently across Spark versions:
  * <=4.0 + legacy conf -> raw int64 epoch-ns; 4.1+ -> TIMESTAMP_NTZ (the
  * legacy conf is inert). `graft.functions.eventTimeMillis` must produce
  * the identical millisecond-floor TimestampType from EITHER physical
  * representation, so the entire event-time tier (E11, the as-of family,
  * e6/e7/e10 event queries) is immune to reader-representation drift —
  * the exact failure a 100 TB lake with files written over years hits.
  */
class EventTimeContractSpec extends SparkSpec {
  import spark.implicits._

  // ns epochs with sub-millisecond residue, so the floor is exercised
  private val nsEpochs = Seq(
    1600000000123456789L, // +.456789 ms residue
    1600000000999999999L, // just under the next ms
    1600000001000000000L, // exactly on a ms boundary
    4102444799987654321L  // far future, still < 2^63 ns
  )

  private def writeAndRead(dir: String, toCol: org.apache.spark.sql.Column) = {
    nsEpochs.toDF("ns")
      .select(col("ns").as("id"), toCol.as("ts"))
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("eventTimeMillis: identical output from int64 epoch-ns, NTZ, and TZ representations") {
    val base = java.nio.file.Files.createTempDirectory("evt-contract").toString

    val asLong = writeAndRead(s"$base/long", col("ns"))
    val asNtz = writeAndRead(s"$base/ntz",
      expr("cast(timestamp_micros(ns div 1000) as timestamp_ntz)"))
    val asTz = writeAndRead(s"$base/tz", expr("timestamp_micros(ns div 1000)"))

    assert(asLong.schema("ts").dataType == LongType)
    assert(asNtz.schema("ts").dataType == TimestampNTZType)
    assert(asTz.schema("ts").dataType == TimestampType)

    val outs = Seq(asLong, asNtz, asTz).map { df =>
      val n = functions.eventTimeMillis(df)
      assert(n.schema("ts").dataType == TimestampType)
      n.select(col("id"), unix_millis(col("ts")).as("ms"))
        .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    assert(outs(0) == outs(1), "long vs NTZ representation diverged")
    assert(outs(0) == outs(2), "long vs TZ representation diverged")
    // and the floor itself is the ms floor of the ns epoch
    val expected = nsEpochs.map(ns => (ns, ns / 1000000L))
    assert(outs(0) == expected)
  }

  test("eventTimeMillis: rejects non-temporal physical types loudly") {
    val df = Seq(("a", 1)).toDF("ts", "x")
    val e = intercept[IllegalArgumentException](functions.eventTimeMillis(df))
    assert(e.getMessage.contains("unsupported event-time physical type"))
  }

  test("Queries.events reads the real events table in this environment") {
    val ev = Queries.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.filter(col("ts").isNull).count() == 0)
    assert(ev.count() > 0)
  }
}
