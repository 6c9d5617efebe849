package graft.sources

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Manual runtime-filter (bloom) pre-join pruning: before shuffling a
  * huge probe side into an equi-join, drop the rows whose key cannot
  * possibly match the build side. A shuffle join moves BOTH sides; when
  * the probe side is 100 TB and only a few percent of its keys survive
  * the join, the bloom filter removes the dead rows at the SCAN, before
  * they ever cross the wire.
  *
  * This is the explicit form of what Spark's row-level runtime filtering
  * injects automatically for eligible shapes — exposed as an operator so
  * pipelines can apply it across stage boundaries (e.g. filter today's
  * ingest against yesterday's key set) where the optimizer cannot.
  *
  * The only driver-side transfer is the bloom itself, whose size is the
  * `numBits` contract (1 MB default) regardless of build-side row count —
  * the same bounded-by-construction contract as a broadcast dim. Build
  * and probe agree on the hash (xxhash64 of the key), so false NEGATIVES
  * are impossible: pruning is always sound, only the pruning RATE varies
  * with fpp.
  */
object RuntimeFilter {

  /** Aggregate the build side's keys into a serialized bloom filter
    * (one map-side-combined aggregate, no shuffle of build rows).
    */
  def bloomOf(build: DataFrame, keyCol: String,
              expectedItems: Long = 1000000L,
              numBits: Long = 8L * 1024 * 1024): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftSqlBridge.expression(col(keyCol)))),
      Literal(expectedItems), Literal(numBits))
    build.select(GraftSqlBridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Keep only probe rows whose key might be in the bloom — a narrow,
    * codegen'd scan-side predicate.
    */
  def prune(probe: DataFrame, keyCol: String, bloom: Array[Byte]): DataFrame =
    probe.filter(GraftSqlBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(GraftSqlBridge.expression(col(keyCol)))))))

  /** Convenience: prune `probe` to the keys that might appear in
    * `build`, then the caller joins as usual.
    */
  def semiPrune(probe: DataFrame, probeKey: String,
                build: DataFrame, buildKey: String,
                expectedItems: Long = 1000000L,
                numBits: Long = 8L * 1024 * 1024): DataFrame =
    prune(probe, probeKey, bloomOf(build, buildKey, expectedItems, numBits))
}
