package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Pure-column Bloom filter — build distributed, probe map-side, zero
  * UDFs (the probe is a codegen'd expression chain over a literal
  * long-array bitmap).
  *
  * Why not `DataFrameStatFunctions.bloomFilter`: that returns a driver
  * object usable only through a UDF (interpreted, non-codegen). Here the
  * bitmap IS a column literal, so `mightContain` stays inside
  * whole-stage codegen and ships with the plan like any broadcast.
  *
  * The 100 TB role: a semi-join prefilter. Joining a 100 TB probe side
  * against even a broadcast index still evaluates the join for every
  * probe row; a 16 KiB bitmap rejects ~all non-members in the scan
  * stage (pure arithmetic, no hash table), and only survivors reach the
  * real join for exact verification — the same shape as Spark's own
  * runtime-filtering `BloomFilterMightContain`, but portable and
  * explicit. False positives are harmless: the exact join after the
  * prefilter decides membership.
  */
object Bloom {

  /** Second hash for double hashing (Kirsch–Mitzenmacher: k probe
    * positions from two base hashes): an affine re-mix of the portable
    * polynomial hash, mod the same prime.
    */
  private def h2(x: Column): Column =
    pmod(x * lit(31L) + lit(17L), lit(HashPrime))

  /** Builds the bitmap for the values in `hashes` (a single bigint
    * column of ALREADY-HASHED members, each in [0, HashPrime)).
    * Distributed: positions explode map-side, `bit_or` aggregates per
    * 64-bit word, and only ≤ mBits/64 words come back to the driver —
    * bounded by the filter-size CONTRACT (2 KiB per 2^17 bits), never
    * by data size.
    */
  def build(hashes: DataFrame, mBits: Int, k: Int): Array[Long] = {
    require(Integer.bitCount(mBits) == 1, "mBits must be a power of two")
    val x = col(hashes.columns.head)
    val words = hashes
      .select(explode(transform(sequence(lit(0), lit(k - 1)),
        s => pmod(x + s.cast("bigint") * h2(x), lit(mBits.toLong)))).as("p"))
      .groupBy((col("p") / 64).cast("int").as("w"))
      .agg(bit_or(call_function("shiftleft", lit(1L),
        pmod(col("p"), lit(64L)).cast("int"))).as("bits"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership probe against a built bitmap: true iff all k probe bits
    * are set. The k probes UNROLL into a plain AND chain of arithmetic +
    * array-literal lookups (a higher-order `forall` would evaluate its
    * lambda interpreted per row — unrolling keeps the probe inside
    * whole-stage codegen, which is the point of the prefilter).
    */
  def mightContain(x: Column, words: Array[Long], mBits: Int, k: Int): Column = {
    val bitmap = typedLit(words.toSeq)
    (0 until k).map { s =>
      val pos = pmod(x + lit(s.toLong) * h2(x), lit(mBits.toLong))
      bitmap.getItem((pos / 64).cast("int"))
        .bitwiseAND(call_function("shiftleft", lit(1L),
          pmod(pos, lit(64L)).cast("int"))) =!= lit(0L)
    }.reduceLeft(_ && _)
  }
}
