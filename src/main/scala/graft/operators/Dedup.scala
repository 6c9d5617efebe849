package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._

/** Deduplication operators for large-scale corpus curation (extension tier
  * E1/E2 — SURVEY.md §2.4). Exact dedup generalizes the reference's
  * first-wins distinct (`/root/reference/src/FullETLGenerator.java:80-122`)
  * to arbitrary key subsets; the near-dup family (MinHash+LSH, SimHash,
  * n-gram Jaccard) is standard LLM-corpus machinery built entirely from
  * Catalyst higher-order expressions — no UDFs, fully codegen'd and
  * distributed.
  *
  * Scale design: every variant reduces the pair space BEFORE any join —
  * exact dedup is one hash-shuffle on the key; MinHash compares only pairs
  * sharing an LSH band bucket; n-gram Jaccard only pairs sharing a blocking
  * key. Nothing ever materializes O(n²).
  */
object Dedup {

  /** E1 — exact dedup on a key subset with a DETERMINISTIC survivor
    * (min by `order`), unlike `dropDuplicates` whose survivor is whatever
    * partition wins. One shuffle on `key`; window parallelizes per key.
    */
  def exact(df: DataFrame, key: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Whitespace tokenization shared by the text-dedup family. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word k-shingles: `["a","b","c","d"]`, k=3 -> `["a b c", "b c d"]`.
    * Pure higher-order expression (SQL subscripts are 0-based).
    */
  def shingles(toks: Column, k: Int): Column = {
    val t = toks
    // transform(sequence(0, size-k), i -> concat_ws(' ', t[i], ..., t[i+k-1]))
    transform(
      sequence(lit(0), greatest(size(t) - lit(k), lit(-1))),
      i => concat_ws(" ", (0 until k).map(j => element_at(t, i + lit(j + 1))): _*))
  }

  /** MinHash signature of a shingle set: for each of `m` universal-hash
    * permutations `(a_j*x + b_j) mod p`, the min over shingle hashes.
    * Deterministic coefficients derived from a fixed seed so the signature
    * is reproducible by any engine (portable polynomial base hash — see
    * graft.functions.portableStringHash).
    */
  def minhashCoeffs(m: Int): Seq[(Long, Long)] =
    (0 until m).map(j => (2L * j + 3L, 104729L * (j + 1) % HashPrime))

  def minhashSignature(shingleCol: Column, m: Int): Column = {
    val base = array_distinct(transform(shingleCol, s => portableStringHash(s)))
    array(minhashCoeffs(m).map { case (a, b) =>
      array_min(transform(base, x => affineHash(x, a, b)))
    }: _*)
  }

  /** E2 — MinHash + LSH banding: docs sharing any band bucket become
    * candidate pairs; candidates are then verified with EXACT Jaccard over
    * distinct shingles. `bands*rowsPerBand` hashes total.
    *
    * Scale: the only join is on (band, bandHash) — candidates are rare by
    * construction, so the shuffle is O(n·bands), never O(n²). At 100 TB
    * the band-bucket join hash-partitions on the bucket; skewed buckets
    * (e.g. empty docs) are handled by AQE skew-join splitting.
    */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 k: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
                 jaccardThreshold: Double = 0.5): DataFrame = {
    val m = bands * rowsPerBand
    val sh = docs.select(
      col(idCol).as("id"),
      array_distinct(shingles(tokens(col(textCol)), k)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), m))
    // explode one row per band: (band index, hash of the band's slice)
    val banded = sh.select(
      col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        aggregate(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
          lit(7L), (acc, x) => pmod(acc * lit(31L) + x, lit(HashPrime))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bandHash")
    val l = banded.select(col("band"), col("bandHash"),
      col("id").as("id1"), col("sh").as("sh1"))
    val r = banded.select(col("band"), col("bandHash"),
      col("id").as("id2"), col("sh").as("sh2"))
    l.join(r, Seq("band", "bandHash"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        (size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2")))).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= jaccardThreshold)
  }

  /** E2 — SimHash: b-bit signature where bit i is the sign of
    * sum over tokens of (bit i of token-hash ? +1 : -1). Near-dups have
    * small Hamming distance. Bits come from the 30-bit portable hash so
    * the whole computation is reproducible in any engine; b <= 30.
    */
  def simhash(toks: Column, bits: Int = 24): Column = {
    val hashes = transform(toks, t => portableStringHash(t))
    aggregate(
      sequence(lit(0), lit(bits - 1)),
      lit(0L),
      (acc, i) => {
        val pow2 = pow(lit(2.0), i.cast("double"))
        val bitSum = aggregate(hashes, lit(0L),
          (s, h) => s + (floor(h / pow2).cast("long") % lit(2L)) * lit(2L) - lit(1L))
        acc + when(bitSum > 0, pow2.cast("long")).otherwise(lit(0L))
      })
  }

  /** E2 — n-gram (token) Jaccard dedup with a cheap blocking key (same
    * `blockCols` value) so the self-join never goes quadratic: pairs are
    * only compared within a block.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        blockCols: Seq[Column], threshold: Double): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
      array_distinct(tokens(col(textCol))).as("tok"),
      struct(blockCols: _*).as("block"))
    val l = base.select(col("block"), col("id").as("id1"), col("tok").as("tok1"))
    val r = base.select(col("block"), col("id").as("id2"), col("tok").as("tok2"))
    l.join(r, Seq("block"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        (size(array_intersect(col("tok1"), col("tok2"))).cast("double") /
          size(array_union(col("tok1"), col("tok2")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
