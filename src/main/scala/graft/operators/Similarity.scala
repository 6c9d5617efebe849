package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** E3 — similarity search over an embedding column (`array<float>`).
  *
  * All math is pure higher-order Column expressions: float elements are
  * promoted to double BEFORE multiply (float x float in double is exact —
  * 24-bit mantissas), and the fold over the vector is sequential, so the
  * result is bit-identical across engines that do the same promotion —
  * which makes cosine similarity verifiable against an external SQL oracle
  * without tolerance bands.
  *
  * Scale design: brute-force top-k is the CORRECTNESS baseline — a
  * broadcast of the (small) query set against the full corpus, no shuffle
  * of the corpus at all, O(|Q|·N) work. The scale path is LSH bucketing
  * (sign-bit buckets): corpus and queries are hash-partitioned by bucket,
  * so each query only scans its bucket — O(|Q|·N/2^bits) with one
  * co-partitioned join. For 100 TB corpora, bucket the stored table by
  * `bucket` at write time so the join is shuffle-free on the corpus side.
  */
object Similarity {

  /** Dot product of two float vectors, computed exactly in double.
    * Native codegen'd expression (graft.expressions.FloatVecDot) — the
    * higher-order form `dotHof` has identical bit-level semantics but
    * evaluates interpreted (lambda dispatch per element), which dominates
    * candidate-join cost at scale. Tests assert dot == dotHof.
    */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorFunctions.floatVecDot(a, b)

  /** Reference higher-order formulation (what the SQL oracles mirror). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-bit LSH bucket: bit i of the bucket id = sign of component i.
    * Cheap, deterministic, oracle-expressible. Vectors near each other in
    * cosine share leading sign bits with high probability.
    */
  def signBucket(v: Column, bits: Int): Column =
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L),
      (acc, i) => acc + when(element_at(v, i + 1) >= 0,
        pow(lit(2.0), i.cast("double")).cast("long")).otherwise(lit(0L)))

  /** Brute-force exact top-k cosine neighbours for each query vector.
    * `queries`/`corpus`: (id, vec). Excludes self-pairs. Deterministic
    * ranking: ties broken by candidate id on the ROUNDED similarity so
    * rank order is engine-independent.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     roundTo: Int = 6): DataFrame = {
    // norms computed once per row, not once per pair
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"),
      norm(col("vec")).as("qn"))
    val c = corpus.select(col("id").as("cand_id"), col("vec").as("cv"),
      norm(col("vec")).as("cn"))
    val sims = q.join(broadcast(c), col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), roundTo).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    sims.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("cand_id"), col("sim"))
  }

  /** LSH-bucketed approximate top-k: candidates restricted to the query's
    * sign bucket. The scale path — each query scans N/2^bits candidates.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int = 8,
              roundTo: Int = 6): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"),
      signBucket(col("vec"), bits).as("bucket"), norm(col("vec")).as("qn"))
    val c = corpus.select(col("id").as("cand_id"), col("vec").as("cv"),
      signBucket(col("vec"), bits).as("bucket"), norm(col("vec")).as("cn"))
    val sims = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), roundTo).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    sims.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("cand_id"), col("sim"))
  }

  /** E3 — IVF-flavoured ANN: partition the corpus into K Voronoi cells
    * around centroid vectors, search only the query's own cell. Here the
    * centroids are K designated corpus vectors (deterministic; a
    * production build would k-means a sample — the index/search shape is
    * identical). Assignment and ranking use ROUNDED similarity with id
    * tie-breaks so results are engine-reproducible.
    *
    * Scale: assignment is a broadcast of K centroids over the corpus (one
    * narrow pass); search is queries x corpus/K after one co-partitioned
    * join on the cell id. Store the corpus bucketed by cell for a
    * shuffle-free search side.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              k: Int, roundTo: Int = 6): DataFrame = {
    def assign(df: DataFrame, idCol: String): DataFrame = {
      val scored = df.select(col("id").as(idCol), col("vec"))
        .join(broadcast(centroids.select(col("id").as("cid"), col("vec").as("cvec"))),
          lit(true))
        .select(col(idCol), col("vec"),
          col("cid"), round(dot(col("vec"), col("cvec")), roundTo).as("d"))
      val w = Window.partitionBy(idCol).orderBy(col("d").desc, col("cid"))
      scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col(idCol), col("vec"), col("cid").as("cell"))
    }
    val c = assign(corpus, "cand_id")
      .select(col("cand_id"), col("vec").as("cv"), col("cell"), norm(col("vec")).as("cn"))
    val q = assign(queries, "query_id")
      .select(col("query_id"), col("vec").as("qv"), col("cell"), norm(col("vec")).as("qn"))
    val sims = q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), roundTo).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    sims.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("cand_id"), col("sim"))
  }

  /** E2 (embedding flavour) — near-duplicate pairs by cosine >= threshold,
    * blocked by shared LSH bucket so the self-join never goes quadratic.
    */
  def nearDupPairs(corpus: DataFrame, threshold: Double, bits: Int = 8,
                   roundTo: Int = 6): DataFrame = {
    val b = corpus.select(col("id"), col("vec"),
      signBucket(col("vec"), bits).as("bucket"), norm(col("vec")).as("nrm"))
    val l = b.select(col("bucket"), col("id").as("id1"), col("vec").as("v1"),
      col("nrm").as("n1"))
    val r = b.select(col("bucket"), col("id").as("id2"), col("vec").as("v2"),
      col("nrm").as("n2"))
    l.join(r, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(dot(col("v1"), col("v2")) / (col("n1") * col("n2")), roundTo).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
