package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Round-6 additions: PQ exact re-rank. */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("pqRerank recall strictly improves over plain pqTopK (vs brute force)") {
    val q = emb.filter(col("id") < 8)
    val cb = emb.filter(col("id") < 8)
    val exact = Similarity.bruteForceTopK(q, emb, k = 3)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    def hits(df: org.apache.spark.sql.DataFrame): Int =
      df.select("query_id", "cand_id").as[(Long, Long)].collect()
        .count(exact.contains)
    val plain = hits(Similarity.pqTopK(q, emb, cb, k = 3, m = 4))
    val rerank = hits(Similarity.pqRerank(q, emb, cb, k = 3, c = 8, m = 4))
    // the re-rank pool recovers true neighbours that ADC quantization
    // pushed past rank 3 but not past rank 8
    assert(rerank > plain, s"rerank hits $rerank vs plain $plain")
    assert(rerank <= 24 && plain >= 0)
  }

  test("pqRerank top-k is contained in its own ADC top-c pool") {
    val q = emb.filter(col("id") < 8)
    val cb = emb.filter(col("id") < 8)
    val pool = Similarity.pqTopK(q, emb, cb, k = 8, m = 4)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val rr = Similarity.pqRerank(q, emb, cb, k = 3, c = 8, m = 4)
      .select("query_id", "cand_id").as[(Long, Long)].collect()
    assert(rr.nonEmpty && rr.forall(pool.contains))
  }

  test("tpch q5: dims broadcast under the fact join, no cartesian product") {
    val df = Queries.sql_tpch_q5(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // region/nation/supplier/customer are all broadcast-sized; the only
    // shuffle-worthy join is fact-to-fact (orders x lineitem)
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    val broadcasts = "BroadcastExchange".r.findAllIn(plan).length
    assert(broadcasts >= 3, s"expected >=3 broadcast dims, got $broadcasts")
  }

  test("pqRerank with c = |corpus| equals brute force exactly") {
    val q = emb.filter(col("id") < 4)
    val cb = emb.filter(col("id") < 8)
    val n = emb.count().toInt
    val bf = Similarity.bruteForceTopK(q, emb, k = 3)
      .orderBy("query_id", "rnk").collect().toSeq
    val rr = Similarity.pqRerank(q, emb, cb, k = 3, c = n, m = 4)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(rr == bf)
  }
}
