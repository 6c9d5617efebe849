package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 scale-curve probe (round-8 verdict item 4): measure how the
  * heaviest graded queries actually BEND with data volume, instead of
  * arguing it from plan shape. Testdata stops at sf0.1, so sf1-equivalent
  * input is synthesized by deterministic k-fold replication of the sf0.1
  * tables with per-copy key shifts and content decorrelation:
  *
  *  - fact-ish tables (customer/orders/lineitem/events/documents/
  *    embeddings) replicate; keys shift by copy·(max+1) so each copy's
  *    FKs resolve inside its own copy and id spaces stay dense-ish
  *    (Ids.denseIds' sampled range buckets stay balanced regardless);
  *  - dimension tables (region/nation/supplier/part) stay 1× — dims grow
  *    slower than facts, and replicating them would break FK semantics;
  *  - document text is rotated through a per-copy character bijection
  *    (Caesar over a-z): intra-copy token/shingle/gram relations are
  *    EXACTLY preserved (any bijection preserves set equalities), while
  *    cross-copy overlap collapses — so near-dup DENSITY stays
  *    stationary as volume grows, the payload-stationary regime the
  *    100 TB design claims assume. Naive replication would instead
  *    create k-clones of every doc and grade a quadratic blowup no real
  *    corpus has;
  *  - customer names rotate the same way (entity-res gram gate);
  *  - embeddings flip signs per (copy, dimension): cosines within a copy
  *    are exactly unchanged (signs square away), cross-copy vectors
  *    decorrelate.
  *
  * Usage: runMain graft.tools.ProbeScale [srcSfDir] [scales]
  * (default /root/testdata/sf0.1 and 1,3,10). Prints per-query min-of-2
  * times per scale and the 10×/1× ratio next to the linear-scaling bar.
  *
  * MEASURED round 9 (idle host, local[32], scales 1/3/10 over sf0.1 —
  * i.e. the 10× point is sf1-equivalent volume): every worst-10 query
  * is SUBLINEAR, ratios 0.97–5.04 against the 10.0 linear bar:
  *
  *   e2_minhash          1.43 →  1.39 s  (0.97×)  LSH fixed overhead dominates
  *   e2_dedup_clusters   2.26 →  2.86 s  (1.26×)  CC rounds don't grow (density stationary)
  *   e2_simhash_scalable 1.78 →  2.58 s  (1.46×)
  *   e2_cc_incremental   4.29 →  4.54 s  (1.06×)  touched-component re-solve, as designed
  *   etl_entity_res      3.36 →  7.85 s  (2.34×)  gram-gate candidates track dup density
  *   etl_hierarchy       3.66 →  9.70 s  (2.65×)  ⌈log₂ depth⌉ rounds fixed, rows 10×
  *   etl_hierarchy_path  3.81 →  9.82 s  (2.58×)
  *   etl_subtree_agg     4.59 → 13.06 s  (2.84×)  closure rows 10×, join/agg linear
  *   j_salted            1.91 →  9.61 s  (5.04×)  the only data-dominated one: genuine
  *                                                 10× shuffle volume, ×salt replication
  *   llm_ingest_incr     2.54 →  4.25 s  (1.68×)  batch×corpus cross-banding, never old×old
  *   e11_rfm             1.26 →  2.53 s  (2.00×)  post-rewrite run: three composite-key
  *                                                 range-partitioned ranks, no one-task sort
  *
  * Re-measured after the globalRank soundness checkpoint (the eager
  * localCheckpoint pinning the double-consumed bucketed frame): curves
  * stay sublinear — etl_hierarchy 3.05 → 8.10 s (2.65×),
  * etl_hierarchy_path 3.06 → 10.25 s (3.35×), etl_subtree_agg
  * 4.01 → 11.63 s (2.90×), e11_rfm 2.32 → 4.37 s (1.88×). The
  * checkpoint's cost is itself linear in the ranked frame, so it moves
  * constants, not the shape.
  *
  * Round-11 run (same protocol, idle host, after the fused-SimHash and
  * batch-sized-extend rewrites) — every probe sublinear again, and the
  * round's additions measured for the first time:
  *
  *   etl_hierarchy_incr       5.96 → 10.53 s (1.77×)  day-1 build + extend;
  *   etl_hierarchy_path_incr  7.20 → 13.23 s (1.84×)   flatter than the full
  *                                                      rebuilds (2.40×/3.35×)
  *                                                      even though the fixture
  *                                                      batch GROWS with the
  *                                                      corpus — the one-semi-
  *                                                      join + batch-sized-loop
  *                                                      design showing up
  *   e2_label_prop            2.55 →  2.90 s (1.14×)  3 rounds over stationary-
  *                                                      density LSH graph
  *   e2_ppr                   2.66 →  3.51 s (1.32×)  4 integer iterations
  *   e2_sssp                  1.47 →  3.04 s (2.07×)  sparse frontier tracks
  *                                                      reached subgraph
  *
  * Round-14 point (same protocol, idle host):
  *
  *   e3_knn_graph             3.71 →  5.60 s (1.51×)  NN-Descent (ring
  *                                                      init), fixed 2
  *                                                      rounds, O(N·k²)
  *                                                      candidates/round
  *   e3_semdedup_graph        4.74 →  5.38 s (1.13×)  graph build + gated
  *                                                      driver union-find
  *   e3_graph_search          5.14 →  6.28 s (1.22×)  build + 2-hop beam:
  *                                                      hop work is query-
  *                                                      side bounded, so
  *                                                      10× corpus moves
  *                                                      only the build leg
  *   e3_knn_graph_incr        7.67 → 15.96 s (2.08×)  day-1 build + fold:
  *                                                      the fixture batch
  *                                                      (20 % of corpus)
  *                                                      GROWS with volume,
  *                                                      matching the
  *                                                      hierarchy-incr curve
  *
  * Round-15 re-measurement (same protocol, idle host) after the
  * rank-stripe + 4-ring init and the terminal-cut contract — all
  * sublinear, and the operator-derived-entry search measured for the
  * first time:
  *
  *   e3_knn_graph             4.80 →  6.43 s (1.34×)
  *   e3_semdedup_graph        5.03 →  6.74 s (1.34×)
  *   e3_graph_search          5.77 →  7.50 s (1.30×)
  *   e3_graph_search_auto     5.87 →  8.85 s (1.51×)  entry derivation
  *                                                      adds one bounded
  *                                                      per-ring aggregate
  *                                                      over the corpus
  *   e3_knn_graph_incr        6.63 → 14.54 s (2.19×)  growing-batch grade;
  *                                                      the FIXED-batch fold
  *                                                      is FLAT (ProbeFold:
  *                                                      4.56 → 3.99 s)
  *
  * Conclusion: at sf0.1 the iterative tier is fixed-cost-dominated
  * (stage scheduling, checkpoints, codebook/index contracts); the
  * data-dominated path (j_salted) is plainly linear in shuffle volume.
  * No query bends worse than linear×log — the 100 TB design claims
  * hold as measured, not just argued.
  */
object ProbeScale {
  private val Alpha = "abcdefghijklmnopqrstuvwxyz"
  private def rot(i: Int): String = {
    val r = i % 26
    Alpha.drop(r) + Alpha.take(r)
  }

  private val dims = Seq("region", "nation", "supplier", "part")
  private val facts = Seq("customer", "orders", "lineitem", "events",
    "documents", "embeddings")

  private def span(spark: SparkSession, srcDir: String, table: String,
                   key: String): Long =
    spark.read.parquet(s"$srcDir/$table.parquet")
      .agg(max(col(key))).collect()(0).getLong(0) + 1L

  /** Copy `i` of one table, keys shifted and content decorrelated. */
  private def copyOf(df: DataFrame, table: String, i: Int,
                     spans: Map[String, Long]): DataFrame = {
    def sh(c: String, sp: Long): Column = (col(c) + lit(sp * i)).as(c)
    def tr(c: String): Column = translate(col(c), Alpha, rot(i)).as(c)
    table match {
      case "customer" => df.select(sh("c_custkey", spans("customer")),
        tr("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      case "orders" => df.select(sh("o_orderkey", spans("orders")),
        sh("o_custkey", spans("customer")), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
      case "lineitem" => df.select(sh("l_orderkey", spans("orders")),
        col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
      case "events" => df.select(sh("event_id", spans("events")), col("ts"),
        sh("user_id", spans("events_user")), col("event_type"), col("value"),
        col("props"))
      case "documents" => df.select(sh("doc_id", spans("documents")),
        tr("text"), col("lang"), col("source"), col("n_chars"))
      case "embeddings" =>
        val emb =
          if (i == 0) col("embedding")
          else transform(col("embedding"), (x, j) =>
            (x * when(pmod(j * 40503 + lit(i * 2654435), lit(2)) === 0, 1.0f)
              .otherwise(-1.0f)).cast("float"))
        df.select(sh("vec_id", spans("embeddings")), emb.as("embedding"),
          col("label"))
      case _ => df
    }
  }

  def replicate(spark: SparkSession, srcDir: String, dstDir: String,
                k: Int): Unit = {
    val spans = Map(
      "customer" -> span(spark, srcDir, "customer", "c_custkey"),
      "orders" -> span(spark, srcDir, "orders", "o_orderkey"),
      "events" -> span(spark, srcDir, "events", "event_id"),
      "events_user" -> span(spark, srcDir, "events", "user_id"),
      "documents" -> span(spark, srcDir, "documents", "doc_id"),
      "embeddings" -> span(spark, srcDir, "embeddings", "vec_id"))
    dims.foreach { t =>
      spark.read.parquet(s"$srcDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$dstDir/$t.parquet")
    }
    facts.foreach { t =>
      val df = spark.read.parquet(s"$srcDir/$t.parquet")
      (0 until k).map(i => copyOf(df, t, i, spans))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dstDir/$t.parquet")
    }
  }

  /** The heaviest graded queries per BENCH_r08 + the verdict's named
    * set: incremental CC, entity res, the hierarchy trio, the LSH tier.
    */
  private val probes: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    ("e2_minhash", graft.Queries.e2_minhash _),
    ("e2_dedup_clusters", graft.Queries.e2_dedup_clusters _),
    ("e2_simhash_scalable", graft.Queries.e2_simhash_scalable _),
    ("e2_cc_incremental", graft.Queries.e2_cc_incremental _),
    ("etl_entity_res", graft.Queries.etl_entity_res _),
    ("etl_hierarchy", graft.Queries.etl_hierarchy _),
    ("etl_hierarchy_path", graft.Queries.etl_hierarchy_path _),
    ("etl_subtree_agg", graft.Queries.etl_subtree_agg _),
    ("j_salted", graft.Queries.j_salted _),
    ("llm_ingest_incr", graft.Queries.llm_ingest_incr _),
    ("e11_rfm", graft.Queries.e11_rfm _),
    // round-11 additions: the incremental hierarchy twins and graph tier
    ("etl_hierarchy_incr", graft.Queries.etl_hierarchy_incr _),
    ("etl_hierarchy_path_incr", graft.Queries.etl_hierarchy_path_incr _),
    ("e2_label_prop", graft.Queries.e2_label_prop _),
    ("e2_ppr", graft.Queries.e2_ppr _),
    ("e2_sssp", graft.Queries.e2_sssp _),
    // round-14 additions: the NN-Descent kNN graph and its consumers
    ("e3_knn_graph", graft.Queries.e3_knn_graph _),
    ("e3_semdedup_graph", graft.Queries.e3_semdedup_graph _),
    ("e3_graph_search", graft.Queries.e3_graph_search _),
    ("e3_knn_graph_incr", graft.Queries.e3_knn_graph_incr _),
    // round-15 addition: operator-derived entry points
    ("e3_graph_search_auto", graft.Queries.e3_graph_search_auto _))

  /** The worst shuffle-heavy probes, re-run under MEMORY PRESSURE
    * (round-10 verdict item 7): `spark.memory.fraction` shrunk 0.6 → 0.05
    * so the execution pool that normally absorbs the whole sort/agg
    * working set can't, and the spill path (UnsafeExternalSorter →
    * disk) actually runs — the regime a 100 TB shuffle partition lives
    * in, which the comfortable 128 GiB local heap otherwise never
    * exercises. A SparkListener accumulates task memory/disk spill
    * bytes, so the probe both proves the spill happened (bytes > 0, not
    * just slower wall time) and measures the degradation factor.
    *
    * Usage: runMain graft.tools.ProbeSpill [dataDir] [memoryFraction]
    * (default /tmp/graft-scale/x10 — built on demand — and 0.05).
    *
    * MEASURED round 11 (x10 = sf1-equivalent volume, local[32], same
    * host back to back; fraction 0.6 = Spark default, 0.05 = pressure):
    *
    *   etl_subtree_agg  16.98 s (no spill) -> 23.01 s under pressure,
    *                    memSpill 1560 MiB, diskSpill 228 MiB: the
    *                    closure join/agg genuinely overflows the shrunk
    *                    pool, UnsafeExternalSorter spills to disk, and
    *                    the query completes correct at 1.36x — the
    *                    spill path is exercised and sane, not assumed.
    *   j_salted         12.54 s -> 20.93 s, zero spill bytes either
    *                    way: the salted partial aggregates flush at
    *                    fixed fan-in, so pressure shrinks batch sizes
    *                    (1.7x slowdown) but never accumulates a
    *                    spillable working set — the design outcome of
    *                    salting (bounded per-task state), confirmed
    *                    under a 12x smaller execution pool.
    */
  def spillProbe(spark: SparkSession, dir: String): Unit = {
    val spilled = new java.util.concurrent.atomic.AtomicLong
    val spilledDisk = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spilled.addAndGet(m.memoryBytesSpilled)
          spilledDisk.addAndGet(m.diskBytesSpilled)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    Seq(("j_salted", graft.Queries.j_salted _),
        ("etl_subtree_agg", graft.Queries.etl_subtree_agg _))
      .foreach { case (name, f) =>
        spilled.set(0); spilledDisk.set(0)
        val t0 = System.nanoTime()
        val n = f(spark, dir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        graft.Blocks.sweep(spark.sparkContext)
        println(f"[spill] $name%-18s $secs%7.2f s  rows=$n  " +
          f"memSpill=${spilled.get / (1 << 20)}%d MiB  " +
          f"diskSpill=${spilledDisk.get / (1 << 20)}%d MiB")
      }
    spark.sparkContext.removeSparkListener(listener)
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = args.drop(1).headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 3, 10))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // heap comes from build.sbt's forked-run -Xmx (SPARK_DRIVER_MEM,
    // default 8g) — setting spark.driver.memory on an already-running
    // local JVM is a no-op (r15 advice item 5)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id * 2)").collect()

    val results = scala.collection.mutable.Map
      .empty[(String, Int), Double]
    scales.foreach { k =>
      val dir = s"/tmp/graft-scale/x$k"
      if (!new java.io.File(s"$dir/documents.parquet").exists()) {
        println(s"[scale] building $dir (k=$k) ...")
        replicate(spark, srcDir, dir, k)
      }
      val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
        .map(_.split(",").toSet)
      probes.filter(p => only.forall(_(p._1))).foreach { case (name, f) =>
        val reps = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val n = f(spark, dir).count()
          graft.Blocks.sweep(spark.sparkContext)
          System.gc()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val best = reps.map(_._1).min
        results((name, k)) = best
        println(f"[scale] x$k%-3d $name%-22s min=$best%7.2f s  rows=${reps.head._2}")
      }
    }
    val k0 = scales.head
    val kN = scales.last
    println(f"\n[scale] ===== curve (${kN}x vs ${k0}x; linear bar = ${kN.toDouble / k0}%.1f) =====")
    probes.filter(p => results.contains((p._1, k0))).foreach { case (name, _) =>
      val a = results((name, k0)); val b = results((name, kN))
      val ratio = b / a
      val verdict =
        if (ratio <= kN.toDouble / k0 * 1.35) "OK (<= ~linear)"
        else "SUPRALINEAR - investigate"
      println(f"[scale] $name%-22s ${a}%6.2f -> ${b}%6.2f s  ratio=$ratio%5.2f  $verdict")
    }
    spark.stop()
  }
}

/** Memory-pressure twin of [[ProbeScale]] — its own main because
  * `spark.memory.fraction` is fixed at SparkContext creation. See
  * [[ProbeScale.spillProbe]].
  */
object ProbeSpill {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-scale/x10")
    val fraction = args.drop(1).headOption.getOrElse("0.05")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.memory.fraction", fraction)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.Graft.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id * 2)").collect()
    if (!new java.io.File(s"$dir/documents.parquet").exists()) {
      println(s"[spill] building $dir (k=10) ...")
      ProbeScale.replicate(spark, "/root/testdata/sf0.1", dir, 10)
    }
    ProbeScale.spillProbe(spark, dir)
    spark.stop()
  }
}
