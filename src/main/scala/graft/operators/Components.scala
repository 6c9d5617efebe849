package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the clustering step between
  * near-dup PAIR generation (MinHash/SimHash/embedding) and survivor
  * selection: duplicates are transitive (A~B, B~C => one cluster), so a
  * dedup pipeline keeps one representative per COMPONENT, not per pair.
  *
  * Algorithm: min-label propagation. Every node starts labelled with its
  * own id; each round every node takes the min of its own and its
  * neighbours' labels; fixpoint = every node carries the min id of its
  * component. Each round is one join + one map-side-combined min
  * aggregation (both hash-partitioned on id), and lineage is cut per
  * round with a localCheckpoint, so the plan stays flat at any iteration
  * count. Rounds needed = graph diameter — near-dup graphs are unions of
  * small dense clusters, so this converges in a handful of rounds. (For
  * adversarially long path graphs the two-phase large-star/small-star
  * algorithm halves the diameter per round; the round structure below is
  * the same and the swap is local.)
  *
  * The per-round driver `count()` is the convergence check of an
  * iterative algorithm, not a data collect — each round's work is fully
  * distributed.
  */
object Components {

  /** `edges`: (srcCol, dstCol) undirected pairs; `nodes`: (idCol) the
    * full vertex set (vertices without edges become singleton
    * components). Returns (id, comp) where comp = min id in the
    * component.
    */
  def minLabel(edges: DataFrame, srcCol: String, dstCol: String,
               nodes: DataFrame, idCol: String, maxIter: Int = 50): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // persist (not checkpoint): read every round, released on exit —
    // Dataset.unpersist works for persists, so no block can leak.
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    var labels = nodes.select(col(idCol).as("id"))
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val srcLbl = labels.select(col("id").as("src"), col("comp").as("srcComp"))
      val nbrMin = sym.join(srcLbl, "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("srcComp")).as("nbrComp"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbrComp"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      changed = next
        .join(labels.select(col("id"), col("comp").as("prev")), "id")
        .filter(col("comp") < col("prev"))
        .count()
      // the superseded round's checkpoint blocks are dead the moment
      // `changed` is computed — free them NOW, don't wait for GC
      // (round 2 leaked one block per round per invocation).
      graft.Blocks.free(labels)
      labels = next
      iter += 1
    }
    sym.unpersist()
    // the returned frame stays checkpoint-backed (its rounds of lineage
    // are gone); callers that fully consume it can graft.Blocks.free it.
    labels
  }
}
