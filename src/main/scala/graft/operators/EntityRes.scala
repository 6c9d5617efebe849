package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked entity resolution over structured records — the MDM/ETL
  * workload (one physical customer behind several near-identical rows):
  * blocking → bounded pairwise scoring → threshold → connected
  * components → canonical survivor. The reference's star-schema ETL
  * (FullETLGenerator.java:56-138) dedups dimensions by EXACT composite
  * key; this is the fuzzy tier above it.
  *
  * Scale shape: candidates are generated ONLY within a block (the
  * equi-join on `blockCols`), so all-pairs is never formed — pair count
  * is Σ b² over block sizes, bounded by the blocking-key design, and the
  * join shuffles each side once on the block key (a hot block is a skew
  * key: salt it or tighten the key, same remedy as any skewed join).
  * Scoring is a codegen'd per-row expression (levenshtein + scaled
  * numeric distance — no UDF); entity ids come from the min-label
  * components pass (O(diameter) rounds; duplicate clusters are shallow
  * by construction, so 2-3 rounds in practice — switch to
  * [[Components.largeStarSmallStar]] if a pathological chain appears).
  *
  * Cross-engine determinism: levenshtein is an exact integer, the score
  * is a fixed chain of IEEE double ops rounded to 6 dp, ties cannot
  * occur in component labels (min over exact longs), and the canonical
  * survivor is the MIN record id per entity — no RNG, no
  * order-dependence anywhere.
  */
object EntityRes {

  /** Pairwise candidates within blocks, scored
    * `nameWeight·(1 − lev/nameDenom) + (1−nameWeight)·(1 − min(|Δnum|/numScale, 1))`,
    * kept at `score ≥ threshold`. Columns: id1, id2, score.
    */
  def candidatePairs(records: DataFrame, idCol: String,
                     blockCols: Seq[String], nameCol: String,
                     numCol: String, nameDenom: Double, numScale: Double,
                     nameWeight: Double, threshold: Double,
                     roundTo: Int = 6): DataFrame = {
    def side(tag: String) = records.select(
      Seq(col(idCol).as(s"id$tag"), col(nameCol).as(s"n$tag"),
        col(numCol).as(s"v$tag")) ++
        blockCols.map(c => col(c).as(s"b${tag}_$c")): _*)
    val (left, right) = (side("1"), side("2"))
    val nameSim = lit(1.0) -
      levenshtein(col("n1"), col("n2")).cast("double") / lit(nameDenom)
    val numSim = lit(1.0) -
      least(abs(col("v1") - col("v2")) / lit(numScale), lit(1.0))
    left.join(right, blockCols.map(c => col(s"b1_$c") === col(s"b2_$c"))
        .reduce(_ && _) && col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(lit(nameWeight) * nameSim + lit(1.0 - nameWeight) * numSim,
          roundTo).as("score"))
      .filter(col("score") >= threshold)
  }

  /** Full resolution: candidate pairs → min-label components → entity
    * ids with member counts and the canonical-survivor flag.
    * Columns: `idCol`, entity_id, is_canonical, n_members.
    */
  def resolve(records: DataFrame, idCol: String, blockCols: Seq[String],
              nameCol: String, numCol: String, nameDenom: Double,
              numScale: Double, nameWeight: Double,
              threshold: Double): DataFrame = {
    val pairs = candidatePairs(records, idCol, blockCols, nameCol, numCol,
      nameDenom, numScale, nameWeight, threshold).select("id1", "id2")
    val ent = Components.minLabel(pairs, "id1", "id2",
        records.select(idCol), idCol)
      .select(col("id").as(idCol), col("comp").as("entity_id"))
    val sizes = ent.groupBy("entity_id").agg(count(lit(1)).as("n_members"))
    ent.join(sizes, "entity_id")
      .select(col(idCol), col("entity_id"),
        (col(idCol) === col("entity_id")).cast("int").as("is_canonical"),
        col("n_members"))
  }
}
