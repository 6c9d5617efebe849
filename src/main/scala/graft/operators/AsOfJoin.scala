package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, attach the latest right row
  * with `right.ts <= left.ts` within the same key — the standard
  * time-series enrichment operator (Spark has no built-in; this is the
  * union+window formulation).
  *
  * Execution: tag both sides, union, ONE shuffle on the key, sort by
  * (ts, side) per key, then `last(..., ignoreNulls)` over the preceding
  * frame propagates the most recent right-side values onto left rows.
  * No range-explosion, no per-row probe: O((|L|+|R|) log) per key.
  *
  * Scale: this beats the broadcast-probe formulation whenever the right
  * side is large; both sides shuffle once on the key and windows run
  * per-key in parallel. Skewed keys behave like any window — pre-split
  * hot keys or bound right-side history if a key's timeline is huge.
  *
  * Requirement for determinism: at most one right row per (key, ts) —
  * pre-aggregate the right side to that grain (the caller chooses the
  * survivor rule, e.g. max of a tiebreak column).
  */
object AsOfJoin {

  /** `left` must carry (keyCol, tsCol, ...); `right` (keyCol, tsCol,
    * rightVals...). Result = left columns + rightVals (null when no right
    * row precedes). All right value columns must not collide with left's.
    *
    * The right values travel as ONE struct through a single
    * `last(ignoreNulls)` window, so the matched row's values arrive
    * TOGETHER — including its NULLs (DuckDB ASOF semantics). Propagating
    * each value column independently (round-1 formulation) silently mixed
    * columns from different right rows whenever the latest right row had a
    * NULL in one of them. One window pass instead of |rightVals| is also
    * the cheaper plan.
    */
  /** Native-plan variant of [[backward]]: same contract and results, but
    * planned as `graft.plans.AsOfJoinExec` — a streaming merge over
    * key-clustered (key, ts)-sorted children, O(|L|+|R|) per partition
    * with a single retained candidate row instead of window buffers.
    * Registers the strategy/rule/marker function idempotently on the
    * session, so it works without `spark.sql.extensions` config.
    *
    * PERFORMANCE (round-7 root cause of the "2.6x slower" record): when
    * the joined VALUES are consumed, this operator WINS — measured
    * 0.70 s vs 0.98 s for [[backward]] at sf0.1 local[32] min-of-3
    * under full-output materialization (ProbeAsOf4). The bench's
    * `.count()` protocol undertimes [[backward]] specifically: its
    * post-union filter touches only the side tag, so column pruning
    * deletes the entire Window+Union tail and count() measures a bare
    * scan (stage metrics: ~0 shuffled records). AsOfJoinExec's join
    * condition genuinely needs both sides, so the native plan pays its
    * full cost under count() — the two bench numbers were never
    * measuring the same work. NativeAsOfSpec pins the pruning artifact.
    */
  def nativeBackward(left: DataFrame, right: DataFrame, keyCol: String,
                     tsCol: String, rightVals: Seq[String]): DataFrame =
    native(left, right, keyCol, tsCol, rightVals, forward = false)

  /** Forward as-of: EARLIEST right row with `right.ts >= left.ts` per
    * key — "the next event after": time-to-next-purchase, next
    * maintenance after a failure. Same native plan, mirrored merge.
    */
  def nativeForward(left: DataFrame, right: DataFrame, keyCol: String,
                    tsCol: String, rightVals: Seq[String]): DataFrame =
    native(left, right, keyCol, tsCol, rightVals, forward = true)

  /** NEAREST as-of within a tolerance: for each left row, the right row
    * minimizing |right.ts − left.ts| among rows at most `maxGapMs`
    * away, ties broken BACKWARD (the past match wins — deterministic,
    * and the causal default). The alignment shape backward/forward
    * alone can't express: sensor readings matched to the closest
    * calibration, an error to its closest purchase either side.
    *
    * Planned as the composition of the two native O(|L|+|R|) merges
    * ([[nativeBackward]] then [[nativeForward]] over its output — the
    * second merge re-sorts the same key clustering, so both ride one
    * exchange) plus one narrow per-row projection choosing the closer
    * side; no window buffers, no extra shuffle. Either side's match
    * outside the tolerance is discarded exactly as if absent; rows with
    * no admissible match keep null values.
    */
  def nearestWithin(left: DataFrame, right: DataFrame, keyCol: String,
                    tsCol: String, rightVals: Seq[String],
                    maxGapMs: Long): DataFrame = {
    require(maxGapMs >= 0, "maxGapMs must be >= 0")
    val leftCols = left.columns.toSeq
    val r2 = right.withColumn("__ats",
      col(tsCol).cast(left.schema(tsCol).dataType))
    val vals = rightVals :+ "__ats"
    val b = nativeBackward(left, r2, keyCol, tsCol, vals)
    val bRen = rightVals.foldLeft(b)((d, v) =>
      d.withColumnRenamed(v, s"__b_$v")).withColumnRenamed("__ats", "__bts")
    val f = nativeForward(bRen, r2, keyCol, tsCol, vals)
    val fRen = rightVals.foldLeft(f)((d, v) =>
      d.withColumnRenamed(v, s"__f_$v")).withColumnRenamed("__ats", "__fts")
    val lms = unix_millis(col(tsCol))
    val bgap = lms - unix_millis(col("__bts"))
    val fgap = unix_millis(col("__fts")) - lms
    val bOk = col("__bts").isNotNull && bgap <= maxGapMs
    val fOk = col("__fts").isNotNull && fgap <= maxGapMs
    // false && null = false, so both gates are two-valued even when a
    // side is unmatched; the second when() fires only when backward
    // lost or was inadmissible
    val useB = bOk && (!fOk || bgap <= fgap)
    fRen.select(leftCols.map(col) ++ rightVals.map(v =>
      when(useB, col(s"__b_$v"))
        .when(fOk, col(s"__f_$v")).as(v)): _*)
  }

  /** Least common WIDENING type for a join-key pair — mirrors upstream
    * join coercion (both sides widen; nothing narrows). Casting the right
    * key down to a narrower left type would truncate silently with ANSI
    * off (bigint 2^32+1 matching int 1); differing non-widenable types are
    * an error, not a guess.
    */
  private def widerOf(a: org.apache.spark.sql.types.DataType,
                      b: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    // the standard SQL numeric promotion ladder (same order upstream
    // TypeCoercion uses for binary ops)
    val ladder: Map[DataType, Int] = Map(
      ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4,
      FloatType -> 5, DoubleType -> 6)
    if (a == b) a
    else (a, b) match {
      case _ if ladder.contains(a) && ladder.contains(b) =>
        if (ladder(a) >= ladder(b)) a else b
      case (DateType, TimestampType) | (TimestampType, DateType) =>
        TimestampType
      case (DateType, TimestampNTZType) | (TimestampNTZType, DateType) =>
        TimestampNTZType
      // tz'd vs ntz timestamps are the same width (no narrowing possible);
      // the LEFT clock's interpretation wins, as documented on
      // backwardWithin (ntz dim dates joined to utc event streams)
      case (TimestampType, TimestampNTZType) |
           (TimestampNTZType, TimestampType) => a
      case _ => throw new IllegalArgumentException(
        s"as-of join columns have incompatible types $a vs $b — " +
          "cast one side explicitly")
    }
  }

  private def native(left: DataFrame, right: DataFrame, keyCol: String,
                     tsCol: String, rightVals: Seq[String],
                     forward: Boolean): DataFrame = {
    graft.plans.AsOfJoinPlan.ensureRegistered(left.sparkSession)
    val fn = if (forward) "graft_asof_fwd" else "graft_asof"
    // cast BOTH sides' join columns to their least common WIDER type: a
    // key-type mismatch (int vs bigint) would otherwise hash-partition
    // the two sides differently AND make the merge's ordering misread the
    // right key bytes — silently all-null matches instead of an analysis
    // error. Widening both (not casting right down to left) keeps a wide
    // right key from truncating into a false match.
    val kt = widerOf(left.schema(keyCol).dataType, right.schema(keyCol).dataType)
    val tt = widerOf(left.schema(tsCol).dataType, right.schema(tsCol).dataType)
    val r2 = right.select(
      col(keyCol).cast(kt).as("__rk") +:
        col(tsCol).cast(tt).as("__rt") +:
        rightVals.map(col): _*)
    // When the left columns already have the wide types, join on them
    // DIRECTLY — a fresh `__lk` alias would be a new attribute, so a
    // second merge over this output (the nearest-join composition)
    // could not see that it is already hash-partitioned and sorted by
    // the same key and would re-exchange + re-sort the whole stream.
    val bareLeft = left.schema(keyCol).dataType == kt &&
      left.schema(tsCol).dataType == tt &&
      !rightVals.contains(keyCol) && !rightVals.contains(tsCol)
    if (bareLeft)
      left.join(r2, expr(s"$fn(`$keyCol`, __rk, `$tsCol`, __rt)"), "left_outer")
        .drop("__rk", "__rt")
    else
      left.withColumn("__lk", col(keyCol).cast(kt))
        .withColumn("__lt", col(tsCol).cast(tt))
        .join(r2, expr(s"$fn(__lk, __rk, __lt, __rt)"), "left_outer")
        .drop("__lk", "__lt", "__rk", "__rt")
  }

  /** Backward as-of with a TOLERANCE (the max-lag dial every production
    * as-of deployment has): the latest right row with `rt <= lt` still
    * matches only if it is at most `maxLagMs` old at the left row's
    * time — staler matches become nulls, exactly as if no right row
    * preceded. Same one-shuffle union+window plan as [[backward]]; the
    * matched row's own timestamp rides inside the value struct and the
    * lag check is a final narrow projection.
    */
  def backwardWithin(left: DataFrame, right: DataFrame, keyCol: String,
                     tsCol: String, rightVals: Seq[String],
                     maxLagMs: Long): DataFrame = {
    require(maxLagMs >= 0, "maxLagMs must be >= 0")
    val leftCols = left.columns.toSeq
    // cast to the left clock's type (e.g. ntz dim dates vs utc events):
    // the union coerces the SORT key automatically but struct-carried
    // values keep their type, and unix_millis needs a utc timestamp
    val r2 = right.withColumn("__rts",
      col(tsCol).cast(left.schema(tsCol).dataType))
    val joined = backward(left, r2, keyCol, tsCol, rightVals :+ "__rts")
    val fresh = unix_millis(col(tsCol)) - unix_millis(col("__rts")) <=
      maxLagMs
    joined.select(leftCols.map(col) ++ rightVals.map(c =>
      when(fresh, col(c)).otherwise(lit(null)).as(c)): _*)
  }

  def backward(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rvType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c)))
    val lTagged = left
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
    val rTagged = right
      .withColumn("__side", lit(0))
      .select((leftCols.map(c =>
        if (c == keyCol || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+ col("__side")) :+
        struct(rightVals.map(col): _*).as("__rv"): _*)
    // right rows sort BEFORE left rows at equal ts (side 0 < 1), so a
    // same-instant right row is visible to the left row (ts <= semantics).
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(c => col("__rv").getField(c).as(c)): _*)
  }
}
