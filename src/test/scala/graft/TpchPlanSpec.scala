package graft

/** Physical-plan pins for the TPC-H decorrelation tier (round-7 verdict
  * item 4): the correlated shapes must plan as joins — never a per-row
  * subquery probe — and the small sides must broadcast. If Catalyst's
  * decorrelation or the broadcast sizing regresses, these fail before
  * any timing does.
  */
class TpchPlanSpec extends SparkSpec {

  private def executed(name: String): String = {
    val fn = Queries.all.find(_._1 == name).get._2
    val df = fn(spark, "/root/testdata/sf0.001")
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("Q17: correlated scalar avg decorrelates to aggregate + join-back") {
    val p = executed("sql_tpch_q17")
    // the per-partkey avg runs ONCE as an aggregate and joins back —
    // no subquery node survives into the physical plan
    assert(!p.contains("Subquery"), s"per-row subquery survived:\n$p")
    assert(p.contains("BroadcastHashJoin"), "dim/aggregate sides should broadcast")
    assert(p.contains("avg(l_quantity"), "the decorrelated aggregate must exist")
  }

  test("Q21: EXISTS / NOT EXISTS chain decorrelates to semi + anti joins") {
    val p = executed("sql_tpch_q21")
    assert(p.contains("LeftSemi"), "EXISTS must become a left-semi join")
    assert(p.contains("LeftAnti"), "NOT EXISTS must become a left-anti join")
    assert(!p.contains("Subquery"), s"per-row subquery survived:\n$p")
    assert(p.contains("BroadcastHashJoin"), "supplier/nation dims should broadcast")
  }

  test("Q20: nested IN + correlated scalar decorrelates to stacked semi joins") {
    val p = executed("sql_tpch_q20")
    assert(p.contains("LeftSemi"), "both IN levels must become semi joins")
    assert(!p.contains("Subquery"), s"per-row subquery survived:\n$p")
    assert(p.contains("avg(l_quantity"), "the correlated avg must run as an aggregate")
  }

  test("Q22: scalar subquery executes once, anti join for the no-orders gate") {
    val p = executed("sql_tpch_q22")
    // the global avg IS a scalar subquery — but an uncorrelated one,
    // executed once (Subquery scalar-subquery), never per row
    assert(p.contains("LeftAnti"))
  }

  test("Q2: correlated min over the CTE decorrelates to aggregate + join-back") {
    val p = executed("sql_tpch_q2")
    // the correlated min(ps_supplycost) must run as a per-partkey
    // aggregate joined back — no per-row probe of the CTE
    assert(p.contains("min(ps_supplycost"), "the decorrelated min must exist")
    assert(p.contains("BroadcastHashJoin"), "supplier/nation/region dims should broadcast")
  }

  test("Q6: all three range predicates reach the parquet scan") {
    val p = executed("sql_tpch_q6")
    // PushedFilters is elided ("...") in toString, so pin the DataFilters
    // Filter node text — every predicate the scan receives appears there
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"scan must advertise pushed filters:\n$p")
    assert("l_quantity#\\d+ < 24\\.0".r.findFirstIn(p).isDefined,
      s"quantity bound not at the scan:\n$p")
    assert("l_discount#\\d+ >= 0\\.05".r.findFirstIn(p).isDefined,
      s"discount range not at the scan:\n$p")
  }

  test("Q16: NOT IN becomes an anti join, never a per-row probe") {
    val p = executed("sql_tpch_q16")
    assert(p.contains("LeftAnti"), "NOT IN must become a (null-aware) anti join")
    assert(p.contains("BroadcastHashJoin") || p.contains("Broadcast"),
      "the 100-row supplier exclusion set should broadcast")
  }

  test("Q13: the priority filter stays in the outer join, zero-order customers survive") {
    val fn = Queries.all.find(_._1 == "sql_tpch_q13").get._2
    val df = fn(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    // every customer must survive the LEFT OUTER join — if the ON-clause
    // priority filter leaked to WHERE, urgent-only customers would drop
    // and the bucket counts would sum below the customer count (sf0.001
    // has no zero-order customer, so pin the sum, not the 0 bucket)
    val nCust = spark.read
      .parquet("/root/testdata/sf0.001/customer.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nCust,
      "customers were dropped — ON-clause filter leaked to WHERE")
  }

  test("Q15: the revenue CTE's max is an uncorrelated scalar executed once") {
    val p = executed("sql_tpch_q15")
    assert(p.contains("max(total_revenue"), "the max aggregate must exist")
    assert(!p.contains("CartesianProduct"), s"max gate must not cross-join:\n$p")
  }

  test("DS-Q67: rollup expands once, rank's top-100 limit pushes below the shuffle") {
    val p = executed("sql_tpcds_q67")
    assert(p.contains("Expand"), "ROLLUP must plan as one Expand, not a UNION of scans")
    assert(p.contains("partial_sum"), "the rollup aggregate must combine map-side")
    // the rank<=100 filter must become a WindowGroupLimit applied BOTH
    // partially (map side, before the rf shuffle) and finally — the
    // window never sees more than ~100 rows per partition per task
    assert(p.contains("WindowGroupLimit") && p.contains("100, Partial"),
      s"rank limit not pushed below the shuffle:\n$p")
    assert(p.contains("BroadcastHashJoin"), "orders side should broadcast")
    val scan = p.linesIterator.filter(_.contains("lineitem.parquet"))
      .mkString
    assert(scan.contains("l_quantity") && !scan.contains("l_extendedprice"),
      s"lineitem scan should prune to the 4 used columns: $scan")
  }

  test("DS-Q88: each band scan prunes and pushes its type filter; bands compose broadcast") {
    // the adaptive toString repeats the plan (Final + Initial) — count
    // within the finalized section only
    val p = executed("sql_tpcds_q88").split("== Initial Plan ==").head
    val scans = p.linesIterator.filter(_.contains("events.parquet")).toSeq
    assert(scans.size == 8, s"expected 8 band scans, got ${scans.size}")
    assert(scans.forall(_.contains("In(event_type")),
      "the type filter must push into every scan")
    assert(scans.forall(s => s.contains("ReadSchema: struct<ts:")
        && !s.contains("props")),
      "every scan must prune to (ts, event_type)")
    // eight single-row results compose via broadcast nested-loop joins —
    // never a shuffled join of scalar frames
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) == 7,
      s"expected 7 scalar-row joins:\n$p")
  }

  test("DS-Q14: the INTERSECT CTE plans once and is exchange-reused by every other consumer") {
    val p = executed("sql_tpcds_q14").split("== Initial Plan ==").head
    // the INTERSECT chain becomes two null-safe left-semi joins — never
    // a per-row probe — and exists ONCE in the physical tree
    assert(p.linesIterator.count(_.contains("LeftSemi")) == 2,
      s"INTERSECT must plan as exactly two semi joins (one subtree):\n$p")
    // consumers 2 and 3 reuse consumer 1's broadcast of the CTE — the
    // fan-out does not multiply the intersection work
    assert(p.linesIterator.count(_.contains("ReusedExchange")) >= 2,
      s"cross_users must be exchange-reused across consumers:\n$p")
    // every branch scan pushes its channel filter and prunes
    val scans = p.linesIterator.filter(_.contains("events.parquet")).toSeq
    assert(scans.forall(s => s.contains("EqualTo(event_type")
        || s.contains("In(event_type")),
      "the channel filter must push into every scan")
    assert(scans.forall(!_.contains("props")),
      "every scan must prune the unused wide columns")
    // the avg_sales gate is a single-row broadcast, not a shuffle
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the scalar gate must compose as a broadcast of one row")
  }

  test("DS-Q95: the shared CTE's self-join plans once across both semi-join consumers") {
    val p = executed("sql_tpcds_q95").split("== Initial Plan ==").head
    // both INs decorrelate to semi joins; no per-row probe
    assert(p.linesIterator.count(_.contains("LeftSemi")) == 2,
      s"both INs must plan as semi joins:\n$p")
    assert(!p.contains("Subquery"), s"per-row subquery survived:\n$p")
    // the multi_supp self-join subtree is planned once and its exchange
    // reused by the second consumer — the CTE fan-out does not multiply
    // the fact self-join
    assert(p.contains("ReusedExchange"),
      s"multi_supp must be exchange-reused across the two consumers:\n$p")
    // status/returnflag filters reach their scans
    val scans = p.linesIterator.filter(_.contains("FileScan")).toSeq
    assert(scans.exists(_.contains("EqualTo(o_orderstatus,F)")),
      "the order-status filter must push into the orders scan")
    assert(scans.exists(_.contains("EqualTo(l_returnflag,R)")),
      "the returns filter must push into its lineitem scan")
  }

  test("DS-Q4: each year_total consumer prunes to its (year, channel) slice at its scan") {
    val fn = Queries.all.find(_._1 == "sql_tpcds_q4").get._2
    val df = fn(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("Subquery"), s"per-row subquery survived:\n$p")
    // the consumers select on the CTE's GROUP KEYS, so the right plan
    // is NOT exchange reuse of one superset aggregate (the Q14/Q95
    // discipline) but four INLINED consumers, each with its (year,
    // channel) gate pushed below the aggregate into its own scan —
    // quarter-slice scans that partition-prune on a date-laid-out fact
    val scans = p.linesIterator.filter(_.contains("orders.parquet")).toSeq
    assert(scans.size == 4,
      s"year_total must inline into four pruned consumers:\n$p")
    assert(scans.forall(_.contains("In(o_orderstatus")),
      s"the channel filter must push into every orders scan:\n$p")
    assert(scans.forall(!_.contains("o_comment")),
      "every scan must prune the unused wide columns")
    // per-consumer gates sit below the aggregates in the optimized plan
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.sliding(20).count(_.startsWith("(o_orderstatus")) >= 4
        || opt.linesIterator.count(_.contains("o_orderstatus")) >= 4,
      s"each consumer must carry its own channel gate:\n$opt")
    // the four year_total slices are small aggregates: the self-join
    // chain must broadcast, never sort-merge
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) == 3,
      s"the four-way self-join must be three broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "aggregate slices must broadcast, not sort-merge")
  }

  test("DS-Q23: the CTE chain's gates broadcast into one final aggregate") {
    val p = executed("sql_tpcds_q23").split("== Initial Plan ==").head
    // the distinct-date HAVING expands to the standard two-level
    // distinct aggregate (no per-row subquery anywhere in the chain)
    assert(p.contains("count(distinct"),
      "freq_users must plan the distinct-date count as an aggregate")
    assert(!p.contains("Subquery"), s"per-row subquery survived:\n$p")
    // max-over-CTE: one single-row max broadcast into the 0.5*mx gate
    assert(p.contains("functions=[max(sales"),
      "max_sales must run once as its own aggregate")
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) == 1,
      s"the max gate must be one scalar broadcast join:\n$p")
    // both CTE gates reach the final view aggregate as broadcast hash
    // joins; every scan pushes its type filter
    assert(p.contains("BroadcastHashJoin"),
      "freq/best gates must broadcast into the final aggregate")
    val scans = p.linesIterator.filter(_.contains("events.parquet")).toSeq
    assert(scans.nonEmpty && scans.forall(_.contains("EqualTo(event_type")),
      "the type filter must push into every scan")
  }
}
