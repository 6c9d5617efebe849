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
}
