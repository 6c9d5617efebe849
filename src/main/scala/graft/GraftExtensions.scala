package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{FloatVecDot, PortablePolyHash}

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions available to pure-SQL users.
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *   SELECT float_vec_dot(a.embedding, b.embedding) FROM ...
  *
  * (Column-API users get the same expressions from
  * graft.expressions.VectorFunctions without any session config.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.NativeDotRewrite)
    // native as-of join: marker rewrite + planner strategy + the SQL
    // constructors for both directions
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinPlan.AsOfMarkerRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinPlan.AsOfJoinStrategy)
    ext.injectFunction((
      new FunctionIdentifier("graft_asof"),
      new ExpressionInfo(
        graft.plans.AsOfJoinPlan.AsOfMarker.getClass.getName, "graft_asof"),
      (children: Seq[Expression]) => {
        require(children.length == 4, "graft_asof(lk, rk, lt, rt)")
        graft.plans.AsOfJoinPlan.AsOfMarker(
          children(0), children(1), children(2), children(3))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_asof_fwd"),
      new ExpressionInfo(
        graft.plans.AsOfJoinPlan.AsOfMarker.getClass.getName, "graft_asof_fwd"),
      (children: Seq[Expression]) => {
        require(children.length == 4, "graft_asof_fwd(lk, rk, lt, rt)")
        graft.plans.AsOfJoinPlan.AsOfMarker(
          children(0), children(1), children(2), children(3), forward = true)
      }))
    ext.injectFunction((
      new FunctionIdentifier("float_vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "float_vec_dot takes 2 arguments")
        FloatVecDot(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("portable_hash"),
      new ExpressionInfo(classOf[PortablePolyHash].getName, "portable_hash"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "portable_hash takes 1 argument")
        PortablePolyHash(children(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("bitmap_distinct"),
      new ExpressionInfo(
        classOf[graft.expressions.BitmapDistinct].getName, "bitmap_distinct"),
      GraftExtensions.bitmapBuilder))
    ext.injectFunction((
      new FunctionIdentifier("count_min_sketch_portable"),
      new ExpressionInfo(
        classOf[graft.expressions.CountMinSketch].getName,
        "count_min_sketch_portable"),
      GraftExtensions.cmsBuilder))
    ext.injectFunction((
      new FunctionIdentifier("frequent_items"),
      new ExpressionInfo(
        classOf[graft.expressions.FrequentItems].getName, "frequent_items"),
      GraftExtensions.freqBuilder))
    // table-valued function: the G1 calendar generator as a SQL relation
    // source — SELECT * FROM graft_calendar('2001-01-01', '2001-12-31')
    ext.injectTableFunction((
      new FunctionIdentifier("graft_calendar"),
      new ExpressionInfo(graft.star.CalendarDim.getClass.getName, "graft_calendar"),
      (children: Seq[Expression]) => graft.star.CalendarDim.tvfPlan(children)))
  }
}

object GraftExtensions {

  /** A size/bound argument of a SQL aggregate constructor must be a
    * LITERAL integer — it parameterizes the aggregation buffer, which
    * exists before any row is read.
    */
  private def litInt(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: expected a literal integer argument, got $other")
  }

  private[graft] val bitmapBuilder: Seq[Expression] => Expression = children => {
    require(children.length == 2, "bitmap_distinct(col, bound)")
    graft.expressions.BitmapDistinct(children(0),
      litInt(children(1), "bitmap_distinct"))
  }

  private[graft] val cmsBuilder: Seq[Expression] => Expression = children => {
    require(children.length == 3, "count_min_sketch_portable(item, depth, width)")
    graft.expressions.CountMinSketch(children(0),
      litInt(children(1), "count_min_sketch_portable"),
      litInt(children(2), "count_min_sketch_portable"))
  }

  private[graft] val freqBuilder: Seq[Expression] => Expression = children => {
    require(children.length == 2, "frequent_items(item, k)")
    graft.expressions.FrequentItems(children(0),
      litInt(children(1), "frequent_items"))
  }

  /** Runtime registration for an existing session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_vec_dot",
      (children: Seq[Expression]) => FloatVecDot(children(0), children(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "portable_hash",
      (children: Seq[Expression]) => PortablePolyHash(children(0)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bitmap_distinct", bitmapBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "count_min_sketch_portable", cmsBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "frequent_items", freqBuilder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_calendar",
      (children: Seq[Expression]) => graft.star.CalendarDim.tvfPlan(children),
      "scala_udf")
  }
}
