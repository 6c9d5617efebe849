package graft

import graft.operators.Ids
import org.apache.spark.sql.functions._

/** Round-15 pins: the denseIds null-safe join-back (r14 advice item 1 —
  * a null key is a legal unique key and must keep its row on the small
  * path exactly as it does on the distributed and key-only paths).
  */
class Round15Spec extends SparkSpec {
  import spark.implicits._

  test("denseIds small path keeps a null-keyed row (null-safe join-back)") {
    val df = Seq((Option("a"), 1), (Option.empty[String], 2), (Option("b"), 3))
      .toDF("k", "v")
    def run() = Ids.denseIds(df, "k")
      .collect().map(r => (Option(r.getString(0)), r.getInt(1), r.getLong(2)))
      .toSet
    val fast = run()
    // null sorts first under Spark's asc ordering → gid 1
    assert(fast == Set((None, 2, 1L), (Some("a"), 1, 2L), (Some("b"), 3, 3L)))
    spark.conf.set("spark.graft.ids.driver", "false")
    val slow = try run()
      finally spark.conf.unset("spark.graft.ids.driver")
    assert(fast == slow)
  }
}
