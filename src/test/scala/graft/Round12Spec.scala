package graft

import graft.operators.Hierarchy
import org.apache.spark.sql.functions._

/** Round-12 pins: the small-batch driver path of Hierarchy.extend /
  * extendPaths must be indistinguishable from the distributed doubling
  * loop (forced via spark.graft.extend.driver=false) — multi-level
  * new-on-new chains, settled attach points, brand-new roots, path
  * strings, old rows verbatim.
  *
  * Scope: the equivalence holds for ACYCLIC batches — the operator's
  * contract. On contract-violating (cyclic) input the driver path's
  * memoized pointer-chase and the distributed loop's bounded doubling
  * break the cycle at different members, so "identical" is pinned only
  * where the contract holds.
  */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  private def withDistributedExtend[A](body: => A): A = {
    spark.conf.set("spark.graft.extend.driver", "false")
    try body finally spark.conf.unset("spark.graft.extend.driver")
  }

  test("extend small-batch driver path == distributed loop") {
    val all = (1L to 1000L).map(i => (i, i - 1)).toDF("id", "parent")
    val day1 = Hierarchy.rootAndDepth(
      all.filter(col("id") < 600), "id", "parent")
    // chain batch off attach 599 plus a brand-new-root pair
    val batch = all.filter(col("id") >= 600)
      .unionByName(Seq((5000L, 4000L), (5001L, 5000L)).toDF("id", "parent"))
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fast = asMap(Hierarchy.extend(day1, batch, "id", "parent"))
    val slow = withDistributedExtend {
      asMap(Hierarchy.extend(day1, batch, "id", "parent"))
    }
    assert(fast == slow)
    assert(fast(4000L) == (4000L, 0L) && fast(5001L) == (4000L, 2L))
    assert(fast(1000L) == (0L, 1000L)) // 401-deep new-on-new chain
  }

  test("denseIds small-frame local path == distributed rank, payload intact") {
    val df = (1 to 500).map(i => (s"k${1000 - i}", i * 2)).toDF("k", "v")
    val fast = operators.Ids.denseIds(df, "k", 8)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    spark.conf.set("spark.graft.ids.driver", "false")
    val slow =
      try operators.Ids.denseIds(df, "k", 8)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      finally spark.conf.unset("spark.graft.ids.driver")
    assert(fast == slow)
    assert(fast.size == 500)
    // dense 1..N in key order
    assert(fast.map(_._3) == (1L to 500L).toSet)
  }

  test("extendPaths small-batch driver path == distributed loop") {
    val all = (1L to 400L).map(i => (i, i / 2)).toDF("id", "parent")
    val day1 = Hierarchy.materializedPaths(
      all.filter(col("id") < 100), "id", "parent")
    val batch = all.filter(col("id") >= 100)
      .unionByName(Seq((9000L, 8000L), (9001L, 9000L)).toDF("id", "parent"))
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
        .toMap
    val fast = asMap(Hierarchy.extendPaths(day1, batch, "id", "parent"))
    val slow = withDistributedExtend {
      asMap(Hierarchy.extendPaths(day1, batch, "id", "parent"))
    }
    assert(fast == slow)
    assert(fast(9000L) == (8000L, 1L, "8000/9000"))
    assert(fast(9001L) == (8000L, 2L, "8000/9000/9001"))
    // new-on-new path composition through the batch
    assert(fast(399L)._3.endsWith("/199/399"))
  }
}
