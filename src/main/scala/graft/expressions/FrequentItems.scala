package graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as a TypedImperativeAggregate:
  * approximate heavy hitters over a string column in O(k) state per
  * group, with map-side partial combine.
  *
  * WHY a sketch: the exact formulation (`groupBy(item).count` then
  * top-k) shuffles one row per DISTINCT item — at 100 TB the token
  * universe is billions of rows through the shuffle just to find the
  * top 20. The sketch keeps at most k counters per (group x partition),
  * so the shuffle carries k rows per map task regardless of the item
  * universe.
  *
  * Guarantees (standard Misra-Gries, preserved under the merge of
  * Agarwal et al.): every item with true frequency > n/(k+1) is present
  * in the output, and each reported count undercounts the true count by
  * at most n/(k+1). Exactness on re-aggregation is NOT claimed — pair
  * with the exact `termFrequencies` when truth is required; the sketch
  * is the scale path.
  *
  * Output: array<struct<item string, est bigint>> sorted (est desc,
  * item asc) — deterministic for a deterministic input partitioning;
  * the SURVIVOR SET (not the estimates) is what the guarantee pins,
  * which is what the spec asserts.
  */
case class FrequentItems(
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[String, Long]] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(item)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FrequentItems =
    copy(item = newChildren(0))

  override def checkInputDataTypes(): TypeCheckResult = item.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "frequent_items"

  override def createAggregationBuffer(): mutable.LinkedHashMap[String, Long] =
    mutable.LinkedHashMap.empty

  /** Classic MG step: hit -> increment; room -> insert; full -> decrement
    * every counter (dropping zeros), which "charges" one occurrence of
    * each tracked item against the new one.
    */
  override def update(buf: mutable.LinkedHashMap[String, Long],
                      input: InternalRow): mutable.LinkedHashMap[String, Long] = {
    val v = item.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1)
        case None if buf.size < k => buf.update(s, 1L)
        case None =>
          val dead = mutable.ArrayBuffer.empty[String]
          buf.foreach { case (key, c) =>
            if (c == 1L) dead += key else buf.update(key, c - 1)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  /** Mergeable-summaries merge: sum counters, then if over capacity
    * subtract the (k+1)-th largest count from every counter and drop the
    * non-positive — the error bound adds, the guarantee survives.
    */
  override def merge(buf: mutable.LinkedHashMap[String, Long],
                     other: mutable.LinkedHashMap[String, Long]): mutable.LinkedHashMap[String, Long] = {
    other.foreach { case (s, c) => buf.update(s, buf.getOrElse(s, 0L) + c) }
    if (buf.size > k) {
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.foreach { case (key, c) =>
        if (c - cut <= 0L) dead += key else buf.update(key, c - cut)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.LinkedHashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (s, c) => (-c, s) }
    new GenericArrayData(sorted.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.LinkedHashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray.map { case (s, c) =>
      (s.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(4 + entries.map(e => 12 + e._1.length).sum)
    bb.putInt(entries.length)
    entries.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.LinkedHashMap.empty[String, Long]
    var j = 0
    while (j < n) {
      val len = bb.getInt
      val sb = new Array[Byte](len)
      bb.get(sb)
      buf.update(new String(sb, StandardCharsets.UTF_8), bb.getLong)
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItems =
    copy(inputAggBufferOffset = newOffset)
}

object FrequentItems {
  /** Column API: `df.agg(FrequentItems.sketch(col("token"), 20))`. */
  def sketch(item: Column, k: Int): Column =
    GraftSqlBridge.column(
      FrequentItems(GraftSqlBridge.expression(item), k).toAggregateExpression())
}
