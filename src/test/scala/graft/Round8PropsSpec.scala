package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._
import graft.operators.Components
import graft.streaming.StreamingOps

/** Property laws for the round-8 fourth-wave operators, each against a
  * plain-Scala reference on arbitrary generated inputs:
  *  - bfsHops equals reference BFS, is monotone under edge addition
  *    (more edges never lengthen a shortest path), and zero on seeds;
  *  - the table checksum is a sum homomorphism (checksum(A ⊎ B) =
  *    checksum(A) + checksum(B)) — the law that makes shard-local
  *    fingerprints mergeable without re-scanning;
  *  - streaming intervalMerge over one batch equals the batch
  *    sweep-line on the same events;
  *  - the Kendall cell-histogram concordance counts equal naive O(n²)
  *    pair counting on tie-heavy quantized data.
  */
object Round8PropsSpec extends Properties("graft.round8") {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // --- bfsHops ---------------------------------------------------------

  private val graphGen: Gen[(List[(Long, Long)], List[Long], Int)] = for {
    n <- Gen.chooseNum(4, 30)
    ne <- Gen.chooseNum(0, 50)
    edges <- Gen.listOfN(ne, Gen.zip(Gen.chooseNum(0L, n - 1L), Gen.chooseNum(0L, n - 1L)))
    seeds <- Gen.nonEmptyListOf(Gen.chooseNum(0L, n - 1L))
    rounds <- Gen.chooseNum(1, 4)
  } yield (edges.filter(e => e._1 != e._2).distinct, seeds.distinct, rounds)

  private def refBfs(edges: Seq[(Long, Long)], seeds: Seq[Long],
                     rounds: Int): Map[Long, Int] = {
    val adj = scala.collection.mutable.Map[Long, List[Long]]().withDefaultValue(Nil)
    edges.foreach { case (a, b) => adj(a) ::= b; adj(b) ::= a }
    val dist = scala.collection.mutable.Map[Long, Int]()
    seeds.foreach(dist(_) = 0)
    var frontier = seeds.toSet
    for (r <- 1 to rounds) {
      frontier = frontier.flatMap(adj).filterNot(dist.contains)
      frontier.foreach(dist(_) = r)
    }
    dist.toMap
  }

  private def runBfs(edges: Seq[(Long, Long)], seeds: Seq[Long],
                     rounds: Int): Map[Long, Int] =
    Components.bfsHops(
        if (edges.isEmpty) Seq((-1L, -1L)).toDF("s", "d").filter(lit(false))
        else edges.toDF("s", "d"),
        "s", "d", seeds.toDF("id"), "id", rounds)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  property("bfsHops == reference BFS; seeds at zero; bounded by horizon") =
    Prop.forAll(graphGen) { case (edges, seeds, rounds) =>
      val got = runBfs(edges, seeds, rounds)
      val ref = refBfs(edges, seeds, rounds)
      (got == ref) :| s"got $got vs $ref" &&
        seeds.forall(s => got.get(s).contains(0)) :| "seeds at 0" &&
        got.values.forall(_ <= rounds) :| "bounded by horizon"
    }

  property("bfsHops monotone: adding an edge never lengthens any distance") =
    Prop.forAll(graphGen, Gen.zip(Gen.chooseNum(0L, 29L), Gen.chooseNum(0L, 29L))) {
      case ((edges, seeds, rounds), extra) =>
        (extra._1 != extra._2 && !edges.contains(extra)) ==> {
          val before = runBfs(edges, seeds, rounds)
          val after = runBfs(edges :+ extra, seeds, rounds)
          before.forall { case (id, d) =>
            after.get(id).exists(_ <= d)
          } :| s"distances grew: $before -> $after"
        }
    }

  // --- checksum homomorphism ------------------------------------------

  private val rowsGen: Gen[List[String]] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n,
      Gen.listOfN(6, Gen.alphaNumChar).map(_.mkString)))

  private def checksum(rows: Seq[String]): Long =
    if (rows.isEmpty) 0L
    else rows.toDF("s")
      .select(graft.functions.portableStringHash(col("s")).as("h"))
      .agg(sum(col("h")).cast(org.apache.spark.sql.types.DecimalType(38, 0)).cast("long"))
      .collect().head.getLong(0)

  property("checksum(A ++ B) == checksum(A) + checksum(B)") =
    Prop.forAll(rowsGen, rowsGen) { (a, b) =>
      checksum(a ++ b) == checksum(a) + checksum(b)
    }

  // --- streaming intervalMerge == batch sweep-line ---------------------

  private val eventsGen: Gen[(List[Long], Long)] = for {
    n <- Gen.chooseNum(1, 25)
    ts <- Gen.listOfN(n, Gen.chooseNum(0L, 500L))
    len <- Gen.chooseNum(10L, 120L)
  } yield (ts, len)

  private def refMerge(ts: Seq[Long], len: Long): List[(Long, Long, Long)] = {
    val merged = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    ts.sorted.foreach { s =>
      if (merged.nonEmpty && s <= merged.last._2)
        merged(merged.length - 1) =
          (merged.last._1, math.max(merged.last._2, s + len), merged.last._3 + 1)
      else merged += ((s, s + len, 1L))
    }
    merged.toList
  }

  property("streaming intervalMerge (single batch) == batch sweep-line; open island held back") =
    Prop.forAll(eventsGen) { case (ts, len) =>
      // the streaming op emits islands CLOSED by a later arrival; the
      // final island stays in state — compare against the reference with
      // its last island dropped
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[StreamingOps.Event]
      val q = StreamingOps.intervalMerge(input.toDS(), intervalMs = len)
        .writeStream.format("memory")
        .queryName(s"ivp${math.abs(ts.hashCode)}")
        .outputMode("append").start()
      try {
        input.addData(ts.map(t => StreamingOps.Event(1L, t, 0.0)): _*)
        q.processAllAvailable()
        val got = spark.sql(s"SELECT start_ms, end_ms, n_events FROM ivp${math.abs(ts.hashCode)}")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList.sorted
        val expect = refMerge(ts, len).dropRight(1).sorted
        (got == expect) :| s"got $got vs $expect"
      } finally q.stop()
    }

  // --- Kendall cells == naive pairs on tie-heavy data ------------------

  private val xyGen: Gen[List[(Int, Int)]] =
    Gen.chooseNum(2, 60).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.chooseNum(0, 4), Gen.chooseNum(0, 4))))

  property("Kendall cell-histogram C/D == naive pair counting under heavy ties") =
    Prop.forAll(xyGen) { pts =>
      val cells = pts.groupBy(identity).map { case ((x, y), v) => (x, y, v.length.toLong) }.toSeq
      var (cCells, dCells) = (0L, 0L)
      for ((x1, y1, c1) <- cells; (x2, y2, c2) <- cells if x1 < x2) {
        if (y1 < y2) cCells += c1 * c2
        else if (y1 > y2) dCells += c1 * c2
      }
      var (cN, dN) = (0L, 0L)
      for (i <- pts.indices; j <- (i + 1) until pts.length) {
        val dx = Integer.compare(pts(i)._1, pts(j)._1)
        val dy = Integer.compare(pts(i)._2, pts(j)._2)
        if (dx != 0 && dy != 0) { if (dx == dy) cN += 1 else dN += 1 }
      }
      (cCells == cN && dCells == dN) :| s"cells ($cCells,$dCells) vs naive ($cN,$dN)"
    }
}
