package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Seq(
    (1L, "image", "hello world"),
    (2L, "audio", "some audio bytes"),
    (3L, "video", "frames"),
    (4L, "other", ""),
  ).toDF("media_id", "kind", "text")
    .withColumn("payload", $"text".cast("binary"))
    .drop("text")

  test("mapPartitions decode and expression twin agree on ASCII payloads") {
    val a = Multimodal.extractMetadata(media).orderBy("media_id").collect().toSeq
    val b = Multimodal.extractMetadataExpr(media).orderBy("media_id").collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }

  test("metadata shapes: image gets dims, a/v gets duration, bytes counted") {
    val rows = Multimodal.extractMetadata(media).orderBy("media_id").collect()
    val img = rows(0)
    assert(img.getAs[Long]("n_bytes") == 11L)
    assert(img.getAs[Int]("width") >= 1 && img.getAs[Int]("width") <= 1024)
    assert(img.getAs[Long]("duration_ms") == 0L)
    val audio = rows(1)
    assert(audio.getAs[Int]("width") == 0)
    assert(audio.getAs[Long]("duration_ms") == 16 * 8L)
  }

  test("null payload handled as zero-byte media") {
    val withNull = Seq((9L, "image")).toDF("media_id", "kind")
      .withColumn("payload", lit(null).cast("binary"))
    val r = Multimodal.extractMetadata(withNull).collect()(0)
    assert(r.getAs[Long]("n_bytes") == 0L)
  }
}
