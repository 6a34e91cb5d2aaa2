package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpecBase

class MultimodalSpec extends SparkSpecBase with org.scalatest.matchers.should.Matchers {
  import spark.implicits._

  private def media = Seq(
    (1L, "image", "0123456789".getBytes("UTF-8")),
    (2L, "audio", Array.emptyByteArray),
    (3L, "video", "abc".getBytes("UTF-8"))
  ).toDF("media_id", "media_type", "payload")

  test("expression path and mapPartitions decode path agree") {
    val expr = Multimodal.withMediaMeta(media, "media_id",
        $"media_type", $"payload")
      .orderBy("media_id").collect()
    val typed = Multimodal.decodeMeta(media, "media_id", "media_type", "payload")
      .orderBy("media_id").collect()
    expr.length shouldBe typed.length
    expr.zip(typed).foreach { case (e, t) =>
      e.getAs[Long]("media_id") shouldBe t.media_id
      e.getAs[Long]("byte_len") shouldBe t.byte_len
      e.getAs[String]("sha256") shouldBe t.sha256
      e.getAs[Int]("width") shouldBe t.width
      e.getAs[Int]("height") shouldBe t.height
      e.getAs[Int]("n_frames") shouldBe t.n_frames
    }
  }

  test("frame offsets are evenly spaced; empty payload -> empty array") {
    val r = media.select($"media_id",
      Multimodal.frameOffsets($"payload", 5).as("offs")).orderBy("media_id")
      .as[(Long, Seq[Long])].collect().toMap
    r(1L) shouldBe Seq(0L, 2L, 4L, 6L, 8L)
    r(2L) shouldBe Seq.empty
    r(3L) shouldBe Seq(0L, 0L, 1L, 1L, 2L) // 3 bytes, 5 samples
  }

  test("fake media frame from documents has binary payload + cycling types") {
    val df = Multimodal.fakeMediaFrame(spark, "/root/testdata/sf0.001")
    df.schema("payload").dataType shouldBe BinaryType
    val types = df.select("media_type").distinct().as[String].collect().toSet
    types shouldBe Set("image", "audio", "video")
  }
}
