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

  test("expression and decode paths agree on NULL payloads too (len 0, " +
      "empty sha — not null-propagated meta)") {
    val withNull = media.unionByName(Seq(
      (4L, "image", null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "media_type", "payload"))
    val expr = Multimodal.withMediaMeta(withNull, "media_id",
        $"media_type", $"payload")
      .where($"media_id" === 4L).collect()(0)
    val typed = Multimodal.decodeMeta(withNull, "media_id", "media_type", "payload")
      .where($"media_id" === 4L).collect()(0)
    expr.getAs[Long]("byte_len") shouldBe typed.byte_len
    expr.getAs[String]("sha256") shouldBe typed.sha256
    expr.getAs[Int]("width") shouldBe typed.width
    expr.getAs[Int]("n_frames") shouldBe typed.n_frames
    expr.getAs[Long]("byte_len") shouldBe 0L
    expr.getAs[String]("sha256") shouldBe ""
  }

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

  test("frame offsets are evenly spaced; empty payload -> empty array; " +
      "n = 0 is rejected") {
    val r = media.select($"media_id",
      Multimodal.frameOffsets($"payload", 5).as("offs")).orderBy("media_id")
      .as[(Long, Seq[Long])].collect().toMap
    r(1L) shouldBe Seq(0L, 2L, 4L, 6L, 8L)
    r(2L) shouldBe Seq.empty
    r(3L) shouldBe Seq(0L, 0L, 1L, 1L, 2L) // 3 bytes, 5 samples
    intercept[IllegalArgumentException] { // would be sequence(0,-1) + div/0
      Multimodal.frameOffsets($"payload", 0)
    }
  }

  test("featureVector: unit norm, empty payload -> zero vector") {
    val r = media.select($"media_id",
        Multimodal.featureVector($"payload").as("f"))
      .select($"media_id",
        sqrt(aggregate($"f", lit(0.0), (a, x) => a + x * x)).as("norm"),
        org.apache.spark.sql.functions.size($"f").as("dim"))
      .as[(Long, Double, Int)].collect()
      .map { case (id, n, d) => id -> ((n, d)) }.toMap
    r(1L)._1 shouldBe 1.0 +- 1e-12
    r(1L)._2 shouldBe 64
    r(2L)._1 shouldBe 0.0 // empty payload
  }

  test("media feature ANN: each media's nearest neighbor is itself") {
    val m = Multimodal.fakeMediaFrame(spark, sf())
      .select($"media_id", Multimodal.featureVector($"payload").as("feat"))
    val q = m.where($"media_id" < 3)
      .select($"media_id".as("qid"), $"feat".as("qvec"))
    val top1 = Similarity.bruteForceTopK(m, "media_id", "feat",
        q, "qid", "qvec", k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    top1.foreach { case (qid, nid) => nid shouldBe qid }
  }

  test("fake media frame from documents has binary payload + cycling types") {
    val df = Multimodal.fakeMediaFrame(spark, "/root/testdata/sf0.001")
    df.schema("payload").dataType shouldBe BinaryType
    val types = df.select("media_type").distinct().as[String].collect().toSet
    types shouldBe Set("image", "audio", "video")
  }
}
