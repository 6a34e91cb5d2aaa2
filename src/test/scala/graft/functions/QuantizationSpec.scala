package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpecBase

class QuantizationSpec extends SparkSpecBase with Matchers {
  import spark.implicits._

  test("quantize/dequantize bounds per-element error by scale/2") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val q = Quantization.quantize(col("embedding"))
    val checked = emb.select(
        col("embedding").cast("array<double>").as("e"),
        q.getField("scale").as("s"),
        Quantization.dequantize(q.getField("scale"), q.getField("codes")).as("d"))
      .select(col("s"),
        array_max(zip_with(col("e"), col("d"), (x, y) => abs(x - y))).as("err"))
      .as[(Double, Double)].collect()
    checked should not be empty
    checked.foreach { case (s, err) =>
      err should be <= s / 2 + 1e-12
    }
  }

  test("zero vectors quantize to scale 0 / all-zero codes, reconstruct to zeros") {
    val r = Seq(Array(0.0f, 0.0f, 0.0f)).toDF("v")
      .select(Quantization.quantize(col("v")).as("q"))
      .select(col("q.scale"),
        Quantization.dequantize(col("q.scale"), col("q.codes")).as("d"))
      .as[(Double, Seq[Double])].head()
    r._1 shouldBe 0.0
    r._2 shouldBe Seq(0.0, 0.0, 0.0)
  }

  test("quantized cosine approximates exact cosine (rank-preserving here)") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val q = Quantization.quantize(col("embedding"))
    val both = emb.where(col("vec_id") < 20).select(
        col("vec_id"),
        col("embedding").cast("array<double>").as("e"),
        Quantization.dequantize(q.getField("scale"), q.getField("codes")).as("d"))
    val pairs = both.as("a").crossJoin(both.as("b"))
      .where(col("a.vec_id") < col("b.vec_id"))
      .select(
        VectorHashes.cosine_sim(col("a.e"), col("b.e")).as("exact"),
        VectorHashes.cosine_sim(col("a.d"), col("b.d")).as("approx"))
      .as[(Double, Double)].collect()
    pairs should not be empty
    pairs.foreach { case (exact, approx) =>
      approx shouldBe exact +- 0.02 // int8 on 64-dim: ~1e-3 typical
    }
  }
}
