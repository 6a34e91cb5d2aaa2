package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpecBase

/** Build-parameter stamps on persisted artifacts (round-19 delivery):
  * builders stamp, merges/retracts/serves RAISE at plan time on a
  * parameter mismatch — per family — and the stamp survives a parquet
  * round trip, which is what makes it provenance for STORED tables
  * rather than a same-session courtesy. */
class ArtifactStampSpec extends SparkSpecBase with Matchers {
  import spark.implicits._

  private lazy val kv = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "k")

  test("stamp/check/requireSameStamp mechanics: presence, op, params, " +
      "cross-input identity; renames and filters preserve the stamp") {
    val df = ArtifactStamp.stamp(kv, "k", "demo", "p1" -> 4L, "p2" -> 9L)
    ArtifactStamp.stampOf(df, "k") shouldBe
      Some(("demo", Map("p1" -> 4L, "p2" -> 9L)))
    ArtifactStamp.check(df, "k", "demo", "t", "p1" -> 4L)
    // unstamped -> raise with remedy
    val e1 = intercept[IllegalArgumentException] {
      ArtifactStamp.check(kv, "k", "demo", "t", "p1" -> 4L)
    }
    e1.getMessage should include("no build-parameter stamp")
    // wrong op -> raise
    val e2 = intercept[IllegalArgumentException] {
      ArtifactStamp.check(df, "k", "other", "t")
    }
    e2.getMessage should include("is a 'demo' artifact")
    // wrong param -> raise naming the mismatched key
    val e3 = intercept[IllegalArgumentException] {
      ArtifactStamp.check(df, "k", "demo", "t", "p1" -> 5L)
    }
    e3.getMessage should include("mismatched: p1")
    // param the stamp never carried -> mismatch too
    val e4 = intercept[IllegalArgumentException] {
      ArtifactStamp.check(df, "k", "demo", "t", "p3" -> 1L)
    }
    e4.getMessage should include("mismatched: p3")
    // cross-input identity
    val df2 = ArtifactStamp.stamp(kv, "k", "demo", "p1" -> 4L, "p2" -> 8L)
    val e5 = intercept[IllegalArgumentException] {
      ArtifactStamp.requireSameStamp(Seq(df, df2), "k", "demo", "t")
    }
    e5.getMessage should include("DIFFERENT build stamps")
    ArtifactStamp.requireSameStamp(Seq(df, df), "k", "demo", "t")._2 shouldBe
      Map("p1" -> 4L, "p2" -> 9L)
    // stamp survives rename-free projections, filters, checkpoints
    ArtifactStamp.stampOf(df.where(col("g") === "a"), "k") shouldBe
      ArtifactStamp.stampOf(df, "k")
    ArtifactStamp.stampOf(df.select(col("g"), col("k")), "k") shouldBe
      ArtifactStamp.stampOf(df, "k")
    ArtifactStamp.stampOf(df.localCheckpoint(), "k") shouldBe
      ArtifactStamp.stampOf(df, "k")
  }

  test("the stamp survives a parquet round trip — provenance for " +
      "STORED artifacts, not a same-session courtesy") {
    import graft.ops.Sketches
    val grids = Sketches.cmsGrids(kv, Seq("g"), "k", 4, 32)
    val dir = java.nio.file.Files.createTempDirectory("stamp").toString
    grids.write.mode("overwrite").parquet(s"$dir/cms")
    val back = spark.read.parquet(s"$dir/cms")
    ArtifactStamp.stampOf(back, "cms_grid") shouldBe
      Some(("cms", Map("depth" -> 4L, "width" -> 32L)))
    // the re-read table folds like a fresh build
    Sketches.cmsMergeGrids(Seq(back, grids), Seq("g"), 4, 32)
      .count() should be >= 1L
  }

  test("per-family loud raises: CMS depth/width, Bloom bits AND " +
      "numHashes, HLL p, quantile k, priority-sample m") {
    import graft.ops.{Sampling, Sketches}
    val g44 = Sketches.cmsGrids(kv, Seq("g"), "k", 4, 32)
    val g88 = Sketches.cmsGrids(kv, Seq("g"), "k", 8, 16)
    // 4x32 and 8x16 have the SAME cell count — the row-level size
    // guard is blind to this; the stamp is not
    val e1 = intercept[IllegalArgumentException] {
      Sketches.cmsMergeGrids(Seq(g44, g88), Seq("g"), 4, 32)
    }
    e1.getMessage should include("mismatched")
    val e1b = intercept[IllegalArgumentException] {
      Sketches.cmsSubtractGrids(g44, g88, Seq("g"), 4, 32)
    }
    e1b.getMessage should include("mismatched")
    // Bloom: same bits, different numHashes — previously
    // indistinguishable from data (the docstring's admitted gap)
    val b3 = Sketches.bloomWords(kv, Seq("g"), "k", 256, 3)
    val b5 = Sketches.bloomWords(kv, Seq("g"), "k", 256, 5)
    val e2 = intercept[IllegalArgumentException] {
      Sketches.bloomMergeWords(Seq(b3, b5), Seq("g"), 256)
    }
    e2.getMessage should include("DIFFERENT build stamps")
    // HLL: cross-p merge and wrong-p estimate
    val h6 = Sketches.hllRegisters(kv, Seq("g"), "k", 6)
    val h8 = Sketches.hllRegisters(kv, Seq("g"), "k", 8)
    val e3 = intercept[IllegalArgumentException] {
      Sketches.hllMergeRegisters(Seq(h6, h8), Seq("g"))
    }
    e3.getMessage should include("DIFFERENT build stamps")
    val e3b = intercept[IllegalArgumentException] {
      Sketches.hllEstimate(h6, Seq("g"), 8)
    }
    e3b.getMessage should include("mismatched: p")
    // quantile k
    val q8 = Sketches.quantileSummaries(kv, Seq("g"), "k", "k", 8)
    val e4 = intercept[IllegalArgumentException] {
      Sketches.quantileMergeSummaries(Seq(q8), Seq("g"), 16)
    }
    e4.getMessage should include("mismatched: k")
    // priority-sample m
    val s4 = Sampling.prioritySamples(
      kv.select(col("g"), col("k").as("id"), col("k").as("w")),
      Seq("g"), "id", "w", 4)
    val e5 = intercept[IllegalArgumentException] {
      Sampling.prioritySampleMerge(Seq(s4), Seq("g"), 8)
    }
    e5.getMessage should include("mismatched: m")
  }

  test("winnow and LSH raises: cross-(k, w) merge, wrong-parameter " +
      "retract, wrong-parameter probe") {
    import graft.ops.Dedup
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "an utterly different sentence about spark state stores"))
      .toDF("id", "text")
    val w84 = Dedup.winnowIndexCounted(docs, "id", "text", k = 8, w = 4)
    val w63 = Dedup.winnowIndexCounted(docs, "id", "text", k = 6, w = 3)
    val e1 = intercept[IllegalArgumentException] {
      Dedup.winnowIndexMerge(Seq(w84, w63))
    }
    e1.getMessage should include("DIFFERENT build stamps")
    val e2 = intercept[IllegalArgumentException] {
      Dedup.winnowIndexRetract(w84, docs.limit(1), "id", "text",
        k = 6, w = 3)
    }
    e2.getMessage should include("mismatched")
    val lsh = Dedup.lshDedupIndex(docs, "id", "text")
    val e3 = intercept[IllegalArgumentException] {
      Dedup.screenAgainstLshIndex(docs, "id", "text", lsh, seed = 7L)
    }
    e3.getMessage should include("mismatched: seed")
    // matched-parameter paths still work end to end
    Dedup.winnowIndexMerge(Seq(w84, w84)).count() should be >= 1L
    Dedup.screenAgainstLshIndex(docs, "id", "text", lsh)
      .columns should contain("jaccard")
  }

  test("IVF-PQ raises: an index encoded with one codebook set refuses " +
      "appends and serves against another (content fingerprints)") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(3)
    val vecs = Seq.tabulate(16)(i =>
      (i.toLong, Seq.fill(8)(rnd.nextDouble() - 0.5))).toDF("id", "v")
    val cents = Similarity.trainCentroids(vecs, "id", "v", k = 2, iters = 2)
    val books = Similarity.pqCodebooks(vecs, "id", "v", dim = 8,
      m = 4, ks = 4, iters = 2)
    val booksOther = Similarity.pqCodebooks(vecs, "id", "v", dim = 8,
      m = 4, ks = 4, iters = 3) // same shape, different content
    val idx = Similarity.ivfPqIndex(vecs, "id", "v", cents, books)
    val e1 = intercept[IllegalArgumentException] {
      Similarity.ivfPqIndexAppend(idx, vecs, "id", "v", cents, booksOther)
    }
    e1.getMessage should include("mismatched")
    e1.getMessage should include("books_fp")
    val e2 = intercept[IllegalArgumentException] {
      Similarity.ivfPqServeAdc(idx, "id",
        vecs.limit(1).select(col("id").as("qid"), col("v").as("qv")),
        "qid", "qv", k = 3, cents, nprobe = 1, booksOther)
    }
    e2.getMessage should include("mismatched")
    // the matched path still appends, retracts, compacts, serves
    val grown = Similarity.ivfPqIndexUpsert(idx, vecs.limit(2), "id",
      "v", cents, books)
    val compacted = Similarity.ivfPqIndexCompact(
      Similarity.ivfPqIndexRetract(grown, Seq(0L).toDF("id"), "id"), "id")
    Similarity.ivfPqServeAdc(compacted, "id",
      vecs.limit(1).select(col("id").as("qid"), col("v").as("qv")),
      "qid", "qv", k = 3, cents, nprobe = 2, books)
      .count() should be >= 1L
  }
}
