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

  test("BM25 statistics raises (round 20, the last TextAnalysis gap): " +
      "df/doc-stats tables carry the tokenizer version; merges, " +
      "retracts, and the stats serve refuse unstamped or " +
      "foreign-tokenizer tables") {
    import graft.ops.TextAnalysis
    val docs = Seq((1L, "spark shuffles data"), (2L, "catalyst plans"))
      .toDF("id", "text")
    val dfT = TextAnalysis.dfTable(docs, "id", "text")
    val stats = TextAnalysis.docStats(docs, "id", "text")
    ArtifactStamp.stampOf(dfT, "df") shouldBe
      Some(("bm25_df", Map("tokenizer_v" -> TextAnalysis.TokenizerVersion)))
    // a hand-built (term, df) table — e.g. a foreign indexer's output —
    // refuses to merge: its term space is unproven
    val foreign = Seq(("spark", 3L)).toDF("term", "df")
    val e1 = intercept[IllegalArgumentException] {
      TextAnalysis.dfTableMerge(Seq(dfT, foreign))
    }
    e1.getMessage should include("no build-parameter stamp")
    // a table stamped under ANOTHER tokenizer version raises naming it
    val vOld = ArtifactStamp.stamp(foreign, "df", "bm25_df",
      "tokenizer_v" -> (TextAnalysis.TokenizerVersion + 1L))
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.dfTableMerge(Seq(dfT, vOld))
    }
    e2.getMessage should include("mismatched: tokenizer_v")
    intercept[IllegalArgumentException] {
      TextAnalysis.dfTableRetract(vOld, docs, "id", "text")
    }.getMessage should include("mismatched: tokenizer_v")
    intercept[IllegalArgumentException] {
      TextAnalysis.docStatsMerge(Seq(stats,
        Seq((1L, 5L)).toDF("n_docs", "sum_dl")))
    }.getMessage should include("no build-parameter stamp")
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25TopDocsFromStats(docs, "id", "text",
        Seq("spark"), vOld, stats)
    }.getMessage should include("mismatched: tokenizer_v")
    // matched path: merge/retract/serve all still run, stamp carried
    val merged = TextAnalysis.dfTableMerge(Seq(dfT, dfT))
    ArtifactStamp.stampOf(merged, "df").map(_._1) shouldBe Some("bm25_df")
    TextAnalysis.bm25TopDocsFromStats(docs, "id", "text", Seq("spark"),
      merged, TextAnalysis.docStatsMerge(Seq(stats, stats)))
      .count() should be >= 1L
  }

  test("left-join counts raises (round 20, the last Merge gap): the " +
      "counts artifact is bound to its (keyCols, aIdCols) identity — " +
      "folding or retracting under different columns raises; the " +
      "matched fold re-stamps") {
    import graft.ops.Merge
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "pa")
    val b = Seq((1L, 10L)).toDF("k", "pb")
    val counts = Merge.leftJoinMatchCounts(a, b, Seq("k"), Seq("k"))
    ArtifactStamp.stampOf(counts, "n").map(_._1) shouldBe
      Some("leftjoin_counts")
    // a counts table built over DIFFERENT columns refuses to fold
    val e1 = intercept[IllegalArgumentException] {
      Merge.leftJoinCountsFold(counts, a, a, b, b, Seq("k"), Seq("k", "pa"))
    }
    e1.getMessage should include("mismatched: key_hash")
    // a hand-built (id, n) frame is unproven provenance
    intercept[IllegalArgumentException] {
      Merge.leftJoinCountsFold(Seq((1L, 1L)).toDF("k", "n"),
        a, a, b, b, Seq("k"), Seq("k"))
    }.getMessage should include("no build-parameter stamp")
    intercept[IllegalArgumentException] {
      Merge.leftJoinViewChanges(Seq((1L, 1L)).toDF("k", "n"),
        a, a, b, b, Seq("k"), Seq("k"))
    }.getMessage should include("no build-parameter stamp")
    intercept[IllegalArgumentException] {
      Merge.leftJoinCountsCompact(Seq((1L, 1L)).toDF("k", "n"), Seq("k"))
    }.getMessage should include("no build-parameter stamp")
    // matched fold runs and re-stamps; the folded table compacts
    val folded = Merge.leftJoinCountsFold(counts,
      a, a.limit(0), b, b.limit(0), Seq("k"), Seq("k"))
    ArtifactStamp.stampOf(folded, "n") shouldBe
      ArtifactStamp.stampOf(counts, "n")
    Merge.leftJoinCountsCompact(folded, Seq("k")).count() shouldBe 2L
  }

  test("stampTableInPlace migrates a pre-stamp parquet table so the " +
      "hard-raising maintenance verbs accept it (round-19 ADVICE: the " +
      "stored-state break needed a remedy beyond hand-editing)") {
    import graft.ops.Sketches
    val dir = java.nio.file.Files.createTempDirectory("migrate").toString
    // a round-18-era artifact: correct values, no stamp
    val pre = Sketches.cmsGrids(kv, Seq("g"), "k", 4, 32)
    val unstamped = pre.withColumn("cms_grid",
      col("cms_grid").as("cms_grid",
        new org.apache.spark.sql.types.MetadataBuilder().build()))
    unstamped.write.mode("overwrite").parquet(s"$dir/cms")
    val back = spark.read.parquet(s"$dir/cms")
    intercept[IllegalArgumentException] {
      Sketches.cmsMergeGrids(Seq(back, pre), Seq("g"), 4, 32)
    }.getMessage should include("no build-parameter stamp")
    ArtifactStamp.stampTableInPlace(spark, s"$dir/cms", "cms_grid",
      "cms", "depth" -> 4L, "width" -> 32L)
    val migrated = spark.read.parquet(s"$dir/cms")
    ArtifactStamp.stampOf(migrated, "cms_grid") shouldBe
      Some(("cms", Map("depth" -> 4L, "width" -> 32L)))
    // values untouched, and the migrated table folds like a fresh build
    migrated.select(col("g"), col("cms_grid")).exceptAll(
      pre.select(col("g"), col("cms_grid"))).count() shouldBe 0L
    Sketches.cmsMergeGrids(Seq(migrated, pre), Seq("g"), 4, 32)
      .count() should be >= 1L
  }
}
