package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpecBase

/** Replay idempotency for every streamed nightly fold family — the
  * missing half of the streaming story (round-19 delivery):
  * foreachBatch is at-least-once for arbitrary sinks, so a
  * failed-and-replayed micro-batch re-delivers with the SAME batchId.
  * Each parity loop here delivers every batch TWICE (the
  * failure-recovery pattern) and asserts the artifact still equals the
  * once-delivered fold — through [[BatchLedger]] for the sum-shaped
  * folds that would otherwise double-count, and UNGUARDED for the
  * folds whose math is already idempotent (OR, register-max, keyed
  * upsert), pinning that those need no ledger. */
class BatchLedgerSpec extends SparkSpecBase with Matchers {
  import spark.implicits._

  /** Fold `batches` once-each and twice-each (replay) through the
    * ledger; both final artifacts come back for comparison. */
  private def withAndWithoutReplay(init: DataFrame,
      batches: Seq[DataFrame])(
      fold: (DataFrame, DataFrame) => DataFrame): (DataFrame, DataFrame) = {
    var once = BatchLedger.initial(init)
    batches.zipWithIndex.foreach { case (b, i) =>
      once = BatchLedger.fold(once, i.toLong)(a =>
        fold(a, b).localCheckpoint())
    }
    var replayed = BatchLedger.initial(init)
    batches.zipWithIndex.foreach { case (b, i) =>
      replayed = BatchLedger.fold(replayed, i.toLong)(a =>
        fold(a, b).localCheckpoint())
      // the failure-recovery re-delivery: same batch, same id
      replayed = BatchLedger.fold(replayed, i.toLong)(a =>
        fold(a, b).localCheckpoint())
    }
    (once.artifact, replayed.artifact)
  }

  test("BatchLedger semantics: replay is a free no-op, successor " +
      "folds, a gap raises naming the hole, ledger frame round-trips") {
    var evals = 0
    val l0 = BatchLedger.initial("art0")
    l0.appliedBatch shouldBe -1L
    val l1 = BatchLedger.fold(l0, 0L) { a => evals += 1; a + "+b0" }
    l1.artifact shouldBe "art0+b0"
    l1.appliedBatch shouldBe 0L
    // replay: the fold thunk is NEVER evaluated
    val l1r = BatchLedger.fold(l1, 0L) { a => evals += 1; a + "+b0" }
    l1r shouldBe l1
    evals shouldBe 1
    // stale replay far behind the high-water is equally free
    val l2 = BatchLedger.fold(l1, 1L)(_ + "+b1")
    BatchLedger.fold(l2, 0L)(a => fail("evaluated a stale replay"):
      String) shouldBe l2
    // gap: batch 3 after high-water 1 names the missing batch 2
    val e = intercept[IllegalStateException] {
      BatchLedger.fold(l2, 3L)(_ + "+b3")
    }
    e.getMessage should include("batches 2..2 were never folded")
    val eNeg = intercept[IllegalArgumentException] {
      BatchLedger.fold(l2, -1L)(identity)
    }
    eNeg.getMessage should include("batchId must be >= 0")
    // persistence round-trip
    BatchLedger.appliedBatchOf(
      BatchLedger.ledgerFrame(spark, 7L)) shouldBe 7L
    val eEmpty = intercept[IllegalArgumentException] {
      BatchLedger.appliedBatchOf(
        Seq.empty[Long].toDF("applied_batch"))
    }
    eEmpty.getMessage should include("exactly one non-null")
    val eTwo = intercept[IllegalArgumentException] {
      BatchLedger.appliedBatchOf(Seq(1L, 2L).toDF("applied_batch"))
    }
    eTwo.getMessage should include("exactly one non-null")
  }

  test("replayed CMS fold equals once-delivered through the ledger — " +
      "and double-counts WITHOUT it (the bug the ledger exists for)") {
    import graft.ops.Sketches
    val seed = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "k")
    val b1 = Seq(("a", 2L), ("c", 9L)).toDF("g", "k")
    val b2 = Seq(("b", 3L), ("a", 7L), ("c", 1L)).toDF("g", "k")
    def fold(art: DataFrame, batch: DataFrame): DataFrame =
      Sketches.cmsMergeGrids(Seq(art,
        Sketches.cmsGrids(batch, Seq("g"), "k", 4, 32)), Seq("g"), 4, 32)
    val init = Sketches.cmsGrids(seed, Seq("g"), "k", 4, 32)
      .localCheckpoint()
    val (once, replayed) =
      withAndWithoutReplay(init, Seq(b1, b2))(fold)
    def rows(d: DataFrame) =
      d.as[(String, Seq[Long])].collect().sortBy(_._1).toSeq
    rows(replayed) shouldBe rows(once)
    rows(once) shouldBe rows(Sketches.cmsGrids(
      seed.unionAll(b1).unionAll(b2), Seq("g"), "k", 4, 32))
    // unguarded replay really corrupts: cell sums double
    rows(fold(fold(init, b1), b1)) should not be rows(fold(init, b1))
  }

  test("replayed BM25-stats folds (dfTableMerge/docStatsMerge) equal " +
      "once-delivered through the ledger") {
    import graft.ops.TextAnalysis
    val seed = Seq((1L, "spark shuffles data between stages"),
      (2L, "catalyst optimizes the logical plan")).toDF("id", "text")
    val b1 = Seq((3L, "spark plans shuffles with catalyst"),
      (4L, "the tungsten engine generates code")).toDF("id", "text")
    val b2 = Seq((5L, "stages exchange data through shuffles"))
      .toDF("id", "text")
    val (dfOnce, dfReplayed) = withAndWithoutReplay(
      TextAnalysis.dfTable(seed, "id", "text").localCheckpoint(),
      Seq(b1, b2)) { (art, batch) =>
      TextAnalysis.dfTableMerge(Seq(art,
        TextAnalysis.dfTable(batch, "id", "text")))
    }
    val (dsOnce, dsReplayed) = withAndWithoutReplay(
      TextAnalysis.docStats(seed, "id", "text").localCheckpoint(),
      Seq(b1, b2)) { (art, batch) =>
      TextAnalysis.docStatsMerge(Seq(art,
        TextAnalysis.docStats(batch, "id", "text")))
    }
    val all = seed.unionAll(b1).unionAll(b2)
    dfReplayed.as[(String, Long)].collect().sortBy(_._1).toSeq shouldBe
      dfOnce.as[(String, Long)].collect().sortBy(_._1).toSeq
    dfOnce.as[(String, Long)].collect().sortBy(_._1).toSeq shouldBe
      TextAnalysis.dfTable(all, "id", "text")
        .as[(String, Long)].collect().sortBy(_._1).toSeq
    dsReplayed.as[(Long, Long)].collect().toSeq shouldBe
      dsOnce.as[(Long, Long)].collect().toSeq
    dsOnce.as[(Long, Long)].collect().toSeq shouldBe
      TextAnalysis.docStats(all, "id", "text")
        .as[(Long, Long)].collect().toSeq
  }

  test("replayed counted-winnow fold equals once-delivered through " +
      "the ledger") {
    import graft.ops.Dedup
    val boiler = "identical boilerplate preamble text"
    val mkDocs = (ids: Seq[Long]) =>
      ids.map(i => (i, s"$boiler unique tail number $i with words $i$i"))
    val cap = 6
    val seed = mkDocs(1L to 3L).toDF("id", "text")
    val b1 = mkDocs(4L to 5L).toDF("id", "text")
    val b2 = mkDocs(6L to 8L).toDF("id", "text")
    val (once, replayed) = withAndWithoutReplay(
      Dedup.winnowIndexCounted(seed, "id", "text", maxBucketSize = cap)
        .localCheckpoint(),
      Seq(b1, b2)) { (art, batch) =>
      Dedup.winnowIndexMerge(Seq(art,
        Dedup.winnowIndexCounted(batch, "id", "text",
          maxBucketSize = cap)), maxBucketSize = cap)
    }
    def rows(d: DataFrame) =
      d.as[(Long, Long, Seq[Long])].collect().sortBy(_._1).toSeq
    rows(replayed) shouldBe rows(once)
    rows(once) shouldBe rows(Dedup.winnowIndexCounted(
      mkDocs(1L to 8L).toDF("id", "text"), "id", "text",
      maxBucketSize = cap))
  }

  test("replayed incrementalCountSum fold equals once-delivered " +
      "through the ledger") {
    import graft.ops.Merge
    val dec = org.apache.spark.sql.types.DecimalType(28, 4)
    val base = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0)).toDF("k", "v")
      .groupBy("k").agg(count(lit(1)).as("n"),
        sum(col("v").cast(dec)).cast(dec).as("s"))
      .localCheckpoint()
    val b1 = Seq(("I", "a", 2.0), ("I", "c", 9.0)).toDF("op", "k", "v")
    val b2 = Seq(("D", "b", 5.0), ("I", "c", 1.0)).toDF("op", "k", "v")
    val (once, replayed) = withAndWithoutReplay(base, Seq(b1, b2)) {
      (art, batch) =>
      Merge.incrementalCountSum(art, batch, Seq("k"), "op", "v")
    }
    def rows(d: DataFrame) = d
      .select(col("k"), col("n"), col("s").cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    rows(replayed) shouldBe rows(once)
    rows(once) shouldBe Seq(("a", 3L, 6.0), ("c", 2L, 10.0))
    // an UNGUARDED replay of b2 would delete b twice -> negative
    // count raise; the ledger is what stands between replay and that
    val e = intercept[Exception] {
      Merge.incrementalCountSum(once, b2, Seq("k"), "op", "v").collect()
    }
    e.getMessage should include("count went negative")
  }

  test("replayed join-view append and leftJoinCountsFold equal " +
      "once-delivered through the ledger") {
    import graft.ops.Merge
    val aOld = Seq((1L, "a1"), (2L, "a2")).toDF("k", "pa")
    val bOld = Seq((1L, 1L, 10L)).toDF("k", "ln", "pb")
    val dA = Seq((3L, "a3")).toDF("k", "pa")
    val dB = Seq((2L, 1L, 20L), (3L, 1L, 30L)).toDF("k", "ln", "pb")
    // INNER view: the artifact is the stored view rows; a replayed
    // append must not re-append the delta legs
    val view0 = aOld.join(bOld, Seq("k")).localCheckpoint()
    val (vOnce, vReplayed) = withAndWithoutReplay(view0, Seq(dA)) {
      (art, batch) =>
      art.unionByName(Merge.joinViewDelta(aOld, batch, bOld, dB,
        Seq("k")))
    }
    def vrows(d: DataFrame) = d.as[(Long, String, Long, Long)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    vrows(vReplayed) shouldBe vrows(vOnce)
    vrows(vOnce) shouldBe vrows(aOld.unionByName(dA)
      .join(bOld.unionByName(dB), Seq("k")))
    // LEFT counts artifact: replayed fold must not double the counts
    val counts0 = Merge.leftJoinMatchCounts(aOld, bOld, Seq("k"),
      Seq("k")).localCheckpoint()
    val (cOnce, cReplayed) = withAndWithoutReplay(counts0, Seq(dA)) {
      (art, batch) =>
      Merge.leftJoinCountsFold(art, aOld, batch, bOld, dB, Seq("k"),
        Seq("k"))
    }
    cReplayed.as[(Long, Long)].collect().toMap shouldBe
      cOnce.as[(Long, Long)].collect().toMap
    cOnce.as[(Long, Long)].collect().toMap shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
  }

  test("replayed prioritySampleMerge equals once-delivered through " +
      "the ledger — and double-picks pairs WITHOUT it") {
    import graft.ops.Sampling
    val m = 4
    def samp(rows: Seq[(Long, Long)]): DataFrame =
      Sampling.prioritySamples(
        rows.toDF("id", "w").withColumn("g", lit("x")),
        Seq("g"), "id", "w", m)
    val init = samp(Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L),
      (5L, 50L))).localCheckpoint()
    val b1 = samp(Seq((6L, 60L), (7L, 70L))).localCheckpoint()
    val (once, replayed) = withAndWithoutReplay(init, Seq(b1)) {
      (art, batch) =>
      Sampling.prioritySampleMerge(Seq(art, batch), Seq("g"), m)
    }
    def rows(d: DataFrame) = d.select(col("g"), col("wsample"))
      .as[(String, Seq[(Double, Long, Long)])].collect().toSeq
    rows(replayed) shouldBe rows(once)
    rows(once) shouldBe rows(samp(Seq((1L, 10L), (2L, 20L), (3L, 30L),
      (4L, 40L), (5L, 50L), (6L, 60L), (7L, 70L))))
    // WITHOUT the ledger, top-m over the multiset union double-picks
    // the replayed batch's winning pairs — the sample stops being a
    // set of distinct population rows
    val naive = Sampling.prioritySampleMerge(Seq(
      Sampling.prioritySampleMerge(Seq(init, b1), Seq("g"), m), b1),
      Seq("g"), m)
    val ids = naive.select(explode(col("wsample")).as("p"))
      .select(col("p.id")).as[Long].collect().toSeq
    ids.distinct.size should be < ids.size
  }

  test("math-idempotent folds need no ledger: bloom OR, HLL " +
      "register-max, CDC applyChanges, and ANN upsert re-absorb a " +
      "replayed batch bit-for-bit") {
    import graft.ops.{Merge, Similarity, Sketches}
    // bloom: word-wise OR
    val seed = Seq(("a", 1L), ("b", 3L)).toDF("g", "k")
    val b1 = Seq(("a", 2L), ("c", 9L)).toDF("g", "k")
    def bfold(art: DataFrame, batch: DataFrame) =
      Sketches.bloomMergeWords(Seq(art,
        Sketches.bloomWords(batch, Seq("g"), "k", 256, 3)), Seq("g"), 256)
        .localCheckpoint()
    val bloom0 = Sketches.bloomWords(seed, Seq("g"), "k", 256, 3)
      .localCheckpoint()
    def brows(d: DataFrame) =
      d.as[(String, Seq[Long])].collect().sortBy(_._1).toSeq
    brows(bfold(bfold(bloom0, b1), b1)) shouldBe brows(bfold(bloom0, b1))
    // HLL: register-wise max
    def hfold(art: DataFrame, batch: DataFrame) =
      Sketches.hllMergeRegisters(Seq(art,
        Sketches.hllRegisters(batch, Seq("g"), "k", 6)), Seq("g"))
        .localCheckpoint()
    val hll0 = Sketches.hllRegisters(seed, Seq("g"), "k", 6)
      .localCheckpoint()
    def hrows(d: DataFrame) = d.as[(String, Int, Int)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    hrows(hfold(hfold(hll0, b1), b1)) shouldBe hrows(hfold(hll0, b1))
    // CDC: upserts rewrite the same payload, deletes re-miss
    val snap0 = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "bal")
    val changes = Seq((1L, "U", 11.0), (2L, "D", 0.0), (4L, "U", 44.0))
      .toDF("k", "op", "bal")
    def crows(d: DataFrame) =
      d.as[(Long, Double)].collect().sortBy(_._1).toSeq
    val applied = Merge.applyChanges(snap0, changes, "k", "op")
      .localCheckpoint()
    crows(Merge.applyChanges(applied, changes, "k", "op")) shouldBe
      crows(applied)
    // ANN upsert: the anti-join retires the batch's own ids first, so
    // re-upserting the same vectors lands on the identical index
    // (plain APPEND would duplicate — that one stays ledgered)
    val rnd = new scala.util.Random(17)
    val vecs = Seq.tabulate(12)(i =>
      (i.toLong, Seq.fill(8)(rnd.nextDouble() - 0.5)))
    val vseed = vecs.take(8).toDF("id", "v")
    val cents = Similarity.trainCentroids(vseed, "id", "v", k = 2,
      iters = 2)
    val books = Similarity.pqCodebooks(vseed, "id", "v", dim = 8,
      m = 4, ks = 4, iters = 2)
    val idx0 = Similarity.ivfPqIndex(vseed, "id", "v", cents, books)
      .localCheckpoint()
    val vb = vecs.drop(8).toDF("id", "v")
    def irows(d: DataFrame) =
      d.as[(Long, Int, Seq[Int])].collect().sortBy(_._1).toSeq
    val up1 = Similarity.ivfPqIndexUpsert(idx0, vb, "id", "v", cents,
      books).localCheckpoint()
    irows(Similarity.ivfPqIndexUpsert(up1, vb, "id", "v", cents,
      books)) shouldBe irows(up1)
  }
}
