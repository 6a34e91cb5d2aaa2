package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpecBase

/** Retraction SOAK (round-19 delivery): the deletion story is proven
  * per-op by the single-step oracles; this proves it COMPOSED — a
  * 24-night chained lifecycle interleaving APPEND, UPSERT, RETRACT,
  * and COMPACT across six artifact families at once, asserting
  * artifact == from-scratch on the live corpus after EVERY night.
  * Catches the drift no single-step oracle can: a verb leaving an
  * artifact subtly off-contract in a way only a LATER different verb
  * exposes (e.g. a retract that breaks the min-label invariant the
  * next incremental fold relies on, or a compact that perturbs a row
  * a later subtract must hit).
  *
  * Families: LSH dedup index, cluster labels + pair store, counted
  * winnow index, CMS grids, BM25 df table, and the IVF-PQ ANN index.
  * The gracefully-DEGRADING artifacts (quantile/priority bottom-k,
  * whose retraction intentionally yields reduced resolution, not
  * from-scratch equality at the original k/m) are excluded from THAT
  * leg by design and get their own soak below (round 20): the same
  * night-over-night cadence, asserting their DOCUMENTED bound —
  * exact bottom-m'/top-m' validity on the live corpus at the reduced
  * resolution, exact m' arithmetic, and tau monotonicity across
  * retractions — on top of the single-step oracles
  * (q_quantile_retract, q_sample_retract). */
class LifecycleSoakSpec extends SparkSpecBase with Matchers {
  import spark.implicits._

  private val boiler = "identical boilerplate preamble text"
  private def textOf(i: Long, v: Int): String =
    s"$boiler unique tail number $i version $v with words $i$i"
  private def vecOf(i: Long, v: Int): Seq[Double] = {
    val rnd = new scala.util.Random(i * 31 + v)
    Seq.fill(8)(rnd.nextDouble() - 0.5)
  }

  /** Hard pin: collect + re-parallelize. `localCheckpoint` truncates
    * lineage for EXECUTION but CARRIES the origin plan's statistics —
    * chained night-over-night, join size-estimates multiply (self-join
    * cascades SQUARE), and by ~night 12 the sizeInBytes BigInts have
    * ~1e8 bits and Catalyst spends minutes in BigInteger Toom-Cook
    * multiplication on every plan touch (found by jstack in this very
    * spec). Production folds that write/read parquet are immune (file
    * stats are fresh); this harness chains 24 nights in ONE session,
    * so it pins the way a stored table would: data out, fresh leaf in.
    * Schema metadata (artifact stamps) survives createDataFrame. */
  private def hardPin(df: DataFrame): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(df.collect().toSeq, 2), df.schema)

  test("24-night append/upsert/retract/compact lifecycle: six " +
      "artifacts equal their from-scratch builds after every night") {
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val cap = 1000 // no downward cap crossing: the soak covers the
                   // exactly-invertible regime; the crossing policy
                   // has its own spec
    // live corpus state, driver-side: id -> text version
    var live = scala.collection.mutable.LinkedHashMap[Long, Int]()

    def docsDf(m: Iterable[(Long, Int)]): DataFrame =
      m.toSeq.map { case (i, v) => (i, textOf(i, v)) }.toDF("id", "text")
    def vecsDf(m: Iterable[(Long, Int)]): DataFrame =
      m.toSeq.map { case (i, v) => (i, vecOf(i, v)) }.toDF("id", "v")
    def cmsKeyed(d: DataFrame): DataFrame =
      d.select(lit("g").as("g"), xxhash64(col("text")).as("k"))

    // night-0 seed
    live ++= Seq(1L -> 0, 2L -> 0, 3L -> 0)
    val seedDocs = docsDf(live)
    // trained ANN artifacts are FROZEN at night 0 (the reuse gate is
    // embeddingShift's job); every maintenance verb must use them.
    // Train on a WIDER sample than the 3 live seeds (k-means with
    // ks=4 codewords needs >= 4 training points) — artifact identity
    // is what matters, and both the maintained chain and every
    // from-scratch rebuild use these same frozen arrays.
    val trainVecs = vecsDf((1L to 8L).map(_ -> 0))
    val cents = Similarity.trainCentroids(trainVecs, "id", "v",
      k = 2, iters = 2)
    val books = Similarity.pqCodebooks(trainVecs, "id", "v", dim = 8,
      m = 4, ks = 4, iters = 2)

    var lsh = Dedup.lshDedupIndex(seedDocs, "id", "text").transform(hardPin)
    var winnow = Dedup.winnowIndexCounted(seedDocs, "id", "text",
      maxBucketSize = cap).transform(hardPin)
    var cms = Sketches.cmsGrids(cmsKeyed(seedDocs), Seq("g"), "k", 4, 64)
      .transform(hardPin)
    var dfs = TextAnalysis.dfTable(seedDocs, "id", "text").transform(hardPin)
    var ann = Similarity.ivfPqIndex(vecsDf(live), "id", "v", cents, books)
      .transform(hardPin)
    var pairStore = Dedup.nearDupPairs(seedDocs, "id", "text")
      .select("id_a", "id_b").transform(hardPin)
    var labels = Dedup.incrementalClusters(
      Seq.empty[(Long, Long, Long)].toDF("id", "cluster_id", "cluster_size"),
      seedDocs.select("id"), pairStore).transform(hardPin)

    def appendNight(ids: Seq[Long]): Unit = {
      val batchMap = ids.map(_ -> 0)
      val batch = docsDf(batchMap)
      // clusters first: cross pairs come from the PRE-APPEND index
      // (the nightly trilogy's contract — old text never rescanned)
      val cross = Dedup.screenAgainstLshIndex(batch, "id", "text", lsh)
        .select(col("new_id").as("id_a"), col("old_id").as("id_b"))
      val within = Dedup.nearDupPairs(batch, "id", "text")
        .select("id_a", "id_b")
      val newPairs = cross.unionByName(within).transform(hardPin)
      labels = Dedup.incrementalClusters(labels, batch.select("id"),
        newPairs).transform(hardPin)
      pairStore = pairStore.unionByName(newPairs).transform(hardPin)
      lsh = lsh.unionByName(Dedup.lshDedupIndex(batch, "id", "text"))
        .transform(hardPin)
      winnow = Dedup.winnowIndexMerge(Seq(winnow,
        Dedup.winnowIndexCounted(batch, "id", "text",
          maxBucketSize = cap)), maxBucketSize = cap).transform(hardPin)
      cms = Sketches.cmsMergeGrids(Seq(cms,
        Sketches.cmsGrids(cmsKeyed(batch), Seq("g"), "k", 4, 64)),
        Seq("g"), 4, 64).transform(hardPin)
      dfs = TextAnalysis.dfTableMerge(Seq(dfs,
        TextAnalysis.dfTable(batch, "id", "text"))).transform(hardPin)
      ann = Similarity.ivfPqIndexAppend(ann, vecsDf(batchMap), "id", "v",
        cents, books).transform(hardPin)
      live ++= batchMap
    }

    def retractNight(ids: Seq[Long]): Unit = {
      val rmMap = ids.map(i => i -> live(i))
      val rmDocs = docsDf(rmMap)
      val rmIds = ids.toDF("id")
      lsh = Dedup.lshIndexRetract(lsh, rmIds).transform(hardPin)
      winnow = Dedup.winnowIndexRetract(winnow, rmDocs, "id", "text",
        maxBucketSize = cap).transform(hardPin)
      cms = Sketches.cmsSubtractGrids(cms,
        Sketches.cmsGrids(cmsKeyed(rmDocs), Seq("g"), "k", 4, 64),
        Seq("g"), 4, 64).transform(hardPin)
      dfs = TextAnalysis.dfTableRetract(dfs, rmDocs, "id", "text")
        .transform(hardPin)
      ann = Similarity.ivfPqIndexRetract(ann, rmIds, "id").transform(hardPin)
      labels = Dedup.retractClusters(labels, pairStore, rmIds)
        .transform(hardPin)
      pairStore = pairStore
        .join(rmIds.select(col("id").as("id_a")), Seq("id_a"), "left_anti")
        .join(rmIds.select(col("id").as("id_b")), Seq("id_b"), "left_anti")
        .select("id_a", "id_b").transform(hardPin)
      ids.foreach(live.remove)
    }

    def upsertNight(ids: Seq[Long]): Unit = {
      // re-ingest: new text version + re-embedded vector. Text-keyed
      // artifacts compose retract(old version) + append(new version) —
      // the documented upsert composition; the ANN index additionally
      // exercises its NATIVE upsert verb (anti-join + append) on the
      // same night.
      val newVer = ids.map(i => i -> (live(i) + 1))
      retractNight(ids)
      val batch = docsDf(newVer)
      val cross = Dedup.screenAgainstLshIndex(batch, "id", "text", lsh)
        .select(col("new_id").as("id_a"), col("old_id").as("id_b"))
      val within = Dedup.nearDupPairs(batch, "id", "text")
        .select("id_a", "id_b")
      val newPairs = cross.unionByName(within).transform(hardPin)
      labels = Dedup.incrementalClusters(labels, batch.select("id"),
        newPairs).transform(hardPin)
      pairStore = pairStore.unionByName(newPairs).transform(hardPin)
      lsh = lsh.unionByName(Dedup.lshDedupIndex(batch, "id", "text"))
        .transform(hardPin)
      winnow = Dedup.winnowIndexMerge(Seq(winnow,
        Dedup.winnowIndexCounted(batch, "id", "text",
          maxBucketSize = cap)), maxBucketSize = cap).transform(hardPin)
      cms = Sketches.cmsMergeGrids(Seq(cms,
        Sketches.cmsGrids(cmsKeyed(batch), Seq("g"), "k", 4, 64)),
        Seq("g"), 4, 64).transform(hardPin)
      dfs = TextAnalysis.dfTableMerge(Seq(dfs,
        TextAnalysis.dfTable(batch, "id", "text"))).transform(hardPin)
      ann = Similarity.ivfPqIndexUpsert(ann, vecsDf(newVer), "id", "v",
        cents, books).transform(hardPin)
      newVer.foreach { case (i, v) => live(i) = v }
    }

    def compactNight(): Unit = {
      lsh = Dedup.lshIndexCompact(lsh).transform(hardPin)
      winnow = Dedup.winnowIndexCompact(winnow).transform(hardPin)
      labels = Dedup.labelStoreCompact(labels).transform(hardPin)
      pairStore = Dedup.pairStoreCompact(pairStore).transform(hardPin)
      dfs = TextAnalysis.dfTableCompact(dfs).transform(hardPin)
      ann = Similarity.ivfPqIndexCompact(ann, "id").transform(hardPin)
    }

    def assertAllEqualFromScratch(night: String): Unit = {
      val liveDocs = docsDf(live)
      withClue(s"[$night] lsh: ") {
        def rows(d: DataFrame) = d
          .select(col("id"), col("nsh"), col("sig"), col("sh"))
          .as[(Long, Int, Seq[Long], Seq[Long])].collect().sortBy(_._1).toSeq
        rows(lsh) shouldBe rows(
          Dedup.lshDedupIndex(liveDocs, "id", "text"))
      }
      withClue(s"[$night] winnow: ") {
        def rows(d: DataFrame) =
          d.as[(Long, Long, Seq[Long])].collect().sortBy(_._1).toSeq
        rows(winnow) shouldBe rows(Dedup.winnowIndexCounted(liveDocs,
          "id", "text", maxBucketSize = cap))
      }
      withClue(s"[$night] cms: ") {
        def rows(d: DataFrame) =
          d.as[(String, Seq[Long])].collect().sortBy(_._1).toSeq
        rows(cms) shouldBe rows(Sketches.cmsGrids(cmsKeyed(liveDocs),
          Seq("g"), "k", 4, 64))
      }
      withClue(s"[$night] dfTable: ") {
        dfs.as[(String, Long)].collect().sortBy(_._1).toSeq shouldBe
          TextAnalysis.dfTable(liveDocs, "id", "text")
            .as[(String, Long)].collect().sortBy(_._1).toSeq
      }
      withClue(s"[$night] ann: ") {
        def rows(d: DataFrame) =
          d.as[(Long, Int, Seq[Int])].collect().sortBy(_._1).toSeq
        rows(ann) shouldBe rows(Similarity.ivfPqIndex(vecsDf(live),
          "id", "v", cents, books))
      }
      withClue(s"[$night] labels: ") {
        def rows(d: DataFrame) =
          d.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
        rows(labels) shouldBe rows(Dedup.incrementalClusters(
          Seq.empty[(Long, Long, Long)]
            .toDF("id", "cluster_id", "cluster_size"),
          liveDocs.select("id"),
          Dedup.nearDupPairs(liveDocs, "id", "text")
            .select("id_a", "id_b")))
      }
    }

    // the 24-night script: every verb hits every family several
    // times, interleaved so later verbs read earlier verbs' outputs
    val script: Seq[(String, () => Unit)] = Seq(
      "n01 append 4-5" -> (() => appendNight(Seq(4L, 5L))),
      "n02 append 6-7" -> (() => appendNight(Seq(6L, 7L))),
      "n03 retract 2" -> (() => retractNight(Seq(2L))),
      "n04 compact" -> (() => compactNight()),
      "n05 append 8-9" -> (() => appendNight(Seq(8L, 9L))),
      "n06 upsert 4" -> (() => upsertNight(Seq(4L))),
      "n07 retract 6 9" -> (() => retractNight(Seq(6L, 9L))),
      "n08 append 10-11" -> (() => appendNight(Seq(10L, 11L))),
      "n09 compact" -> (() => compactNight()),
      "n10 upsert 1 8" -> (() => upsertNight(Seq(1L, 8L))),
      "n11 retract 3" -> (() => retractNight(Seq(3L))),
      "n12 append 12" -> (() => appendNight(Seq(12L))),
      "n13 retract 10" -> (() => retractNight(Seq(10L))),
      "n14 compact" -> (() => compactNight()),
      "n15 append 13-14" -> (() => appendNight(Seq(13L, 14L))),
      "n16 upsert 5" -> (() => upsertNight(Seq(5L))),
      "n17 retract 7 12" -> (() => retractNight(Seq(7L, 12L))),
      "n18 append 15" -> (() => appendNight(Seq(15L))),
      "n19 compact" -> (() => compactNight()),
      "n20 upsert 11 13" -> (() => upsertNight(Seq(11L, 13L))),
      "n21 retract 1" -> (() => retractNight(Seq(1L))),
      "n22 append 16-17" -> (() => appendNight(Seq(16L, 17L))),
      "n23 retract 14 16" -> (() => retractNight(Seq(14L, 16L))),
      "n24 compact" -> (() => compactNight()))
    script.foreach { case (night, run) =>
      // progress marker: a failed run's log names the last-green night
      println(s"[soak] running $night (live=${live.size})")
      run()
      assertAllEqualFromScratch(night)
    }
    // the soak actually exercised a non-trivial end state
    live.keySet should contain allOf (5L, 8L, 11L, 13L, 15L, 17L)
    live.keySet should contain noneOf (1L, 2L, 3L, 14L)
  }

  test("degrading-artifact soak (round 20): the quantile bottom-k and " +
      "priority top-m samples stay VALID samples of the live corpus at " +
      "their documented reduced resolution through 12 nights of " +
      "interleaved append/retract — bottom-m'/top-m' equality vs " +
      "from-scratch EVERY night, exact m' arithmetic, and tau " +
      "monotonicity across every retraction") {
    import graft.functions.LongHashes
    // These two families are EXCLUDED from the exact soak above by
    // design: retraction yields reduced resolution, not from-scratch
    // equality at the ORIGINAL k/m. Their documented contract is
    // stronger than "approximately fine", though — the degraded
    // artifact equals the from-scratch sample of the SURVIVING corpus
    // at resolution m' = k − |removed ∩ stored| EXACTLY (a removal
    // cannot promote a survivor past the old threshold), and further
    // snapshots fold at the reduced resolution (top-m'/bottom-m'
    // closure under union). This leg asserts exactly that, night over
    // night, plus the serve-side threshold law: the DLT tau can only
    // FALL when rows leave (a retraction never tightens the sample's
    // coverage claim).
    //
    // Re-stamping at m' is part of the documented flow: the stamp
    // carries the artifact's RESOLUTION, and a retraction reduces it —
    // the restamp is the operator's acknowledgment (without it, the
    // next fold's same-k check raises, by design).
    val g = Seq("g")
    def w(id: Long): Long = (id * 37) % 101 + 1
    def v(id: Long): Long = (id * 53) % 997
    def corpus(ids: Iterable[Long]): DataFrame =
      ids.toSeq.map(i => ("all", i, w(i), v(i))).toDF("g", "id", "w", "v0")
        .select(col("g"), col("id"), col("w"),
          LongHashes.splitmix64(col("id")).as("h"),
          col("v0").as("v"))
    val live = scala.collection.mutable.LinkedHashSet[Long]()
    live ++= (1L to 60L)
    var kQ = 30 // quantile resolution, non-increasing over the soak
    var mP = 24 // priority resolution, non-increasing over the soak
    val kTau = 4
    var qsk = Sketches.quantileSummaries(corpus(live), g, "h", "v", kQ)
      .transform(hardPin)
    var wsample = Sampling.prioritySamples(corpus(live), g, "id", "w", mP)
      .transform(hardPin)

    def qRows: Seq[(Long, Long)] = qsk.select(explode(col("qsketch")))
      .select(col("col.fkey"), col("col.v")).as[(Long, Long)].collect().toSeq
    def pRows: Seq[(Double, Long, Long)] =
      wsample.select(explode(col("wsample")))
        .select(col("col.np"), col("col.id"), col("col.w"))
        .as[(Double, Long, Long)].collect().toSeq
    /** The DLT threshold in weight units off the CURRENT sample —
      * 0 when the sample holds no (kTau+1)-th entry. */
    def tau(): Double = {
      val ps = pRows
      if (ps.size > kTau) -ps(kTau)._1 * 9223372036854775808.0 else 0.0
    }

    def appendNight(ids: Seq[Long]): Unit = {
      require(ids.forall(i => !live.contains(i)))
      live ++= ids
      val batch = corpus(ids)
      // fold at the CURRENT (possibly reduced) resolution — the
      // documented degraded-fold rule
      qsk = Sketches.quantileMergeSummaries(Seq(qsk,
        Sketches.quantileSummaries(batch, g, "h", "v", kQ)), g, kQ)
        .transform(hardPin)
      wsample = Sampling.prioritySampleMerge(Seq(wsample,
        Sampling.prioritySamples(batch, g, "id", "w", mP)), g, mP)
        .transform(hardPin)
    }

    def retractNight(ids: Seq[Long]): Unit = {
      require(ids.forall(live.contains))
      val tauBefore = tau()
      val qBefore = qRows
      val pBefore = pRows
      live --= ids
      val rmHashes = corpus(ids).select(collect_list(col("h")))
        .as[Seq[Long]].head()
      val rmFlipped = rmHashes.map(_ ^ Long.MinValue).toSet
      qsk = qsk.select(col("g"),
        Sketches.quantilePairsRetract(col("qsketch"),
          typedLit(rmHashes)).as("qsketch")).transform(hardPin)
      wsample = wsample.select(col("g"),
        Sampling.priorityPairsRetract(col("wsample"),
          typedLit(ids)).as("wsample")).transform(hardPin)
      // exact m' arithmetic: resolution drops by EXACTLY the stored
      // hits — never more (unsampled removals are free), never less
      val qHits = qBefore.count(r => rmFlipped.contains(r._1))
      val pHits = pBefore.count(r => ids.contains(r._2))
      qRows.size shouldBe qBefore.size - qHits
      pRows.size shouldBe pBefore.size - pHits
      kQ = math.min(kQ, qRows.size max 1)
      mP = math.min(mP, pRows.size max 1)
      // the operator's acknowledgment of reduced resolution
      qsk = ArtifactStamp.stamp(qsk, "qsketch", "quantile",
        "k" -> kQ.toLong).transform(hardPin)
      wsample = ArtifactStamp.stamp(wsample, "wsample", "priority_sample",
        "m" -> mP.toLong).transform(hardPin)
      // tau monotonicity: rows leaving can only LOWER the serve
      // threshold (or leave it at 0) — a rising tau after a retraction
      // would claim coverage the degraded sample no longer has
      withClue(s"tau after retract of $ids: ") {
        tau() should be <= tauBefore
      }
    }

    def assertValidAtReducedResolution(night: String): Unit = {
      val liveC = corpus(live)
      withClue(s"[$night] quantile bottom-m' validity: ") {
        val scratch = Sketches.quantileSummaries(liveC, g, "h", "v", kQ)
          .select(explode(col("qsketch")))
          .select(col("col.fkey"), col("col.v"))
          .as[(Long, Long)].collect().toSeq
        qRows shouldBe scratch
      }
      withClue(s"[$night] priority top-m' validity: ") {
        val scratch = Sampling.prioritySamples(liveC, g, "id", "w", mP)
          .select(explode(col("wsample")))
          .select(col("col.np"), col("col.id"), col("col.w"))
          .as[(Double, Long, Long)].collect().toSeq
        pRows shouldBe scratch
      }
    }

    val script: Seq[(String, () => Unit)] = Seq(
      "n01 append 61-68" -> (() => appendNight((61L to 68L).toSeq)),
      "n02 retract mod5" -> (() =>
        retractNight(live.toSeq.filter(_ % 5 == 0))),
      "n03 append 69-76" -> (() => appendNight((69L to 76L).toSeq)),
      "n04 retract mod7" -> (() =>
        retractNight(live.toSeq.filter(_ % 7 == 0))),
      "n05 append 77-84" -> (() => appendNight((77L to 84L).toSeq)),
      "n06 retract mod11" -> (() =>
        retractNight(live.toSeq.filter(_ % 11 == 0))),
      "n07 append 85-92" -> (() => appendNight((85L to 92L).toSeq)),
      "n08 retract mod13" -> (() =>
        retractNight(live.toSeq.filter(_ % 13 == 0))),
      "n09 append 93-100" -> (() => appendNight((93L to 100L).toSeq)),
      "n10 retract mod17" -> (() =>
        retractNight(live.toSeq.filter(_ % 17 == 0))),
      "n11 append 101-108" -> (() => appendNight((101L to 108L).toSeq)),
      "n12 retract mod19" -> (() =>
        retractNight(live.toSeq.filter(_ % 19 == 0))))
    script.foreach { case (night, run) =>
      println(s"[soak-degrading] running $night " +
        s"(live=${live.size}, kQ=$kQ, mP=$mP)")
      run()
      assertValidAtReducedResolution(night)
    }
    // the soak actually degraded (resolution fell) yet stayed serveable
    kQ should be < 30
    mP should be < 24
    mP should be > kTau // tau still has a real (kTau+1)-th entry to read
    // both degraded artifacts still SERVE: a DLT estimate row per
    // top-kTau entry, and a median off the reduced sketch
    wsample.select(org.apache.spark.sql.functions.size(
        Sampling.priorityEstimates(col("wsample"), kTau)))
      .as[Int].head() shouldBe kTau
    qsk.select(Sketches.summaryQuantile(col("qsketch"), 0.5))
      .as[Double].head() should be >= 0.0
  }
}
