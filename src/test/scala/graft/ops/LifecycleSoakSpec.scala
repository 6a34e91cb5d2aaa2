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
  * from-scratch equality) are out of scope here by design — their
  * contracts are pinned by their own oracles (q_quantile_retract,
  * q_sample_retract). */
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
}
