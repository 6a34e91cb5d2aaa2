package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.matchers.should.Matchers

import graft.SparkSpecBase

/** True incremental execution of the stateful streaming ops, driven by
  * MemoryStream batches (batch-mode parity of windowedAgg/sessionAgg is
  * covered by the driver oracle queries q_stream_window/q_stream_session). */
class StreamOpsSpec extends SparkSpecBase with Matchers {
  import spark.implicits._

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:$second%02d")

  test("windowedAgg aggregates event-time windows incrementally (update mode)") {
    val in = MemoryStream[(Timestamp, String, Double)](spark)
    val agg = StreamOps.windowedAgg(
      in.toDF().toDF("ts", "key", "v"), "ts", "key", "v", "5 minutes")
    in.addData((ts(0), "a", 1.0), (ts(1), "a", 2.0), (ts(6), "a", 10.0),
      (ts(2), "b", 5.0))
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("win_agg")
      .select(col("win_start").cast("string"), col("key"), col("n"), col("total"))
      .as[(String, String, Long, Double)].collect().sortBy(r => (r._2, r._1))
    rows shouldBe Array(
      ("2026-01-01 10:00:00", "a", 2L, 3.0),
      ("2026-01-01 10:05:00", "a", 1L, 10.0),
      ("2026-01-01 10:00:00", "b", 1L, 5.0))
  }

  test("sessionAgg merges events within the gap into one session") {
    val in = MemoryStream[(Timestamp, String)](spark)
    val agg = StreamOps.sessionAgg(
      in.toDF().toDF("ts", "key"), "ts", "key", gap = "2 minutes")
    // key a: 10:00, 10:01, 10:02 -> one session; 10:10 -> second session.
    in.addData((ts(0), "a"), (ts(1), "a"), (ts(2), "a"), (ts(10), "a"))
    // session windows support complete/append output, not update
    val q = agg.writeStream.format("memory").queryName("sess_agg")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("sess_agg")
      .select(col("sess_start").cast("string"), col("sess_end").cast("string"),
        col("n")).as[(String, String, Long)].collect().sortBy(_._1)
    rows shouldBe Array(
      ("2026-01-01 10:00:00", "2026-01-01 10:04:00", 3L),
      ("2026-01-01 10:10:00", "2026-01-01 10:12:00", 1L))
  }

  test("dedupWithinWatermark drops duplicate ids within and across batches") {
    val in = MemoryStream[(Timestamp, Long, String)](spark)
    val out = StreamOps.dedupWithinWatermark(
      in.toDF().toDF("ts", "id", "payload"), "ts", "30 minutes", Seq("id"))
    // one long-lived query: state (seen ids) must survive across batches
    val q = out.writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    in.addData((ts(0), 1L, "first"), (ts(1), 1L, "dup-same-batch"),
      (ts(2), 2L, "other"))
    q.processAllAvailable()
    in.addData((ts(3), 1L, "dup-next-batch"), (ts(4), 3L, "new"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("stream_dedup").select("id", "payload")
      .as[(Long, String)].collect().sortBy(_._1)
    ids shouldBe Array((1L, "first"), (2L, "other"), (3L, "new"))
  }

  test("streamingIntervalJoin pairs rows within the window, incrementally") {
    val lIn = MemoryStream[(Timestamp, String, Long)](spark)
    val rIn = MemoryStream[(Timestamp, String, Long)](spark)
    val joined = StreamOps.streamingIntervalJoin(
      lIn.toDF().toDF("ts", "k", "purchase_id"),
      rIn.toDF().toDF("ts", "k", "click_id"),
      "k", "ts", lowerSec = -600, upperSec = 0) // clicks in prior 10 min
    val q = joined.writeStream.format("memory").queryName("sij")
      .outputMode("append").start()
    // batch 1: clicks before the purchases arrive (cross-batch state)
    rIn.addData((ts(0), "a", 100L), (ts(8), "a", 101L), (ts(0), "b", 200L))
    q.processAllAvailable()
    // batch 2: purchases; a@10:09 sees clicks at 10:00+10:08, b@10:30 none
    lIn.addData((ts(9), "a", 1L), (ts(30), "b", 2L))
    q.processAllAvailable()
    // batch 3: a late-but-in-window click pairs with the earlier purchase
    rIn.addData((ts(9), "a", 102L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sij")
      .select("k", "purchase_id", "right_click_id")
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2, r._3))
    rows.toSeq shouldBe Seq(("a", 1L, 100L), ("a", 1L, 101L), ("a", 1L, 102L))
  }

  test("streamingIntervalJoin left_outer null-emits an unmatched left " +
      "once the watermark closes its window, incrementally") {
    val lIn = MemoryStream[(Timestamp, String, Long)](spark)
    val rIn = MemoryStream[(Timestamp, String, Long)](spark)
    val joined = StreamOps.streamingIntervalJoin(
      lIn.toDF().toDF("ts", "k", "purchase_id"),
      rIn.toDF().toDF("ts", "k", "click_id"),
      "k", "ts", lowerSec = -600, upperSec = 0,
      watermarkDelay = "0 seconds", joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("sloj")
      .outputMode("append").start()
    // a@10:09 has a click in window; b@10:30 has none
    rIn.addData((ts(0), "a", 100L))
    lIn.addData((ts(9), "a", 1L), (ts(30), "b", 2L))
    q.processAllAvailable()
    // advance BOTH watermarks well past b's window close so the join
    // can PROVE no right row can still arrive for it (outer emission
    // happens in a batch after the watermark passes, hence two rounds)
    lIn.addData((ts(120), "z", 9L)); rIn.addData((ts(120), "z", 900L))
    q.processAllAvailable()
    lIn.addData((ts(130), "z", 10L)); rIn.addData((ts(130), "z", 901L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sloj")
      .select("k", "purchase_id", "right_click_id")
      .as[(String, Long, Option[Long])].collect().toSet
    rows should contain((("a", 1L, Some(100L))))
    rows should contain((("b", 2L, None)))
  }

  test("streamingIntervalJoin on batch frames equals RangeJoin semantics") {
    val l = Seq((ts(9), "a", 1L), (ts(30), "b", 2L)).toDF("ts", "k", "pid")
    val r = Seq((ts(0), "a", 100L), (ts(8), "a", 101L), (ts(25), "b", 200L),
      (ts(31), "b", 201L)).toDF("ts", "k", "cid")
    val got = StreamOps.streamingIntervalJoin(l, r, "k", "ts", -600, 0)
      .select("k", "pid", "right_cid").as[(String, Long, Long)]
      .collect().sortBy(x => (x._1, x._2, x._3))
    got.toSeq shouldBe Seq(("a", 1L, 100L), ("a", 1L, 101L), ("b", 2L, 200L))
  }

  test("firstSeen emits one record per key across batches (custom state)") {
    val in = MemoryStream[(Long, String)](spark)
    val out = StreamOps.firstSeen[Long, (Long, String)](in.toDS(), _._1)
    val q = out.writeStream.format("memory").queryName("first_seen")
      .outputMode("append").start()
    in.addData((1L, "a1"), (2L, "b1"))
    q.processAllAvailable()
    in.addData((1L, "a2"), (3L, "c1"))
    q.processAllAvailable()
    q.stop()
    spark.table("first_seen").as[(Long, String)].collect().sortBy(_._1) shouldBe
      Array((1L, "a1"), (2L, "b1"), (3L, "c1"))
  }

  test("streaming CDC: compactLastWins + applyChanges inside " +
      "foreachBatch maintain a live snapshot; final state equals the " +
      "one-shot batch merge of the whole feed") {
    // The Delta-style streaming-merge loop: each micro-batch compacts
    // its own changes, then folds into the running snapshot — per-batch
    // compaction is sound because a LATER batch's change always beats
    // an earlier batch's (event ts rises with the feed), so
    // batch-by-batch last-wins == global last-wins.
    import graft.ops.Merge
    val snapshot0 = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "bal")
    var snapshot = snapshot0
    val in = MemoryStream[(Long, Long, String, Double)](spark)
    val q = in.toDS().toDF("k", "ts", "op", "bal").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val compacted = Merge.compactLastWins(batch, "k", "ts").drop("ts")
        snapshot = Merge.applyChanges(snapshot, compacted, "k", "op")
          .localCheckpoint() // pin: next batch joins a frame, not a lineage
        ()
      }.start()
    in.addData((1L, 1L, "U", 11.0), (1L, 2L, "U", 12.0), (4L, 3L, "U", 44.0))
    q.processAllAvailable()
    in.addData((2L, 4L, "D", 0.0), (1L, 5L, "U", 13.0))
    q.processAllAvailable()
    q.stop()
    val streamed = snapshot.as[(Long, Double)].collect().toSeq.sortBy(_._1)
    streamed shouldBe Seq((1L, 13.0), (3L, 30.0), (4L, 44.0))
    // parity: one-shot merge of the full compacted feed
    val feed = Seq((1L, 1L, "U", 11.0), (1L, 2L, "U", 12.0),
      (4L, 3L, "U", 44.0), (2L, 4L, "D", 0.0), (1L, 5L, "U", 13.0))
      .toDF("k", "ts", "op", "bal")
    val oneShot = Merge.applyChanges(snapshot0,
        Merge.compactLastWins(feed, "k", "ts").drop("ts"), "k", "op")
      .as[(Long, Double)].collect().toSeq.sortBy(_._1)
    streamed shouldBe oneShot
  }

  test("streaming incremental aggregation: incrementalCountSum inside " +
      "foreachBatch maintains a live (count, sum) snapshot; final " +
      "state equals the one-shot application of the whole feed") {
    // Aggregate maintenance composes across micro-batches because
    // signed contributions are associative: fold(fold(base, b1), b2)
    // == fold(base, b1 ++ b2). Each batch touches |keys| + |batch|
    // rows — the streaming form of the never-rescan contract.
    import graft.ops.Merge
    val dec = org.apache.spark.sql.types.DecimalType(28, 4)
    val base = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0)).toDF("k", "v")
      .groupBy("k").agg(count(lit(1)).as("n"),
        sum(col("v").cast(dec)).cast(dec).as("s"))
    var snapshot = base
    val in = MemoryStream[(String, String, Double)](spark)
    val q = in.toDS().toDF("op", "k", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        snapshot = Merge.incrementalCountSum(snapshot, batch,
          Seq("k"), "op", "v").localCheckpoint()
        ()
      }.start()
    in.addData(("I", "a", 2.0), ("I", "c", 9.0))
    q.processAllAvailable()
    in.addData(("D", "b", 5.0), ("I", "c", 1.0))
    q.processAllAvailable()
    q.stop()
    val streamed = snapshot
      .select(col("k"), col("n"), col("s").cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    streamed shouldBe Seq(("a", 3L, 6.0), ("c", 2L, 10.0))
    // parity with the one-shot fold of the full feed
    val feed = Seq(("I", "a", 2.0), ("I", "c", 9.0), ("D", "b", 5.0),
      ("I", "c", 1.0)).toDF("op", "k", "v")
    streamed shouldBe Merge.incrementalCountSum(base, feed, Seq("k"),
        "op", "v")
      .select(col("k"), col("n"), col("s").cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
  }

  test("streaming incremental dedup trilogy: nightly " +
      "screenAgainstLshIndex + incrementalClusters + index append " +
      "inside foreachBatch across micro-batches equals the one-shot " +
      "from-scratch clustering of the whole corpus") {
    // The nightly loop as a stream: each micro-batch screens against
    // the STORED fingerprint index (old text never rescanned), folds
    // its cross + within pairs into the stored labels, then appends
    // its own fingerprints to the index for the NEXT batch — so a
    // batch-2 doc can near-dup a batch-1 doc through the index alone.
    import graft.ops.Dedup
    val seed = Seq(
      (2L, "the quick brown fox jumps over the lazy dog"),
      (4L, "an utterly different sentence about spark streaming state stores"))
      .toDF("id", "text")
    val b1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "the quick brown fox jumps over my lazy dog"))
    val b2 = Seq(
      (5L, "an utterly different sentence about spark streaming state store"),
      (7L, "completely unrelated text mentioning nothing else at all whatsoever"))
    def labelsOf(df: org.apache.spark.sql.DataFrame) = {
      val paired = Dedup.nearDupClusters(
        Dedup.nearDupPairs(df, "id", "text"))
      df.select(col("id"))
        .join(paired.select(col("id"), col("cluster_id")), Seq("id"), "left")
        .select(col("id"), coalesce(col("cluster_id"), col("id"))
          .as("cluster_id"))
    }
    var index = Dedup.lshDedupIndex(seed, "id", "text").localCheckpoint()
    var labels = labelsOf(seed).localCheckpoint()
    val in = MemoryStream[(Long, String)](spark)
    val q = in.toDS().toDF("id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val pinned = batch.localCheckpoint()
        val cross = Dedup.screenAgainstLshIndex(pinned, "id", "text", index)
          .select(col("new_id").as("id_a"), col("old_id").as("id_b"))
        val within = Dedup.nearDupPairs(pinned, "id", "text")
          .select(col("id_a"), col("id_b"))
        labels = Dedup.incrementalClusters(labels, pinned.select(col("id")),
          cross.unionAll(within)).select(col("id"), col("cluster_id"))
          .localCheckpoint()
        index = index.unionByName(
          Dedup.lshDedupIndex(pinned, "id", "text")).localCheckpoint()
        ()
      }.start()
    in.addData(b1: _*)
    q.processAllAvailable()
    in.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = labels.as[(Long, Long)].collect().sortBy(_._1).toSeq
    // cross-batch structure really exercised: 1 and 3 joined seed 2's
    // cluster through the index, 5 joined seed 4's
    streamed shouldBe Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L),
      (5L, 4L), (7L, 7L))
    // parity: from-scratch clustering of the full corpus
    val all = seed.unionAll((b1 ++ b2).toDF("id", "text"))
    streamed shouldBe labelsOf(all).as[(Long, Long)].collect()
      .sortBy(_._1).toSeq
  }

  test("streaming sketch maintenance: cmsMergeGrids / bloomMergeWords " +
      "inside foreachBatch across micro-batches equal the one-shot " +
      "single-pass sketches of the whole feed") {
    // The nightly sketch fold as a stream: each micro-batch builds its
    // own grids/words and merges into the stored artifacts — sound
    // because cell-wise sum and word-wise OR are associative, the same
    // law the batch oracles (q_cms_incr / q_bloom_incr) prove.
    import graft.ops.Sketches
    val seed = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "k")
    var cms = Sketches.cmsGrids(seed, Seq("g"), "k", 4, 32).localCheckpoint()
    var bloom = Sketches.bloomWords(seed, Seq("g"), "k", 256, 3)
      .localCheckpoint()
    val in = MemoryStream[(String, Long)](spark)
    val q = in.toDS().toDF("g", "k").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val pinned = batch.localCheckpoint()
        cms = Sketches.cmsMergeGrids(Seq(cms,
          Sketches.cmsGrids(pinned, Seq("g"), "k", 4, 32)), Seq("g"), 4, 32)
          .localCheckpoint()
        bloom = Sketches.bloomMergeWords(Seq(bloom,
          Sketches.bloomWords(pinned, Seq("g"), "k", 256, 3)), Seq("g"), 256)
          .localCheckpoint()
        ()
      }.start()
    in.addData(("a", 2L), ("c", 9L))
    q.processAllAvailable()
    in.addData(("b", 3L), ("a", 7L), ("c", 1L))
    q.processAllAvailable()
    q.stop()
    val feed = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("a", 2L), ("c", 9L),
      ("b", 3L), ("a", 7L), ("c", 1L)).toDF("g", "k")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.as[(String, Seq[Long])].collect().sortBy(_._1).toSeq
    rows(cms) shouldBe rows(Sketches.cmsGrids(feed, Seq("g"), "k", 4, 32))
    rows(bloom) shouldBe
      rows(Sketches.bloomWords(feed, Seq("g"), "k", 256, 3))
  }

  test("streaming BM25 statistics maintenance: dfTableMerge / " +
      "docStatsMerge inside foreachBatch across micro-batches equal " +
      "the one-shot stats of the whole corpus — and serving from the " +
      "folded stats equals serving from the one-shot build") {
    import graft.ops.TextAnalysis
    val seed = Seq((1L, "spark shuffles data between stages"),
      (2L, "catalyst optimizes the logical plan")).toDF("id", "text")
    var dfs = TextAnalysis.dfTable(seed, "id", "text").localCheckpoint()
    var totals = TextAnalysis.docStats(seed, "id", "text").localCheckpoint()
    val b1 = Seq((3L, "spark plans shuffles with catalyst"),
      (4L, "the tungsten engine generates code"))
    val b2 = Seq((5L, "stages exchange data through shuffles"))
    val in = MemoryStream[(Long, String)](spark)
    val q = in.toDS().toDF("id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val pinned = batch.localCheckpoint()
        dfs = TextAnalysis.dfTableMerge(Seq(dfs,
          TextAnalysis.dfTable(pinned, "id", "text"))).localCheckpoint()
        totals = TextAnalysis.docStatsMerge(Seq(totals,
          TextAnalysis.docStats(pinned, "id", "text"))).localCheckpoint()
        ()
      }.start()
    in.addData(b1: _*)
    q.processAllAvailable()
    in.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val all = seed.unionAll((b1 ++ b2).toDF("id", "text"))
    dfs.as[(String, Long)].collect().sortBy(_._1).toSeq shouldBe
      TextAnalysis.dfTable(all, "id", "text")
        .as[(String, Long)].collect().sortBy(_._1).toSeq
    totals.as[(Long, Long)].collect().toSeq shouldBe
      TextAnalysis.docStats(all, "id", "text")
        .as[(Long, Long)].collect().toSeq
    // serve parity: identical stats -> identical scores, bit for bit
    def serve(d: org.apache.spark.sql.DataFrame,
        t: org.apache.spark.sql.DataFrame) =
      TextAnalysis.bm25TopDocsFromStats(all, "id", "text",
          Seq("spark", "shuffles"), d, t, k = 3)
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    serve(dfs, totals) shouldBe serve(
      TextAnalysis.dfTable(all, "id", "text"),
      TextAnalysis.docStats(all, "id", "text"))
  }

  test("streaming counted-winnow-index maintenance: winnowIndexMerge " +
      "inside foreachBatch across micro-batches equals the one-shot " +
      "counted index — including an fp crossing the cap only after a " +
      "later batch arrives") {
    import graft.ops.Dedup
    val boiler = "identical boilerplate preamble text"
    val mkDocs = (ids: Seq[Long]) =>
      ids.map(i => (i, s"$boiler unique tail number $i with words $i$i"))
    val cap = 6 // 8 docs total: boiler fps cross the cap mid-stream
    val seed = mkDocs(1L to 3L).toDF("id", "text")
    var index = Dedup.winnowIndexCounted(seed, "id", "text",
      maxBucketSize = cap).localCheckpoint()
    val in = MemoryStream[(Long, String)](spark)
    val q = in.toDS().toDF("id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        index = Dedup.winnowIndexMerge(Seq(index,
          Dedup.winnowIndexCounted(batch.localCheckpoint(), "id", "text",
            maxBucketSize = cap)), maxBucketSize = cap).localCheckpoint()
        ()
      }.start()
    in.addData(mkDocs(4L to 5L): _*)
    q.processAllAvailable()
    in.addData(mkDocs(6L to 8L): _*) // pushes boiler fps over the cap
    q.processAllAvailable()
    q.stop()
    val all = mkDocs(1L to 8L).toDF("id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Long, Seq[Long])].collect().sortBy(_._1).toSeq
    val streamed = rows(index)
    streamed shouldBe rows(Dedup.winnowIndexCounted(all, "id", "text",
      maxBucketSize = cap))
    // the mid-stream cap crossing really happened
    streamed.exists(r => r._2 > cap && r._3.isEmpty) shouldBe true
  }

  test("streaming index lifecycle: APPENDS and RETRACTIONS interleaved " +
      "across micro-batches — the counted winnow index after " +
      "add/add/remove ticks equals the from-scratch index of the " +
      "final corpus, and the LSH index likewise") {
    import graft.ops.Dedup
    val boiler = "identical boilerplate preamble text"
    val doc = (i: Long) =>
      (i, s"$boiler unique tail number $i with words $i$i")
    val seed = Seq(doc(1L), doc(2L)).toDF("id", "text")
    var winnow = Dedup.winnowIndexCounted(seed, "id", "text")
      .localCheckpoint()
    var lsh = Dedup.lshDedupIndex(seed, "id", "text").localCheckpoint()
    // op column: 'I' appends the doc, 'D' retracts it (text rides
    // along — winnow retraction recomputes the removed fps from it)
    val in = MemoryStream[(String, Long, String)](spark)
    val q = in.toDS().toDF("op", "id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val pinned = batch.localCheckpoint()
        val ins = pinned.where(col("op") === "I").select("id", "text")
        val del = pinned.where(col("op") === "D").select("id", "text")
        winnow = Dedup.winnowIndexMerge(Seq(winnow,
          Dedup.winnowIndexCounted(ins, "id", "text"))).localCheckpoint()
        if (del.count() > 0) {
          winnow = Dedup.winnowIndexRetract(winnow, del, "id", "text")
            .localCheckpoint()
          lsh = Dedup.lshIndexRetract(lsh, del.select("id"))
            .localCheckpoint()
        }
        lsh = lsh.unionByName(Dedup.lshDedupIndex(ins, "id", "text"))
          .localCheckpoint()
        ()
      }.start()
    in.addData(("I", 3L, doc(3L)._2), ("I", 4L, doc(4L)._2))
    q.processAllAvailable()
    in.addData(("D", 2L, doc(2L)._2), ("I", 5L, doc(5L)._2))
    q.processAllAvailable()
    in.addData(("D", 4L, doc(4L)._2))
    q.processAllAvailable()
    q.stop()
    val survivors = Seq(1L, 3L, 5L).map(doc).toDF("id", "text")
    def wrows(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Long, Seq[Long])].collect().sortBy(_._1).toSeq
    wrows(winnow) shouldBe
      wrows(Dedup.winnowIndexCounted(survivors, "id", "text"))
    def lrows(d: org.apache.spark.sql.DataFrame) =
      d.select(col("id"), col("nsh"), col("sig"), col("sh"))
        .as[(Long, Int, Seq[Long], Seq[Long])].collect().sortBy(_._1).toSeq
    lrows(lsh) shouldBe
      lrows(Dedup.lshDedupIndex(survivors, "id", "text"))
  }

  test("streaming PageRank warm-start: each micro-batch runs j more " +
      "rounds from the stored table (pageRankWarmStartOn on one " +
      "PrGraph) — after batches of 2+1+2 rounds the state equals 5 " +
      "one-shot rounds (the k+j composition law, streamed)") {
    import graft.ops.Graph
    val rnd = new scala.util.Random(11)
    val es = Seq.fill(24)(
      (rnd.nextInt(10).toLong, rnd.nextInt(10).toLong)).toSet.toSeq
    val g = Graph.prGraph(es.toDF("src", "dst"), "src", "dst")
    var state = Graph.pageRankDanglingOn(g, iters = 2).localCheckpoint()
    val in = MemoryStream[Int](spark)
    val q = in.toDS().toDF("j").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the batch payload IS the round budget for this tick
        val j = batch.agg(sum(col("j"))).collect().head.getLong(0).toInt
        state = Graph.pageRankWarmStartOn(g, state, "node", "score",
          iters = j).localCheckpoint()
        ()
      }.start()
    in.addData(1)
    q.processAllAvailable()
    in.addData(2)
    q.processAllAvailable()
    q.stop()
    state.as[(Long, Long)].collect().toMap shouldBe
      Graph.pageRankDanglingOn(g, iters = 5)
        .as[(Long, Long)].collect().toMap
  }

  test("streaming ANN index maintenance: ivfPqIndexAppend per " +
      "micro-batch (with one batch UPSERTING a re-embedded id) equals " +
      "the one-shot index of the final vector per id") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(17)
    val vecs = Seq.tabulate(30)(i =>
      (i.toLong, Seq.fill(8)(rnd.nextDouble() - 0.5)))
    val seed = vecs.take(10).toDF("id", "v")
    val cents = Similarity.trainCentroids(seed, "id", "v", k = 3, iters = 2)
    val books = Similarity.pqCodebooks(seed, "id", "v", dim = 8,
      m = 4, ks = 4, iters = 2)
    var index = Similarity.ivfPqIndex(seed, "id", "v", cents, books)
      .localCheckpoint()
    val reembedded5 = (5L, vecs(5)._2.reverse) // id 5 re-encoded later
    val in = MemoryStream[(Long, Seq[Double])](spark)
    val q = in.toDS().toDF("id", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // upsert, not append: a batch may re-embed a known id, and the
        // anti-join degenerates to the plain append for fresh ids
        index = Similarity.ivfPqIndexUpsert(index, batch.localCheckpoint(),
          "id", "v", cents, books).localCheckpoint()
        ()
      }.start()
    in.addData(vecs.slice(10, 20): _*)
    q.processAllAvailable()
    in.addData(vecs.drop(20) :+ reembedded5: _*)
    q.processAllAvailable()
    q.stop()
    val finalVecs = vecs.map { case (id, v) =>
      if (id == 5L) (id, v.reverse) else (id, v) }
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Int, Seq[Int])].collect().sortBy(_._1).toSeq
    rows(index) shouldBe rows(Similarity.ivfPqIndex(
      finalVecs.toDF("id", "v"), "id", "v", cents, books))
  }

  test("runningMean accumulates per-key state across batches (update mode)") {
    val in = MemoryStream[(String, Double)](spark)
    val out = StreamOps.runningMean(in.toDS())
    val q = out.toDF("key", "n", "mean").writeStream.format("memory")
      .queryName("running_mean").outputMode("update").start()
    in.addData(("a", 1.0), ("a", 3.0), ("b", 10.0))
    q.processAllAvailable()
    in.addData(("a", 5.0))
    q.processAllAvailable()
    q.stop()
    // memory sink in update mode appends updates; take the LAST row per key
    val last = spark.table("running_mean").as[(String, Long, Double)]
      .collect().zipWithIndex
      .groupBy(_._1._1).map { case (_, rs) => rs.maxBy(_._2)._1 }
      .toSeq.sortBy(_._1)
    last shouldBe Seq(("a", 3L, 3.0), ("b", 1L, 10.0))
  }

  test("ewmaState: after every batch, each key's state equals batch " +
      "ewmaSmooth on the fed prefix BIT-EXACTLY (3 batch splits)") {
    val rnd = new scala.util.Random(11)
    // globally ts-ascending so prefix batches are event-time ordered;
    // keys interleave so every batch touches every key's state
    val events = (0 until 60).map { i =>
      (1L + i % 3, 1000L * i, rnd.nextDouble() * 100)
    }
    val splits = Seq(events.slice(0, 20), events.slice(20, 45),
      events.slice(45, 60))
    val in = MemoryStream[(Long, Long, Double)](spark)
    val out = StreamOps.ewmaState(in.toDS(), alpha = 0.25)
    val q = out.toDF("key", "n_events", "ewma").writeStream
      .format("memory").queryName("ewma_state").outputMode("update").start()
    try {
      var fed = Seq.empty[(Long, Long, Double)]
      splits.foreach { batch =>
        in.addData(batch: _*)
        q.processAllAvailable()
        fed = fed ++ batch
        val expect = graft.ops.EventAnalytics.ewmaSmooth(
            fed.toDF("key", "us", "v"), "key", "us", "v", alpha = 0.25)
          .orderBy("key").as[(Long, Long, Double)].collect().toSeq
        val last = spark.table("ewma_state").as[(Long, Long, Double)]
          .collect().zipWithIndex.groupBy(_._1._1)
          .map { case (_, rs) => rs.maxBy(_._2)._1 }.toSeq.sortBy(_._1)
        last shouldBe expect // === on doubles: bit-exact, no tolerance
      }
    } finally q.stop()
  }

  /** transformWithState requires the RocksDB state store provider; set
    * it for the duration of one streaming query, then restore. */
  private def withRocksDb[T](f: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("firstSeenTws matches firstSeen semantics on transformWithState") {
    withRocksDb {
      val in = MemoryStream[(Long, String)](spark)
      val out = StreamOps.firstSeenTws[Long, (Long, String)](in.toDS(), _._1)
      val q = out.writeStream.format("memory").queryName("first_seen_tws")
        .outputMode("append").start()
      in.addData((1L, "a1"), (2L, "b1"))
      q.processAllAvailable()
      in.addData((1L, "a2"), (3L, "c1"))
      q.processAllAvailable()
      q.stop()
      spark.table("first_seen_tws").as[(Long, String)].collect().sortBy(_._1) shouldBe
        Array((1L, "a1"), (2L, "b1"), (3L, "c1"))
    }
  }

  test("runningMeanTws accumulates per-key state across batches") {
    withRocksDb {
      val in = MemoryStream[(String, Double)](spark)
      val out = StreamOps.runningMeanTws(in.toDS())
      val q = out.toDF("key", "n", "mean").writeStream.format("memory")
        .queryName("running_mean_tws").outputMode("update").start()
      in.addData(("a", 1.0), ("a", 3.0), ("b", 10.0))
      q.processAllAvailable()
      in.addData(("a", 5.0))
      q.processAllAvailable()
      q.stop()
      val last = spark.table("running_mean_tws").as[(String, Long, Double)]
        .collect().zipWithIndex
        .groupBy(_._1._1).map { case (_, rs) => rs.maxBy(_._2)._1 }
        .toSeq.sortBy(_._1)
      last shouldBe Seq(("a", 3L, 3.0), ("b", 1L, 10.0))
    }
  }

  test("enrichWithDim joins a stream against a static dim per micro-batch " +
      "(left: unmatched keys survive with null dim columns)") {
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("ck", "segment")
    val in = MemoryStream[(Long, String)](spark)
    val out = StreamOps.enrichWithDim(
      in.toDF().toDF("user", "etype"), dim, "user", "ck")
    val q = out.writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()
    in.addData((1L, "click"), (9L, "view")) // 9 has no dim row
    q.processAllAvailable()
    in.addData((2L, "click"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("enrich")
      .select(col("user"), col("etype"), col("dim_segment"))
      .as[(Long, String, Option[String])].collect().sortBy(r => (r._1, r._2))
    rows shouldBe Array(
      (1L, "click", Some("gold")),
      (2L, "click", Some("silver")),
      (9L, "view", None))
  }

  test("sketch aggregates (KMV, Count-Min, bloom, quantile) run " +
      "incrementally in a streaming groupBy and converge to their " +
      "batch values") {
    // The sketches' merge functions are insertion-order-free (set
    // union / elementwise sum / bitwise OR / bottom-k union), which is
    // exactly what a streaming partial-agg state update needs: after
    // the last batch the streamed value must EQUAL the one-shot batch
    // value bit for bit — sketches are streaming-ready with no extra
    // code.
    import graft.ops.Sketches
    import graft.functions.LongHashes
    val in = MemoryStream[(String, Long)](spark)
    def sketchAgg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("g")).agg(
        Sketches.kmvDistinct(LongHashes.splitmix64(col("id")), 8).as("kmv"),
        Sketches.countMin(col("id"), 2, 16).as("grid"),
        Sketches.bloomFilter(col("id"), 64, 3).as("bf"),
        Sketches.quantileSketch(LongHashes.splitmix64(col("id")),
          col("id"), 8).as("qs"))
    val data = (1L to 40L).map(i => (if (i % 3 == 0) "a" else "b", i % 25))
    val q = sketchAgg(in.toDF().toDF("g", "id"))
      .writeStream.format("memory").queryName("sketch_stream")
      .outputMode("complete").start()
    data.grouped(13).foreach { chunk =>
      in.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("sketch_stream")
      .select(col("g"), col("kmv.est"), col("grid"), col("bf"), col("qs"))
      .as[(String, Long, Seq[Long], Seq[Long], Seq[Long])]
      .collect().sortBy(_._1)
    val batch = sketchAgg(data.toDF("g", "id"))
      .select(col("g"), col("kmv.est"), col("grid"), col("bf"), col("qs"))
      .as[(String, Long, Seq[Long], Seq[Long], Seq[Long])]
      .collect().sortBy(_._1)
    streamed shouldBe batch
    // and the values are non-vacuous: both groups saw data
    streamed.map(_._1).toSeq shouldBe Seq("a", "b")
    all(streamed.map(_._2)) should be > 0L
    all(streamed.map(_._5.size)) should be > 0
  }

  test("Validate's row-local rules run UNCHANGED as a streaming " +
      "quality monitor (complete mode): per-batch counts equal batch " +
      "validate on the prefix") {
    // The fused row-local aggregate is one global sum aggregate, which
    // is exactly a streaming complete-mode query — the online data-
    // quality monitor needs no extra code. (Unique/FK rules need a
    // distinct or a join and stay batch-side by design.)
    import graft.ops.Validate
    import Validate.{InRange, MatchesRegex, NotNull}
    val rules = Seq(NotNull("name"), InRange("score", 0.0, 100.0),
      MatchesRegex("name", "^[a-z]+$"))
    val in = MemoryStream[(Long, String, Double)](spark)
    val q = Validate.validate(
        in.toDF().toDF("id", "name", "score"), rules)
      .writeStream.format("memory").queryName("validate_stream")
      .outputMode("complete").start()
    val batches = Seq(
      Seq((1L, "ok", 10.0), (2L, "BAD", 20.0)),          // 1 regex viol
      Seq((3L, "ok", 500.0), (4L, "ok", -1.0)),          // 2 range viols
      Seq((5L, "fine", 50.0), (6L, "UGLY", 999.0)))      // 1 regex + 1 range
    var seen = Seq.empty[(Long, String, Double)]
    batches.foreach { b =>
      in.addData(b)
      q.processAllAvailable()
      seen = seen ++ b
      val streamed = spark.table("validate_stream")
        .select("rule", "col_name", "violations")
        .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2))
      val batch = Validate.validate(
          seen.toDF("id", "name", "score"), rules)
        .select("rule", "col_name", "violations")
        .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2))
      streamed.toSeq shouldBe batch.toSeq
    }
    q.stop()
    // final counts non-vacuous: 2 regex + 3 range violations seen
    spark.table("validate_stream")
      .select("rule", "violations").as[(String, Long)].collect().toMap
      .view.filterKeys(_ != "not_null").toMap shouldBe
      Map("in_range" -> 3L, "matches_regex" -> 2L)
  }

  test("screenAgainstIndex runs incrementally against a static winnow " +
      "index (stream-static fp join + streaming pair count) and equals " +
      "the batch screen") {
    import graft.ops.Dedup
    val train = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "completely different content about spark engines at scale")
    ).toDF("doc_id", "text")
    val idx = Dedup.winnowIndex(train, "doc_id", "text", k = 8, w = 4)
    val cands = Seq(
      (1L, "he said the quick brown fox jumps over the lazy dog loudly"),
      (2L, "nothing in common here whatsoever my good friend"),
      (3L, "more content about spark engines at scale for everyone"))
    val in = MemoryStream[(Long, String)](spark)
    val q = Dedup.screenAgainstIndex(in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", idx, k = 8, w = 4)
      .writeStream.format("memory").queryName("contam_stream")
      .outputMode("complete").start()
    // candidates arrive across two micro-batches; the index is static
    cands.grouped(2).foreach { chunk =>
      in.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("contam_stream")
      .select(col("cand_id"), col("train_id"), col("n_shared"))
      .as[(Long, Long, Long)].collect().sorted
    val batch = Dedup.screenAgainstIndex(cands.toDF("doc_id", "text"),
        "doc_id", "text", idx, k = 8, w = 4)
      .select(col("cand_id"), col("train_id"), col("n_shared"))
      .as[(Long, Long, Long)].collect().sorted
    streamed shouldBe batch
    // the winnow guarantee: both lifted runs (>= k+w-1 = 11 codepoints)
    // are caught; the unrelated candidate is not
    streamed.map(t => (t._1, t._2)).toSet shouldBe Set((1L, 100L), (3L, 101L))
    all(streamed.map(_._3)) should be >= 1L
  }

  test("stratified bottom-k-by-hash sampling runs incrementally in a " +
      "streaming groupBy and equals the batch sample (the bounded-heap " +
      "merge is insertion-order-free, so late arrivals only displace)") {
    import graft.ops.Sampling
    import graft.functions.LongHashes
    val in = MemoryStream[(String, Long)](spark)
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("g")).agg(Sampling.bottomKByHash(
        LongHashes.splitmix64(col("id")), col("id"), 3).as("picks"))
    val data = (1L to 30L).map(i => (if (i % 2 == 0) "a" else "b", i))
    val q = agg(in.toDF().toDF("g", "id"))
      .writeStream.format("memory").queryName("sample_stream")
      .outputMode("complete").start()
    data.grouped(7).foreach { chunk =>
      in.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .selectExpr("g", "transform(picks, p -> p.id) AS ids")
      .as[(String, Seq[Long])].collect().sortBy(_._1).toSeq
    val streamed = norm(spark.table("sample_stream"))
    streamed shouldBe norm(agg(data.toDF("g", "id")))
    streamed.map(_._2.size) shouldBe Seq(3, 3) // both strata at k
  }

  test("qualityGate screens an arriving stream unchanged (stateless " +
      "narrow op: append mode, no state, no watermark) and matches the " +
      "batch gate row for row") {
    import graft.ops.TextAnalysis
    val docs = Seq(
      (1L, "with alpha bravo crane drape eagle fjord gravy hotel inlet " +
        "joker kayak lemon mango night ocean"), // passes (mask 0)
      (2L, "with tiny"),                        // mask 1+2
      (3L, null.asInstanceOf[String]))          // null text -> mask 47
    val in = MemoryStream[(Long, String)](spark)
    val q = TextAnalysis.qualityGate(in.toDF().toDF("doc_id", "text"),
        "doc_id", "text")
      .writeStream.format("memory").queryName("gate_stream")
      .outputMode("append").start()
    docs.grouped(2).foreach { chunk =>
      in.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("gate_stream")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val batch = TextAnalysis.qualityGate(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    streamed shouldBe batch
    streamed shouldBe Seq((1L, 0L, true), (2L, 3L, false), (3L, 47L, false))
  }

  test("lmScoreStream scores an arriving stream against the static " +
      "bigram model and equals batch lmScore bit-for-bit") {
    import graft.ops.TextAnalysis
    val train = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "the lazy dog sleeps while the quick fox runs")
    ).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the quick brown fox runs"),
      (2L, "zebra xylophone quantum flux"), // all-unseen transitions
      (3L, "the lazy dog jumps over the fox"),
      (4L, "the the the the")) // degenerate loop
    val in = MemoryStream[(Long, String)](spark)
    val q = StreamOps.lmScoreStream(train,
        in.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("lm_stream")
      .outputMode("complete").start()
    docs.grouped(2).foreach { chunk => // two micro-batches
      in.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("lm_stream")
      .select(col("doc_id"), col("n_trans"), col("lm_score"), col("lm_min"))
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    val batch = TextAnalysis.lmScore(train, docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    streamed shouldBe batch // every doc has >= 1 bigram -> same rows
    // and the scores separate: in-domain beats the unseen-gibberish doc
    val byId = streamed.map(r => r._1 -> r._3).toMap
    byId(1L) should be > byId(2L)
  }

  test("dsirWeightsStream weights an arriving stream against static " +
      "raw/target models and equals batch dsirWeights bit-for-bit") {
    import graft.ops.TextAnalysis
    val raw = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta common crawl noise"),
      (3L, "noise noise filler filler words"),
      (4L, "quality prose reads like the target")
    ).toDF("doc_id", "text")
    val target = Seq(
      (900L, "quality prose reads like the target"),
      (901L, "the target is quality prose")
    ).toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)](spark)
    val q = StreamOps.dsirWeightsStream(raw, target,
        in.toDF().toDF("doc_id", "text"), "doc_id", "text", buckets = 64)
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("complete").start()
    raw.as[(Long, String)].collect().toSeq.grouped(2).foreach { chunk =>
      in.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("dsir_stream")
      .select(col("doc_id"), col("n_feat"), col("dsir_w"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    // batch dsirWeights(raw, target) builds the raw model from the
    // same frame the stream replays -> identical models, identical
    // scores (all docs have bigrams, so reinstate changes nothing)
    val batch = TextAnalysis.dsirWeights(raw, target, "doc_id", "text",
        buckets = 64)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    streamed shouldBe batch
    // separation: the target-like doc upweights vs the filler doc
    val byId = streamed.map(r => r._1 -> r._3).toMap
    byId(4L) should be > byId(3L)
  }

  test("rateSpikesStream flags arriving days against the static " +
      "baseline across micro-batches and equals batch rateSpikes on " +
      "days whose trailing window lies inside the baseline") {
    import graft.ops.EventAnalytics
    // baseline: key a steady 2/day on days 4..10; key b one event on
    // day 8; key c exists ONLY in the stream (fresh-key path)
    val baseline = ((4L to 10L).flatMap(d => Seq(("a", d), ("a", d))) ++
      Seq(("b", 8L))).toDF("key", "day")
    val arriving = Seq(("a", 11L), ("a", 11L), ("a", 11L), ("a", 11L),
      ("a", 11L), ("a", 11L), ("b", 11L), ("c", 11L))
    val in = MemoryStream[(String, Long)](spark)
    val q = StreamOps.rateSpikesStream(baseline,
        in.toDF().toDF("key", "day"), "key", "day")
      .writeStream.format("memory").queryName("spike_stream")
      .outputMode("complete").start()
    arriving.grouped(3).foreach { chunk => // day 11 split over batches
      in.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("spike_stream")
      .select(col("key"), col("day"), col("n"), col("sum_prev"),
        col("lift"))
      .as[(String, Long, Long, Long, Double)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    val batch = EventAnalytics.rateSpikes(
        baseline.unionByName(arriving.toDF("key", "day")), "key", "day")
      .where(col("day") === 11L)
      .as[(String, Long, Long, Long, Double)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    streamed shouldBe batch
    // separation: the 3x burst beats the steady key beats nothing;
    // the fresh key takes the exact Laplace floor 2·W/W = 2.0
    val byKey = streamed.map(r => r._1 -> r._5).toMap
    byKey("a") should be > byKey("c")
    byKey("c") shouldBe 2.0
    byKey("c") should be > byKey("b")
  }

  test("histogramDriftStream: a fully-arrived window's TVD equals " +
      "batch histogramDrift against the same static reference " +
      "bit-for-bit, and novel bins are counted") {
    import graft.ops.Stats
    val ref = Seq(1.0, 5.0, 12.0, 13.0, 25.0, 26.0, 27.0).toDF("value")
    // window 1 (10:00): shifted mass + a novel bin (104.0 -> bin 10);
    // window 2 (10:05): close to ref
    val w1 = Seq(1.0, 12.0, 14.0, 104.0)
    val w2 = Seq(2.0, 11.0, 25.0)
    val in = MemoryStream[(Timestamp, Double)](spark)
    val q = StreamOps.histogramDriftStream(ref,
        in.toDF().toDF("ts", "value"), "ts", "value", binWidth = 10.0,
        windowDuration = "5 minutes", watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("drift_stream")
      .outputMode("append").start()
    in.addData(w1.map(v => (ts(1), v)) ++ w2.map(v => (ts(6), v)): _*)
    q.processAllAvailable()
    in.addData((ts(55), 0.0)) // flush: advance watermark past both windows
    q.processAllAvailable()
    in.addData((ts(56), 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("drift_stream")
      .select(col("win_start").cast("string"), col("t_cur"),
        col("n_novel_bins"), col("tvd"))
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    def batchTvd(vals: Seq[Double]): Double =
      Stats.histogramDrift(ref, vals.toDF("value"), "value", 10.0)
        .select(col("tvd")).as[Double].head()
    got shouldBe Seq(
      ("2026-01-01 10:00:00", 4L, 1L, batchTvd(w1)),
      ("2026-01-01 10:05:00", 3L, 0L, batchTvd(w2)))
  }

  test("ksTestStream: a fully-arrived window's (d_num, d, ks_stat) " +
      "equal batch ksTest against the same static reference exactly; " +
      "the pooled-distinct cap raises loudly") {
    import graft.ops.Stats
    val ref = Seq(1L, 2L, 2L, 3L, 7L, 9L).toDF("value")
    val w1 = Seq(2L, 3L, 3L, 8L)
    val w2 = Seq(1L, 2L, 9L)
    val in = MemoryStream[(Timestamp, Long)](spark)
    val q = StreamOps.ksTestStream(ref, in.toDF().toDF("ts", "value"),
        "ts", "value", windowDuration = "5 minutes",
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("ks_stream")
      .outputMode("append").start()
    in.addData(w1.map(v => (ts(1), v)) ++ w2.map(v => (ts(6), v)): _*)
    q.processAllAvailable()
    in.addData((ts(55), 1L))
    q.processAllAvailable()
    in.addData((ts(56), 1L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ks_stream")
      .select(col("win_start").cast("string"), col("n_ref"), col("n_cur"),
        col("d_num"), col("d"), col("ks_stat"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().sortBy(_._1).toSeq
    def batch(vals: Seq[Long]) = {
      val r = Stats.ksTest(ref, vals.toDF("value"), "value")
        .as[(Long, Long, Long, Option[Double], Option[Double])]
        .collect().head
      r
    }
    val b1 = batch(w1); val b2 = batch(w2)
    got shouldBe Seq(
      ("2026-01-01 10:00:00", b1._1, b1._2, b1._3, b1._4, b1._5),
      ("2026-01-01 10:05:00", b2._1, b2._2, b2._3, b2._4, b2._5))
    // cap guard: 3 pooled distinct values against maxDistinct = 2
    val in2 = MemoryStream[(Timestamp, Long)](spark)
    val q2 = StreamOps.ksTestStream(Seq(1L, 2L).toDF("value"),
        in2.toDF().toDF("ts", "value"), "ts", "value", "5 minutes",
        "0 seconds", maxDistinct = 2)
      .writeStream.format("memory").queryName("ks_stream_cap")
      .outputMode("append").start()
    in2.addData((ts(1), 5L))
    q2.processAllAvailable()
    in2.addData((ts(55), 1L))
    val ex = intercept[Exception] {
      q2.processAllAvailable()
      in2.addData((ts(56), 1L))
      q2.processAllAvailable()
    }
    ex.getMessage should include("exceed maxDistinct")
    q2.stop()
  }

  test("streaming weighted-sample artifact: prioritySamples + " +
      "prioritySampleMerge inside foreachBatch across micro-batches " +
      "equals the one-shot build (top-m closure), and a closing " +
      "retraction leaves the survivors' prefix") {
    // The nightly fold of the SAMPLING member: each micro-batch builds
    // its own bounded artifact, then merges into the running one —
    // sound because top-m is closed under union, so fold order is
    // irrelevant. Disjoint ids per batch (the snapshot contract).
    import graft.ops.Sampling
    val m = 4
    var state: Option[org.apache.spark.sql.DataFrame] = None
    val in = MemoryStream[(String, Long, Long)](spark)
    val q = in.toDS().toDF("g", "id", "w").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val art = Sampling.prioritySamples(batch, Seq("g"), "id", "w", m)
        state = Some(state.fold(art)(prev =>
          Sampling.prioritySampleMerge(Seq(prev, art), Seq("g"), m))
          .localCheckpoint())
        ()
      }.start()
    val b1 = Seq(("a", 1L, 10L), ("a", 2L, 100L), ("a", 3L, 7L),
      ("b", 4L, 5L))
    val b2 = Seq(("a", 5L, 50L), ("a", 6L, 1L), ("b", 7L, 90L),
      ("b", 8L, 3L))
    val b3 = Seq(("a", 9L, 30L), ("a", 10L, 2L), ("b", 11L, 8L),
      ("a", 12L, 60L))
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    in.addData(b3: _*); q.processAllAvailable()
    q.stop()
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.select(col("g"), col("wsample"))
        .as[(String, Array[(Double, Long, Long)])].collect()
        .map { case (g, a) => g -> a.toList }.toMap
    val full = (b1 ++ b2 ++ b3).toDF("g", "id", "w")
    val streamed = asMap(state.get)
    streamed shouldBe asMap(
      Sampling.prioritySamples(full, Seq("g"), "id", "w", m))
    // group a saw 8 candidates for m=4 — eviction actually happened
    streamed("a").size shouldBe m
    // closing retraction: drop two sampled ids, prefix == survivors'
    val retr = state.get.select(col("g"),
      Sampling.priorityPairsRetract(col("wsample"),
        array(lit(2L), lit(7L))).as("wsample"))
    val surv = asMap(Sampling.prioritySamples(
      full.where(!col("id").isin(2L, 7L)), Seq("g"), "id", "w", m))
    val gotR = asMap(retr)
    for (g <- gotR.keySet)
      withClue(s"$g: ") {
        gotR(g) shouldBe surv(g).take(gotR(g).size)
      }
    // the retraction actually removed a sampled row somewhere
    gotR.values.map(_.size).sum should be <
      streamed.values.map(_.size).sum
  }

  test("streaming join-view maintenance: joinViewDelta inside " +
      "foreachBatch across micro-batches (each bringing inserts on " +
      "BOTH sides) equals the one-shot join; a closing retraction " +
      "leaves the survivors' join") {
    // The nightly fold of the JOIN member: each micro-batch folds its
    // (deltaA, deltaB) against the ACCUMULATED snapshots, appends the
    // view delta, then advances the snapshots — the delta rule
    // composes because the legs partition the new matches exactly.
    import graft.ops.Merge
    var aSnap = Seq.empty[(Long, String)].toDF("k", "pa")
    var bSnap = Seq.empty[(Long, Long, Long)].toDF("k", "ln", "pb")
    var view = aSnap.join(bSnap, Seq("k"))
    val in = MemoryStream[(String, Long, String, Long, Long)](spark)
    val q = in.toDS()
      .toDF("side", "k", "pa", "ln", "pb").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val dA = batch.where(col("side") === "a").select("k", "pa")
        val dB = batch.where(col("side") === "b")
          .select("k", "ln", "pb")
        view = view.unionByName(
          Merge.joinViewDelta(aSnap, dA, bSnap, dB, Seq("k")))
          .localCheckpoint()
        aSnap = aSnap.unionByName(dA).localCheckpoint()
        bSnap = bSnap.unionByName(dB).localCheckpoint()
        ()
      }.start()
    def arow(k: Long, pa: String) = ("a", k, pa, 0L, 0L)
    def brow(k: Long, ln: Long, pb: Long) = ("b", k, "", ln, pb)
    in.addData(arow(1, "a1"), arow(2, "a2"), brow(1, 1, 10))
    q.processAllAvailable()
    in.addData(brow(2, 1, 20), brow(1, 2, 11), arow(3, "a3"))
    q.processAllAvailable()
    in.addData(arow(4, "a4"), brow(3, 1, 30), brow(4, 1, 40))
    q.processAllAvailable()
    q.stop()
    val scratch = aSnap.join(bSnap, Seq("k"))
    view.exceptAll(scratch).count() shouldBe 0
    scratch.exceptAll(view).count() shouldBe 0
    view.count() should be > 3L
    // closing retraction: drop a-row k=1 and b-row (2, 1)
    val retr = Merge.joinViewRetract(view, Seq(1L).toDF("k"), Seq("k"),
      Seq((2L, 1L)).toDF("k", "ln"), Seq("k", "ln"))
    val surv = aSnap.where(col("k") =!= 1)
      .join(bSnap.where(!(col("k") === 2 && col("ln") === 1)), Seq("k"))
    retr.exceptAll(surv).count() shouldBe 0
    surv.exceptAll(retr).count() shouldBe 0
  }

  test("streaming LEFT-join view maintenance: leftJoinViewChanges + " +
      "leftJoinCountsFold inside foreachBatch across micro-batches " +
      "equals the one-shot LEFT join — null extensions appear for " +
      "unmatched arrivals and retire on first match") {
    import graft.ops.Merge
    var aSnap = Seq.empty[(Long, Long, String)].toDF("k", "aid", "pa")
    var bSnap = Seq.empty[(Long, Long, String)].toDF("k", "ln", "pb")
    var view = aSnap.join(bSnap, Seq("k"), "left")
    var counts = Merge.leftJoinMatchCounts(aSnap, bSnap, Seq("k"),
      Seq("aid"))
    val in = MemoryStream[(String, Long, Long, String)](spark)
    val q = in.toDS().toDF("side", "k", "n2", "p").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val dA = batch.where(col("side") === "a")
          .select(col("k"), col("n2").as("aid"), col("p").as("pa"))
        val dB = batch.where(col("side") === "b")
          .select(col("k"), col("n2").as("ln"), col("p").as("pb"))
        val ch = Merge.leftJoinViewChanges(counts, aSnap, dA, bSnap,
          dB, Seq("k"), Seq("aid"))
        view = view
          .join(ch.where(col("__op") === "D").select("aid").distinct(),
            Seq("aid"), "left_anti")
          .select(view.columns.map(col): _*)
          .unionByName(ch.where(col("__op") === "I").drop("__op")
            .select(view.columns.map(col): _*))
          .localCheckpoint()
        counts = Merge.leftJoinCountsFold(counts, aSnap, dA, bSnap, dB,
          Seq("k"), Seq("aid")).localCheckpoint()
        aSnap = aSnap.unionByName(dA).localCheckpoint()
        bSnap = bSnap.unionByName(dB).localCheckpoint()
        ()
      }.start()
    // batch 1: a1 matched, a2 unmatched (null-extended)
    in.addData(("a", 1L, 10L, "a1"), ("a", 2L, 20L, "a2"),
      ("b", 1L, 1L, "b11"))
    q.processAllAvailable()
    // batch 2: a2 gains its FIRST match (stale null retires); a3
    // arrives unmatched
    in.addData(("b", 2L, 1L, "b21"), ("a", 3L, 30L, "a3"))
    q.processAllAvailable()
    // batch 3: more matches on both old keys
    in.addData(("b", 1L, 2L, "b12"), ("b", 2L, 2L, "b22"))
    q.processAllAvailable()
    q.stop()
    val scratch = aSnap.join(bSnap, Seq("k"), "left")
      .select(view.columns.map(col): _*)
    view.exceptAll(scratch).count() shouldBe 0
    scratch.exceptAll(view).count() shouldBe 0
    // a3 is null-extended, a2 is not
    view.where(col("aid") === 30L && col("ln").isNull).count() shouldBe 1
    view.where(col("aid") === 20L && col("ln").isNull).count() shouldBe 0
    counts.as[(Long, Long)].collect().toMap shouldBe
      Map(10L -> 2L, 20L -> 2L, 30L -> 0L)
  }

  test("windowedAgg and sessionAgg run identically on batch frames") {
    val batch = Seq((ts(0), "a", 1.0), (ts(1), "a", 2.0), (ts(6), "a", 10.0))
      .toDF("ts", "key", "v")
    val w = StreamOps.windowedAgg(batch, "ts", "key", "v", "5 minutes")
      .orderBy("win_start").select(col("n"), col("total"))
      .as[(Long, Double)].collect()
    w shouldBe Array((2L, 3.0), (1L, 10.0))
    val s = StreamOps.sessionAgg(batch.toDF(), "ts", "key", "2 minutes")
      .orderBy("sess_start").select(col("n")).as[Long].collect()
    s shouldBe Array(2L, 1L)
  }

  test("ledgeredFold: the production foreachBatch wrapper — a real " +
      "streamed fold through a real foreachBatch, then a forced " +
      "replay is a free no-op, a gap raises, a FOREIGN EPOCH raises " +
      "(checkpoint-reset hazard) until rebindEpoch acknowledges it") {
    import org.apache.spark.sql.DataFrame
    val dir = java.nio.file.Files.createTempDirectory("ledgered").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ledg_ckpt").toString
    var evals = 0
    // a sum-shaped (count, sum) artifact — exactly the fold class that
    // double-counts under unguarded replay (BatchLedgerSpec pins that)
    def fold(prior: Option[DataFrame], batch: DataFrame): DataFrame = {
      evals += 1
      val b = batch.groupBy("g")
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      prior.map(_.unionByName(b).groupBy("g")
        .agg(sum(col("s")).as("s"), sum(col("n")).as("n"))).getOrElse(b)
    }
    def runQuery(in: MemoryStream[(String, Long)]): Unit = {
      val q = in.toDS().toDF("g", "v").writeStream
        .foreachBatch { (df: DataFrame, id: Long) =>
          StreamOps.ledgeredFold(spark, dir, "query-1", df, id)(fold)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // batch 0 through a REAL foreachBatch; then the query restarts on
    // the SAME checkpoint and delivers batch 1 — the production shape
    val in = MemoryStream[(String, Long)](spark)
    in.addData(("a", 1L), ("b", 2L))
    runQuery(in)
    in.addData(("a", 10L))
    runQuery(in)
    val (_, hw1, ep1) = StreamOps.readLedgered(spark, dir).get
    hw1 shouldBe 1L
    ep1 shouldBe Some("query-1")
    val evalsAfterStream = evals
    // forced replay: the at-least-once re-delivery of batch 1 — the
    // fold thunk never evaluates, nothing is rewritten
    StreamOps.ledgeredFold(spark, dir, "query-1",
      Seq(("a", 10L)).toDF("g", "v"), 1L)(fold) shouldBe false
    evals shouldBe evalsAfterStream
    // successor folds; artifact equals the once-delivered from-scratch
    StreamOps.ledgeredFold(spark, dir, "query-1",
      Seq(("b", 5L), ("c", 7L)).toDF("g", "v"), 2L)(fold) shouldBe true
    def rows(d: DataFrame) =
      d.as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val (art, hw2, _) = StreamOps.readLedgered(spark, dir).get
    hw2 shouldBe 2L
    rows(art) shouldBe Seq(("a", 11L, 2L), ("b", 7L, 2L), ("c", 7L, 1L))
    // a gap raises (BatchLedger's law, surfaced through the store)
    val eGap = intercept[IllegalStateException] {
      StreamOps.ledgeredFold(spark, dir, "query-1",
        Seq(("z", 1L)).toDF("g", "v"), 9L)(fold)
    }
    eGap.getMessage should include("never folded")
    // the checkpoint-reset hazard (round-19 ADVICE): a fresh-checkpoint
    // query re-numbers from 0 — its batch 0 must RAISE, not be absorbed
    // as a replay of high-water 2
    val eEpoch = intercept[IllegalStateException] {
      StreamOps.ledgeredFold(spark, dir, "query-2",
        Seq(("a", 100L)).toDF("g", "v"), 0L)(fold)
    }
    eEpoch.getMessage should include("rebindEpoch")
    rows(StreamOps.readLedgered(spark, dir).get._1) shouldBe
      Seq(("a", 11L, 2L), ("b", 7L, 2L), ("c", 7L, 1L)) // untouched
    // explicit acknowledgment: rebind keeps the artifact, resets the
    // high-water, and the new query's batch 0 folds as NEW data
    StreamOps.rebindEpoch(spark, dir, "query-2")
    val (_, hwR, epR) = StreamOps.readLedgered(spark, dir).get
    hwR shouldBe -1L
    epR shouldBe Some("query-2")
    StreamOps.ledgeredFold(spark, dir, "query-2",
      Seq(("a", 100L)).toDF("g", "v"), 0L)(fold) shouldBe true
    rows(StreamOps.readLedgered(spark, dir).get._1) shouldBe
      Seq(("a", 111L, 3L), ("b", 7L, 2L), ("c", 7L, 1L))
    // rebinding an empty store is refused loudly
    val eNone = intercept[IllegalStateException] {
      StreamOps.rebindEpoch(spark,
        java.nio.file.Files.createTempDirectory("ledg_empty").toString,
        "q")
    }
    eNone.getMessage should include("no committed artifact")
  }
}
