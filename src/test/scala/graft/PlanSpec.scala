package graft

import org.scalatest.matchers.should.Matchers

/** Physical-plan shape assertions for the scale-critical queries.
  *
  * These pin the properties that make the 100 TB design story true —
  * broadcast joins where a side is small, parquet filter/column
  * pushdown, map-side partial aggregation, bounded top-k instead of
  * global sorts, and the ABSENCE of scale-killers (cartesian products,
  * window sorts on the dedup path). A regression here would often still
  * pass value-level correctness while quietly melting a large cluster,
  * so it is tested at the plan level.
  *
  * Plans are inspected pre-execution (AQE's initial plan): explicit
  * `broadcast()` hints and scan pushdown are already visible there.
  */
class PlanSpec extends SparkSpecBase with Matchers {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf()).queryExecution.executedPlan.toString

  test("q_join_agg broadcasts the customer dim — no shuffle/sort-merge join") {
    val p = plan("q_join_agg")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
  }

  test("q_topk_orders is a bounded TakeOrderedAndProject, not a global sort") {
    val p = plan("q_topk_orders")
    p should include("TakeOrderedAndProject")
  }

  test("q1_agg aggregates partially before the shuffle (map-side combine)") {
    val p = plan("q1_agg")
    p should include("partial_sum")
    p should include("partial_count")
  }

  test("q_filter pushes the value predicate into the parquet scan") {
    val p = plan("q_filter")
    p should include("PushedFilters")
    p should include("GreaterThan(value,100.0)")
  }

  test("flagship entry prunes unused columns at the events scan") {
    val p = SparkEntry.entry(spark).queryExecution.executedPlan.toString
    // ts (nanos) and user_id are never referenced -> must not be read.
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).getOrElse(fail("no ReadSchema in plan")).group(1)
    readSchema should not include "ts:"
    readSchema should not include "user_id"
  }

  test("q_dedup_minhash has no window sort and no cartesian product") {
    val p = plan("q_dedup_minhash")
    p should not include "Window"
    p should not include "CartesianProduct"
    p.toLowerCase should include("leftsemi") // the bucket-size cap
  }

  test("q_ann_brute reduces map-side via the bounded-heap top-k partial") {
    val p = plan("q_ann_brute")
    p should include("partial_graft_top_k_by_score")
    // the deliberate broadcast cross: corpus x broadcast(queries)
    p should include("BroadcastNestedLoopJoin")
  }

  test("no query plans a CartesianProduct (unbroadcast all-pairs)") {
    for (name <- SparkEntry.queries.keys) {
      withClue(name) { plan(name) should not include "CartesianProduct" }
    }
  }

  test("LSH bucketing is one PlaneSigns kernel, not per-plane literals") {
    val p = plan("q_ann_lsh")
    p should include("graft_plane_signs")
    // the old phrasing embedded the plane matrix as typedlit literals
    // and computed a cosine per plane — both must be gone (the only
    // cosine left is the candidate re-rank on two column vectors)
    p should not include "graft_cosine_sim(cast"
    "graft_plane_signs".r.findAllIn(p).size should be <= 32 // 2 sides x 8 tables x <=2 plan copies
  }

  test("q_outer_join: both pre-aggregated sides meet on a key-partitioned " +
      "sort-merge FULL OUTER (no broadcast — null extension needs both " +
      "sides complete per key)") {
    val p = plan("q_outer_join")
    p should include("FullOuter")
    p should include("SortMergeJoin")
    p should not include "CartesianProduct"
  }

  test("q_grouping_sets expands its arbitrary subtotal list map-side and " +
      "partially aggregates before one shuffle, like q_cube") {
    val p = plan("q_grouping_sets")
    p should include("Expand")
    p should include("partial_count")
  }

  test("q_profile computes all per-column metrics in ONE lineitem scan " +
      "(multi-distinct expands map-side; no self-join, no second scan)") {
    val p = plan("q_profile")
    p should include("Expand")
    p should not include "Join"
    // one scan: the parquet relation appears once in the plan
    "Scan parquet".r.findAllIn(p).size shouldBe 1
  }

  test("q_profile_sketch replaces the multi-distinct Expand with KMV: " +
      "ONE plain aggregate, map-side partials, no Expand, no Join, one scan") {
    val p = plan("q_profile_sketch")
    // The entire reason this variant exists: q_profile's Expand
    // multiplies every row 5x before the exchange; the sketch path
    // must not re-introduce it.
    p should not include "Expand"
    p should not include "Join"
    p should include("partial_count")
    p should include("graft_kmv_distinct")
    "Scan parquet".r.findAllIn(p).size shouldBe 1
  }

  test("q_serde_confluent: wire-format framing is a shuffle-free narrow " +
      "scan (codegen'd concat/substring around the Avro codec; the " +
      "trailing sort is the only exchange)") {
    val p = plan("q_serde_confluent")
    p should not include "Exchange hashpartitioning"
    p should not include "Join"
    "Scan parquet".r.findAllIn(p).size shouldBe 1
  }

  test("q_scd2: the key predicate reaches the parquet scan BELOW the " +
      "window; one key exchange, one Window, no join") {
    val p = plan("q_scd2")
    p should include("PushedFilters: [IsNotNull(o_custkey), LessThanOrEqual(o_custkey,200)")
    "Window".r.findAllIn(p).size shouldBe 1
    p should not include "Join"
  }

  test("q_mix and q_scrub are shuffle-free narrow scans") {
    for (name <- Seq("q_mix", "q_scrub")) {
      withClue(name) {
        val p = plan(name)
        // per-row filter/projection only; the trailing orderBy is the
        // single allowed exchange (rangepartitioning for the sort)
        p should not include "Exchange hashpartitioning"
        p should not include "Join"
      }
    }
  }

  test("q_pack is one window per stream — a single hash exchange, no join") {
    val p = plan("q_pack")
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1
    p should not include "Join"
    p should include("Window")
  }

  test("q_dedup_clusters inherits the cascade's shape: no cartesian, no window") {
    // construction runs the iterative propagation (localCheckpoint
    // materializes per round); the returned frame must stay join+agg
    val p = plan("q_dedup_clusters")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("bucketedAsOf tolerance guard is projection-only — identical " +
      "exchange/window count to the untolerated plan, no join") {
    import org.apache.spark.sql.functions.{col, expr, max}
    // read through SparkEntry.t so ts arrives as the nanos long this
    // arithmetic expects regardless of the testdata generation (ns vs us)
    val ev = SparkEntry.t(spark, sf(), "events")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts"), col("event_type"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = ev.where(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
    def shape(tol: Option[Long]): (Int, Int, String) = {
      val p = ops.AsOfJoin.bucketedAsOf(purchases, clicks, "user_id", "ts",
          bucketWidth = 3600000000L, tolerance = tol)
        .queryExecution.executedPlan.toString
      ("Exchange hashpartitioning".r.findAllIn(p).size,
        "Window \\[".r.findAllIn(p).size, p)
    }
    val (exPlain, winPlain, _) = shape(None)
    val (exTol, winTol, pTol) = shape(Some(7200000000L))
    // the void-guard is a `when` over the already-computed match struct;
    // it must stay a narrow projection on top of the same shuffles
    exTol shouldBe exPlain
    winTol shouldBe winPlain
    winTol should be > 0
    pTol should not include "Join"
    pTol should not include "CartesianProduct"
  }

  test("q_setops' four set-op operands reuse ONE events aggregation " +
      "exchange (per-side aggregates would scan events twice)") {
    val df = SparkEntry.queries("q_setops")(spark, sf())
    df.collect() // finalize AQE so reuse nodes are visible
    val p = df.queryExecution.executedPlan.toString
    p should include("ReusedExchange")
  }

  test("q_semi_anti: both set sides broadcast ONE shared high-value-orders " +
      "build (semi + anti reuse the exchange, no sort-merge)") {
    val df = SparkEntry.queries("q_semi_anti")(spark, sf())
    df.collect() // finalize AQE so reuse nodes are visible
    val p = df.queryExecution.executedPlan.toString
    // the AQE-final toString prints Current + Initial plans, so each
    // join may appear twice; LeftSemi + LeftAnti must BOTH be broadcast
    "BroadcastHashJoin.*LeftSemi".r.findAllIn(p).size should be >= 1
    "BroadcastHashJoin.*LeftAnti".r.findAllIn(p).size should be >= 1
    p should include("ReusedExchange")
    p should not include "SortMergeJoin"
  }

  test("q_cube expands grouping sets map-side and partially aggregates " +
      "before its single hash shuffle") {
    val p = plan("q_cube")
    p should include("Expand") // the lattice is one pass, not 4 scans
    p should include("partial_count")
    p should include("partial_sum")
  }

  test("q_win_frame fuses lag and both frame aggregates into ONE window " +
      "operator (one partition sort, not one per frame)") {
    val p = plan("q_win_frame")
    "\\bWindow\\b".r.findAllIn(p).size shouldBe 1
  }

  test("q_star_join picks up the hinted nation/region dims as broadcast " +
      "hash joins") {
    val p = plan("q_star_join")
    "BroadcastHashJoin".r.findAllIn(p).size should be >= 2
    p should not include "CartesianProduct"
  }

  test("q_winnow: ONE fingerprint exchange feeds the cap and both join " +
      "sides; kernel stays in codegen; no cartesian") {
    val df = SparkEntry.queries("q_winnow")(spark, sf())
    df.collect() // finalize AQE so reuse nodes are visible
    val p = df.queryExecution.executedPlan.toString
    p should include("ReusedExchange")
    p should not include "CartesianProduct"
    val gen = p.linesIterator.find(_.contains("graft_winnow"))
      .getOrElse(fail("no winnow kernel in final plan"))
    // `*(n)` prefix = inside a whole-stage-codegen stage
    gen.trim.replaceFirst("^[:+\\- ]+", "") should startWith("*(")
  }

  test("q_winnow_contamination: both corpora union into ONE fingerprint " +
      "exchange reused by the combined-bucket cap and the side-split " +
      "train/eval join; no cartesian") {
    val df = SparkEntry.queries("q_winnow_contamination")(spark, sf())
    df.collect() // finalize AQE so reuse nodes are visible
    val p = df.queryExecution.executedPlan.toString
    p should include("Union")          // the two tagged fingerprint sides
    p should include("ReusedExchange") // cap + join sides share ONE fp exchange
    p.toLowerCase should include("leftsemi") // the combined-bucket cap
    p should not include "CartesianProduct"
    val gen = p.linesIterator.find(_.contains("graft_winnow"))
      .getOrElse(fail("no winnow kernel in final plan"))
    gen.trim.replaceFirst("^[:+\\- ]+", "") should startWith("*(")
  }

  test("q_stream_contamination: the index's fingerprint exchange is " +
      "reused by its cap; candidate fps hash-join the index (no " +
      "cartesian); kernel stays in codegen") {
    val df = SparkEntry.queries("q_stream_contamination")(spark, sf())
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString
    // the index pins its fp partitioning (REPARTITION_BY_COL) — the
    // write-once layout the screen's per-batch joins key on
    p should include("Exchange hashpartitioning(fp")
    p.toLowerCase should include("leftsemi") // the train-side-only cap
    p should not include "CartesianProduct"
    val gen = p.linesIterator.find(_.contains("graft_winnow"))
      .getOrElse(fail("no winnow kernel in final plan"))
    gen.trim.replaceFirst("^[:+\\- ]+", "") should startWith("*(")
  }

  test("q_topk_per_group reduces map-side via the bounded-heap aggregate " +
      "— no window sort over whole partitions") {
    val p = plan("q_topk_per_group")
    p should include("partial_graft_top_k_by_score")
    p should not include "Window"
  }

  test("q_pivot with explicit values keeps Spark's canonical two-phase " +
      "pivot shape (fine-keyed count, then slim pivot-first) with " +
      "map-side partials — and no extra exchanges") {
    val p = plan("q_pivot")
    p should include("partial_count")
    p should include("pivotfirst")
    // exchange 1: (user_id, event_type) counts; exchange 2: user_id
    // pivot-first over the already-slim count rows. A third would mean
    // the explicit-value list stopped short-circuiting column discovery.
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 2
  }

  test("q_tfidf broadcasts the single-row corpus-size frame (no shuffle " +
      "for N) and plans no cartesian") {
    val p = plan("q_tfidf")
    p should include("BroadcastNestedLoopJoin")
    p should not include "CartesianProduct"
  }

  test("q_funnel: one hash shuffle, entry filter above the aggregate " +
      "(no fold re-evaluation), stage-type filter pushed to the scan") {
    val p = plan("q_funnel")
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1
    p should include("partial_collect_list")
    p should include("In(event_type, [click,purchase,view])")
    // the entrant check must be the cheap aggregated flag — a filter on
    // depth/stage_ts would push through the projection and run the
    // whole funnel fold TWICE per user
    p should include("has_first")
    "aggregate\\(evs".r.findAllIn(p).size shouldBe 1
  }

  test("q_gapfill: daily pre-agg combines map-side; the grid join " +
      "broadcasts the slim daily frame (no sort-merge)") {
    val p = plan("q_gapfill")
    p should include("partial_sum")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
  }

  test("q_outliers: per-key moments broadcast back onto the scan — the " +
      "event log itself never shuffles") {
    val p = plan("q_outliers")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    // only the tiny stats agg may shuffle
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1
  }

  test("q_bm25: no explode (tf via one array pass), stats broadcast, " +
      "bounded top-k, and NO tokenizer re-run in the corpus scan filter") {
    val p = plan("q_bm25")
    p should not include "Generate" // explode-free per-term tf
    p should include("TakeOrderedAndProject")
    p should include("BroadcastNestedLoopJoin") // 1-row stats frame
    // the corpus-side scan must carry no DataFilters: pushed-down
    // isnotnull predicates would re-evaluate graft_word_ngrams per row
    val corpusScan = p.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("doc_id"))
      .mkString
    corpusScan should include("DataFilters: []")
  }

  test("q_kmv_distinct: the sketch branch keeps its own single " +
      "partial+merge exchange — not dragged through countDistinct's " +
      "two-shuffle Expand rewrite") {
    val p = plan("q_kmv_distinct")
    p should include("partial_graft_kmv_distinct")
    // sketch branch: exactly one exchange between partial and merge,
    // keyed on the group column alone (a (flag, orderkey) exchange
    // would mean the distinct rewrite captured the sketch)
    "Exchange hashpartitioning\\(l_returnflag#\\d+, \\d+\\)".r
      .findAllIn(p).size should be >= 1
    "partial_graft_kmv_distinct".r.findAllIn(p).size shouldBe 1
  }

  test("q_quantile_sketch: the sketch branch is ONE map-side-partial " +
      "bottom-k aggregate — no Expand, no Window, and the only Sort is " +
      "the 5-row presentation order") {
    val p = plan("q_quantile_sketch")
    "partial_graft_bottom_k_by_hash".r.findAllIn(p).size shouldBe 1
    p should not include "Expand"
    p should not include "Window"
    // exactly one Sort node: the final orderBy(lang) over the joined
    // 5-row frame — the sketch path must never sort the corpus (that
    // full sorted pass is what the sketch exists to replace)
    "\\bSort \\[".r.findAllIn(p).size shouldBe 1
  }

  test("q_sessionize: ONE hash shuffle total — lag + cumsum share the " +
      "window sort and the session summary reuses the user partitioning") {
    val p = plan("q_sessionize")
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1
    p should include("partial_count")
    // both window ops must sit over a single in-partition sort
    "Sort \\[user_id#\\d+L ASC NULLS FIRST, tt#\\d+ ASC NULLS FIRST\\], false"
      .r.findAllIn(p).size shouldBe 1
  }

  test("q_inverted: rare-term list broadcasts; only slim term counts and " +
      "the joined postings shuffle (no sort-merge)") {
    val p = plan("q_inverted")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    p should include("array_distinct") // per-doc dedup is in-row
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 2
  }

  test("q_cms: grid combines map-side before the single-partition merge; " +
      "probe filter pushes to the scan") {
    val p = plan("q_cms")
    p should include("partial_graft_count_min")
    p should include("LessThanOrEqual(user_id,9)")
    p should not include "SortMergeJoin"
  }

  test("q_bloom_join: bloom builds map-side, and the probe prunes the " +
      "lineitem side BEFORE the exact join") {
    val p = plan("q_bloom_join")
    p should include("partial_graft_bloom")
    // the probe predicate (splitmix + bit test) must appear in a Filter
    // between the lineitem scan and the o_orderkey join
    val probeIdx = p.indexOf("graft_splitmix64((l_orderkey")
    probeIdx should be > 0
    val joinIdx = p.indexOf("BroadcastHashJoin [l_orderkey")
    joinIdx should be > 0
    probeIdx should be > joinIdx // toString prints parents first
    p should include("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,400000.0)]")
  }

  test("q_rank_suite: all five window functions share ONE hash exchange " +
      "and one partition sort (same spec -> no per-function re-sort)") {
    val p = plan("q_rank_suite")
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1
    // lead/first_value/ntile/percent_rank/cume_dist all carry the same
    // (partition, order) spec, so Spark fuses them into ONE Window
    // operator over one partition sort.
    "\\bWindow\\b".r.findAllIn(p).size shouldBe 1
    p should include("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,400000.0)]")
  }

  test("q_sample is a bounded TakeOrderedAndProject over the hash key — " +
      "no global sort, no corpus shuffle") {
    val p = plan("q_sample")
    p should include("TakeOrderedAndProject")
    p should not include "Exchange hashpartitioning"
  }

  test("q_zorder: interleave is pure codegen'd arithmetic feeding one " +
      "partial+final count shuffle") {
    val p = plan("q_zorder")
    p should include("partial_count")
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1
    p should not include "Join"
  }

  test("q_diversity is a shuffle-free narrow scan (kernel, not " +
      "explode+groupBy) reading only doc_id and text") {
    val p = plan("q_diversity")
    p should not include "Exchange hashpartitioning"
    p should not include "Generate" // no explode
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).getOrElse(fail("no ReadSchema in plan")).group(1)
    readSchema should include("doc_id")
    readSchema should include("text")
    readSchema should not include "lang"
    readSchema should not include "source"
  }

  test("q_sample_stratified reduces map-side via the bounded bottom-k " +
      "aggregate — one exchange, no window sort, no join-back") {
    val p = plan("q_sample_stratified")
    p should include("partial_graft_bottom_k_by_hash")
    p should not include "Window"
    p should not include "Join"
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1
  }

  test("q_ann_recall: both serving paths reduce map-side via the " +
      "bounded heap; hit counting is a semi join, no raw top-k " +
      "window sort") {
    val p = plan("q_ann_recall")
    // brute AND ivf sides both aggregate through the bounded heap
    "partial_graft_top_k_by_score".r.findAllIn(p).size should be >= 2
    p.toLowerCase should include("leftsemi")
    p should not include "Window"
  }

  test("q_ann_ivf_int8: the int8 serve quantizes the corpus side " +
      "(codegen'd kernels) and still reduces through the bounded heap " +
      "— no Window, no raw-score sort") {
    val p = plan("q_ann_ivf_int8")
    p should include("graft_quantize_vec")
    p should include("graft_dequantize_vec")
    // brute + f32 ivf + int8 ivf: all three serve paths heap-reduce
    "partial_graft_top_k_by_score".r.findAllIn(p).size should be >= 3
    p should not include "Window"
  }

  test("q_skipgram: in-row pair expansion feeds map-side partial counts " +
      "and a bounded top-k — no self-join, no global sort") {
    val p = plan("q_skipgram")
    p should include("partial_count")
    p should include("TakeOrderedAndProject")
    p should not include "Join"
  }

  test("q_pit_join: the temporal match is the as-of union trick — ONE " +
      "window over one sort exchange plus the feed compaction, no join " +
      "operator at all, no interval range join") {
    val p = plan("q_pit_join")
    "\\bWindow\\b".r.findAllIn(p).size shouldBe 1
    // compaction agg exchange + the union window exchange
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 2
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("q_outliers_robust: the log never shuffles — two bounded sketch " +
      "aggregates exchange, med/MAD broadcast back, no sort-merge, " +
      "no window") {
    val p = plan("q_outliers_robust")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    p should not include "Window"
    "partial_graft_bottom_k_by_hash".r.findAllIn(p).size should be >= 2
  }

  test("q_reachability executes WITH RECURSIVE as a UnionLoop — one " +
      "Window builds the edges, counts combine map-side, no cartesian") {
    val p = plan("q_reachability")
    p should include("UnionLoop") // Spark 4.1's recursive-CTE operator
    "\\bWindow\\b".r.findAllIn(p).size shouldBe 1
    p should include("partial_count")
    p should not include "CartesianProduct"
  }

  test("q_cluster_sample: centroid assignment is pure projection " +
      "feeding the bounded bottom-k — one aggregate exchange, no " +
      "window sort, no join") {
    val p = plan("q_cluster_sample")
    p should include("partial_graft_bottom_k_by_hash")
    p should not include "Window"
    p should not include "Join"
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1
  }

  test("q_stream_enrich broadcasts the slimmed dim — the stream side " +
      "only shuffles for the post-enrichment rollup") {
    val p = plan("q_stream_enrich")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1 // the rollup
    // dim scan reads only the probed columns
    p should not include "c_acctbal"
  }

  test("q_exists decorrelates both subqueries to joins (no per-row " +
      "re-execution, no cartesian)") {
    val p = plan("q_exists")
    p.toLowerCase should include("leftsemi")   // EXISTS
    p should not include "CartesianProduct"
    p should include("partial_count")          // pre-aggregated scalar subquery
  }

  test("q_novelty attaches corpus df via a partition-only window — no " +
      "self-join, text pruned after the narrow ngram scan") {
    val p = plan("q_novelty")
    p should not include "Join"
    p should include("graft_word_ngrams")
    // exchange 1: (id, ngram) on ngram for the window; exchange 2: the
    // per-doc fold on doc_id. A third would mean a df self-join crept in.
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 2
  }

  test("char-diversity kernel stays inside whole-stage codegen") {
    val df = SparkEntry.queries("q_diversity")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val projLine = p.linesIterator
      .find(l => l.contains("graft_char_diversity") && l.contains("Project"))
      .getOrElse(fail("no kernel Project in final plan"))
    projLine.trim.replaceFirst("^[:+\\- ]+", "") should startWith("*(")
  }

  test("text-stats kernel stays inside whole-stage codegen") {
    // AQE's initial plan carries no codegen annotation; execute first,
    // then inspect the FINAL plan for the codegen span around the kernel.
    val df = SparkEntry.queries("q_text_stats")(spark, sf())
    df.collect() // finalize THIS df's AQE plan (write.save would re-plan)
    val p = df.queryExecution.executedPlan.toString
    // In the final plan's compact form a `*(n)` prefix marks operators
    // inside a whole-stage-codegen stage. The kernel's Project must
    // carry it — a CodegenFallback expression would strip it.
    val projLine = p.linesIterator
      .find(l => l.contains("graft_text_stats") && l.contains("Project"))
      .getOrElse(fail("no kernel Project in final plan"))
    projLine.trim.stripPrefix("+- ") should startWith("*(")
  }

  test("q_semdedup bounds the pair scan per-cluster and anti-joins the " +
      "drop set back on the id key — no cartesian") {
    val p = plan("q_semdedup")
    p should not include "CartesianProduct"
    // candidate pairs join keyed on cluster id (the SemDeDup scale
    // bound); at sf0.001 AQE broadcasts it, at scale it shuffles — the
    // pin is the KEY, not the impl
    "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[cluster".r
      .findFirstIn(p) should not be empty
    // the cosine gate rides the join condition (no post-join filter row
    // explosion), via the codegen'd kernel
    p should include("graft_cosine_sim")
    // the pair scan enters via the 2-probe assignment (boundary-pair
    // fix): an explode of the top-2 centroid list — bounded 2x fanout,
    // NOT an all-pairs widening
    p should include("graft_centroid_probes")
    // kept set = corpus ANTI JOIN drop ids on the id key. Deliberately
    // NOT pinned to BroadcastHashJoin: at demo taus AQE broadcasts the
    // tiny drop set, but at production tau (~0.95) SemDeDup drops ~half
    // the corpus and a forced broadcast would OOM — the shuffled anti
    // join is the correct degradation, so the pin is key + LeftAnti.
    "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[vec_id[^\\]]*\\], \\[vec_id[^\\]]*\\], LeftAnti".r
      .findFirstIn(p) should not be empty
  }

  test("q_retention: no Expand (COUNT(*), never COUNT(DISTINCT)), cohort " +
      "sizes broadcast back, no Window, no cartesian") {
    val p = plan("q_retention")
    // rows are unique per (user, period) after the distinct, so the grid
    // cell count is a plain COUNT(*) — a COUNT(DISTINCT) would ride a
    // row-multiplying Expand, the q_profile scale-killer shape
    p should not include "Expand"
    p should not include "Window"
    p should not include "CartesianProduct"
    // the one-row-per-cohort sizes frame joins back via broadcast
    p should include("BroadcastHashJoin")
    // the corpus-sized distinct gets map-side partial dedup (a
    // HashAggregate below its exchange), so raw events never shuffle
    p should include("partial_min")
  }

  test("q_setsim: candidate pairs join on the prefix TOKEN (never an " +
      "all-pairs cartesian); verify joins are id-keyed") {
    val p = plan("q_setsim")
    p should not include "CartesianProduct"
    // the candidate generator is keyed on the rarest-first prefix token
    "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[tok".r
      .findFirstIn(p) should not be empty
    // exact-verify joins ship token arrays keyed on doc id only
    "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[id_a".r
      .findFirstIn(p) should not be empty
  }

  test("q_corr: one aggregate exchange with map-side partial sums, " +
      "no Expand, no Window") {
    val p = plan("q_corr")
    p should include("partial_sum")
    p should not include "Expand"
    p should not include "Window"
    // exactly one hash exchange: the grouped-moments aggregate (the
    // final formula is a projection over the 6-row stats frame)
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1
  }

  test("q_zorder3: the spread cascade is pure projection — one count " +
      "exchange, no join, no Window") {
    val p = plan("q_zorder3")
    p should not include "Join"
    p should not include "Window"
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1
    p should include("partial_count")
  }

  test("q_sample_weighted_stratified: bounded-heap per-group aggregate " +
      "— no Window sort, no join-back") {
    val p = plan("q_sample_weighted_stratified")
    p should not include "Window"
    p should not include "Join"
    // the priority top-k reduces map-side before its one exchange
    p should include("partial_graft_top_k_by_score")
  }

  test("q_kmv_resemblance: sketch and exact paths never go cartesian " +
      "over the corpus; the exact intersection is an equi join on the " +
      "order key") {
    val p = plan("q_kmv_resemblance")
    p should not include "CartesianProduct"
    // exact |A∩B| joins the distinct (flag, key) frame on the KEY
    "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[k".r
      .findFirstIn(p) should not be empty
    // the sketch aggregate keeps map-side partials
    p should include("partial_graft_bottom_k_by_hash")
  }

  test("q_quality_gate is a shuffle-free narrow scan — fused kernel + " +
      "token-array exprs, no Generate, reads only doc_id and text") {
    val p = plan("q_quality_gate")
    p should not include "Exchange hashpartitioning"
    p should not include "Generate" // rules fold in-row, nothing explodes
    p should include("graft_text_stats") // stats via the fused kernel
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).getOrElse(fail("no ReadSchema in plan")).group(1)
    readSchema should include("doc_id")
    readSchema should include("text")
    readSchema should not include "lang"
    readSchema should not include "source"
  }

  test("q_hilbert: 20 chained reflect+swap rounds stay pure codegen'd " +
      "arithmetic feeding one partial+final count shuffle — like " +
      "q_zorder, no join, no UDF") {
    val p = plan("q_hilbert")
    p should include("partial_count")
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1
    p should not include "Join"
    p should not include "BatchEvalPython"
  }

  test("q_sample_weighted is the same bounded TakeOrderedAndProject as " +
      "q_sample — per-partition top-k on the priority, no corpus shuffle") {
    val p = plan("q_sample_weighted")
    p should include("TakeOrderedAndProject")
    p should not include "Exchange hashpartitioning"
  }

  test("q_fuzzy_match: pair scan is keyed on the block (never an " +
      "all-pairs cartesian); the threshold rides INSIDE levenshtein") {
    val p = plan("q_fuzzy_match")
    p should not include "CartesianProduct"
    "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[block".r
      .findFirstIn(p) should not be empty
    // 3-arg form: early-abandons a pair once the running distance
    // exceeds the threshold (O(maxDist*len) per pair, not O(len^2))
    p should include("levenshtein(name_a")
  }

  test("q_pagerank: per-round frames are pinned (the final plan reads " +
      "the round-5 RDD — the pin bounds BROADCAST re-execution, see " +
      "Graph.scala), and the top-50 is a bounded TakeOrderedAndProject") {
    val p = plan("q_pagerank")
    p should include("TakeOrderedAndProject")
    p should include("ExistingRDD") // lineage cut at the last round pin
    p should not include "Exchange hashpartitioning"
  }

  test("q_snapshot_diff: the unavoidable full-outer key join is there " +
      "exactly once; the merge that BUILDS the new snapshot stays all-" +
      "broadcast (the snapshot itself never shuffles into the merge)") {
    val p = plan("q_snapshot_diff")
    p should include("FullOuter")
    p should include("BroadcastHashJoin")
    "FullOuter".r.findAllIn(p).size shouldBe 1
  }

  test("q_split_leakfree: no Window sort on the assignment path; the " +
      "cascade+closure members frame is pinned (ExistingRDD), so the " +
      "corpus-side work is the two slim bucket joins only") {
    val p = plan("q_split_leakfree")
    p should not include "Window"
    p should include("ExistingRDD") // nearDupClusters' per-round pins
  }

  test("q_semantic_contamination: bucketing is the PlaneSigns kernel " +
      "and the candidate join is bucket-keyed, never all-pairs") {
    val p = plan("q_semantic_contamination")
    p should include("graft_plane_signs")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("q_linkage_fs: pair scan keyed on (block, gi, gj) with explicit " +
      "partition counts; score and decision run inline — no Window, " +
      "no post-join exchange of the pair stream") {
    val p = plan("q_linkage_fs")
    p should not include "Window"
    p should include("Exchange hashpartitioning(block")
    "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[block".r
      .findFirstIn(p) should not be empty
  }

  test("q_zonemap: sketch edges ride a broadcast onto narrow scans; " +
      "zone-map envelopes aggregate map-side-partially") {
    val p = plan("q_zonemap")
    p should include("BroadcastExchange")
    p should include("partial_min")
    // the boundary sketch is the bottom-k-by-hash aggregate, once per
    // layout (clustered edges + natural edges)
    "partial_graft_bottom_k_by_hash".r.findAllIn(p).size shouldBe 2
    p should not include "Window"
  }

  test("q_label_prop: per-round frames are pinned (the final plan " +
      "reads the round-3 RDD) like the PageRank family") {
    val p = plan("q_label_prop")
    p should include("ExistingRDD")
    p should not include "Window" // the seed-dup guard sits behind the pin
  }

  test("q_attribution: both RANGE frames and the touch count fuse into " +
      "ONE Window operator over one user-key exchange") {
    val p = plan("q_attribution")
    "\\bWindow \\[".r.findAllIn(p).size shouldBe 1
    "Exchange hashpartitioning\\(user_id".r.findAllIn(p).size shouldBe 1
  }

  test("q_quota_mix: ONE bounded bottom-k aggregate exchange; the " +
      "quota cut is a literal when-chain — no Window, no join-back") {
    val p = plan("q_quota_mix")
    p should include("partial_graft_bottom_k_by_hash")
    p should not include "Window"
    p should not include "SortMergeJoin"
    p should not include "BroadcastHashJoin"
  }

  test("q_span_dedup: span counts shuffle as 64-bit fingerprints with " +
      "map-side partials; the keeper rides the aggregation buffer — " +
      "no Window on the count path") {
    val p = plan("q_span_dedup")
    p should include("graft_rolling_hash64")
    p should include("partial_count")
    p should not include "Window"
  }

  test("q_hits: per-round frames are pinned (final plan reads the " +
      "round-3 RDDs) like the rest of the centrality family") {
    val p = plan("q_hits")
    p should include("ExistingRDD")
    p should not include "Window"
  }

  test("q_hard_negatives: band filter sits under the bounded-heap " +
      "partials — out-of-band rows never enter the aggregate") {
    val p = plan("q_hard_negatives")
    p should include("partial_graft_top_k_by_score")
    p should include("BroadcastNestedLoopJoin") // corpus x broadcast(q)
    p should not include "Window"
  }

  test("q_trending: conditional per-side sums partial map-side; the " +
      "top-20 is a bounded TakeOrderedAndProject") {
    val p = plan("q_trending")
    p should include("partial_sum")
    p should include("TakeOrderedAndProject")
  }

  test("q_winsorize: band frame broadcasts back onto a narrow scan — " +
      "the log itself never shuffles") {
    val p = plan("q_winsorize")
    p should include("BroadcastHashJoin")
    p should include("partial_graft_bottom_k_by_hash") // the sketch
    p should not include "SortMergeJoin"
  }

  test("q_distinct_cube: no Expand anywhere — the corpus feeds the " +
      "pinned leaf sketches once, subtotal levels fold leaf rows " +
      "(ExistingRDD), exact sides are distinct+count passes") {
    val p = plan("q_distinct_cube")
    p should not include "Expand"
    p should include("ExistingRDD") // the pinned leaf-sketch frame
    p should not include "Window"
  }

  test("q_profile_drift: ONE plain aggregate per side — no Expand " +
      "(the q_profile_sketch discipline), no Window") {
    val p = plan("q_profile_drift")
    p should not include "Expand"
    p should not include "Window"
    "partial_graft_kmv_distinct".r.findAllIn(p).size should be >= 2
  }

  test("q_triangles: oriented wedge join — no cartesian, no Window, " +
      "map-side partial counts everywhere") {
    val p = plan("q_triangles")
    p should not include "CartesianProduct"
    p should not include "Window"
    p should include("partial_count")
  }

  test("q_lm_score / q_dsir: ONE plain per-doc aggregate, count tables " +
      "partial-aggregated before their shuffles, no Window/Expand") {
    val lm = plan("q_lm_score")
    lm should not include "Window"
    lm should not include "Expand"
    lm should include("partial_count")
    val ds = plan("q_dsir")
    ds should not include "Window"
    // B-row bucket models ride broadcasts onto the scoring stream
    ds should include("BroadcastHashJoin")
  }

  test("q_gopher_rep: partial counts before every gram shuffle, exactly " +
      "TWO windows (one per dup-n, partitions bounded by the owning " +
      "doc), no cartesian/Expand") {
    val p = plan("q_gopher_rep")
    p should include("partial_count")
    "Window".r.findAllIn(p).size shouldBe 2
    p should not include "CartesianProduct"
    p should not include "Expand"
  }

  test("q_moore_lewis: two lmScore pipelines stay Window/Expand-free " +
      "with map-side partial counts") {
    val p = plan("q_moore_lewis")
    p should not include "Window"
    p should not include "Expand"
    p should include("partial_count")
  }

  test("q_kcore: final plan SERVES the already-pinned fixpoint degree " +
      "frame (r20: no re-aggregate — the loop's last degree count IS " +
      "the answer) — no cartesian, no Window, no aggregate at all") {
    val p = plan("q_kcore")
    p should include("Scan ExistingRDD")
    // the old shape re-counted degrees over the pinned edges; the pin
    // now asserts that redundant pass stays gone
    p should not include "partial_count"
    p should not include "CartesianProduct"
    p should not include "Window"
  }

  test("q_ktruss: final edge-support join over the pinned fixpoint " +
      "frames — no cartesian, no Window") {
    val p = plan("q_ktruss")
    p should not include "CartesianProduct"
    p should not include "Window"
  }

  test("q_calibrated_gate: ALL signal sketches ride ONE aggregate pass " +
      "(three bottom-k partials, no Expand), thresholds broadcast, no " +
      "Window") {
    val p = plan("q_calibrated_gate")
    "partial_graft_bottom_k".r.findAllIn(p).size shouldBe 3
    p should not include "Expand"
    p should not include "Window"
    p should include("BroadcastNestedLoopJoin") // the 1-row threshold frame
  }

  test("q_rolling_quantiles: per-day bottom-k partials, banded sketch-row " +
      "join — no Window, nothing event-sized past the daily aggregate") {
    val p = plan("q_rolling_quantiles")
    p should include("partial_graft_bottom_k")
    p should not include "Window"
    p should not include "CartesianProduct"
  }

  test("q_rate_spikes: map-side partial counts + bounded top-k cut, " +
      "no Window") {
    val p = plan("q_rate_spikes")
    p should include("partial_count")
    p should include("TakeOrderedAndProject")
    p should not include "Window"
  }

  test("q_bootstrap_ci: all 2B+2 replicate sums in ONE aggregate with " +
      "map-side partials — no Expand, no Window, no row-replicate " +
      "explosion (no Generate)") {
    val p = plan("q_bootstrap_ci")
    p should include("partial_sum")
    p should not include "Expand"
    p should not include "Window"
    p should not include "Generate"
  }

  test("q_link_pred: wedge aggregate has map-side partials, the top-50 " +
      "cut is a bounded TakeOrderedAndProject — no cartesian, no Window") {
    val p = plan("q_link_pred")
    p should include("partial_count")
    p should include("TakeOrderedAndProject")
    p should not include "CartesianProduct"
    p should not include "Window"
  }

  test("q_modularity: community rollup is two partial-aggregated " +
      "passes — no Window, no cartesian") {
    val p = plan("q_modularity")
    p should include("partial_count")
    p should include("partial_sum")
    p should not include "CartesianProduct"
    p should not include "Window"
  }

  test("q_auc: corpus collapses to the distinct-score histogram with " +
      "map-side partials BEFORE the rank window (which runs over the " +
      "score domain, not the rows); scan reads only value+event_type") {
    val p = plan("q_auc")
    p should include("partial_count")
    p should include("Window")
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).getOrElse(fail("no ReadSchema in plan")).group(1)
    readSchema should include("value")
    readSchema should include("event_type")
    readSchema should not include "user_id"
    readSchema should not include "props"
  }

  test("q_kappa: the corpus folds to four confusion counters in ONE " +
      "map-side-partial aggregate; scan reads only text+lang") {
    val p = plan("q_kappa")
    p should include("partial_sum")
    p should not include "Window"
    p should not include "CartesianProduct"
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).getOrElse(fail("no ReadSchema in plan")).group(1)
    readSchema should include("text")
    readSchema should include("lang")
    readSchema should not include "source"
    readSchema should not include "n_chars"
  }

  test("q_gini: events collapse to per-(type,user) partial sums before " +
      "the rank window (which runs over the aggregate, partitioned by " +
      "type); scan skips props/ts") {
    val p = plan("q_gini")
    p should include("partial_sum")
    p should include("Window")
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).getOrElse(fail("no ReadSchema in plan")).group(1)
    readSchema should include("event_type")
    readSchema should include("user_id")
    readSchema should include("value")
    readSchema should not include "props"
  }

  test("q_luhn_scrub: narrow per-row HOF work — no aggregate shuffle, " +
      "no Window, no join; scan reads only doc_id+text") {
    val p = plan("q_luhn_scrub")
    p should not include "Window"
    p should not include "Join"
    p should not include "hashpartitioning"
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).getOrElse(fail("no ReadSchema in plan")).group(1)
    readSchema should include("doc_id")
    readSchema should include("text")
    readSchema should not include "lang"
  }

  test("q_ann_pq: all three serving paths (ADC, rerank, ground truth) " +
      "reduce map-side via the bounded-heap top-k partial; queries " +
      "broadcast — no sort-merge join, no Window") {
    val p = plan("q_ann_pq")
    "partial_graft_top_k_by_score".r.findAllIn(p).size should be >= 3
    p should include("BroadcastNestedLoopJoin") // broadcast query side
    p should not include "SortMergeJoin"
    p should not include "Window"
  }

  test("q_ann_ivfpq: probed-list gating is a broadcast HASH join on the " +
      "cluster id (probe frame broadcast — corpus codes never shuffle); " +
      "ADC scores PQ reconstructions inside the probed lists only; all " +
      "serving paths reduce via bounded heaps; no Window, no cartesian") {
    val p = plan("q_ann_ivfpq")
    // the gating join: broadcast the exploded probe set, hash on cluster
    p should include("BroadcastHashJoin")
    // codes-only list scan: the candidate side carries pq codes, scored
    // via the decode kernel against the broadcast query vector
    p should include("graft_pq_encode")
    p should include("graft_pq_decode")
    p should include("graft_centroid_probes")
    // ADC + rerank + ground-truth paths all bounded-heap partials
    "partial_graft_top_k_by_score".r.findAllIn(p).size should be >= 3
    p should not include "SortMergeJoin"
    p should not include "Window"
    p should not include "CartesianProduct"
  }

  test("q_ann_ivfpq_residual keeps q_ann_ivfpq's exact serve shape — " +
      "residual encode/decode adds only zip_with projections, no new " +
      "shuffle/join/window") {
    val p = plan("q_ann_ivfpq_residual")
    p should include("BroadcastHashJoin")
    p should include("graft_pq_encode")
    p should include("graft_pq_decode")
    p should include("graft_centroid_probes")
    "partial_graft_top_k_by_score".r.findAllIn(p).size should be >= 3
    p should not include "SortMergeJoin"
    p should not include "Window"
    p should not include "CartesianProduct"
  }

  test("q_ann_incr: serving from the FOLDED index keeps q_ann_ivfpq's " +
      "shape — the probe frame broadcasts onto a hash join over the " +
      "unioned (evens-built + odds-appended) code rows, a bounded heap " +
      "reduces; no SortMergeJoin, no Window, no cartesian") {
    val p = plan("q_ann_incr")
    p should include("BroadcastHashJoin")
    p should include("Union") // the appended index really is a union
    p should include("graft_pq_encode")
    p should include("graft_pq_decode")
    p should include("graft_centroid_probes")
    p should include("partial_graft_top_k_by_score")
    p should not include "SortMergeJoin"
    p should not include "Window"
    p should not include "CartesianProduct"
  }

  test("q_ann_upsert: the stale-row retirement is a BROADCAST anti-join " +
      "(the arriving id set is small), the serve keeps q_ann_incr's " +
      "broadcast-probe shape; no SortMergeJoin, no Window") {
    val p = plan("q_ann_upsert")
    p should include("BroadcastHashJoin")
    p should include("LeftAnti") // the upsert's retirement join
    p should include("graft_pq_encode")
    p should include("graft_centroid_probes")
    p should include("partial_graft_top_k_by_score")
    p should not include "SortMergeJoin"
    p should not include "Window"
  }

  test("q_ann_compact: compaction is ONE range exchange over the slim " +
      "code rows (the cluster-colocated rewrite; Catalyst rightly " +
      "ELIMINATES the in-partition sort when the consumer is a serve " +
      "join rather than the file write — EliminateSorts, pinned here " +
      "so the optimization is a documented fact, not an accident); " +
      "the serve on top stays broadcast-probe shaped") {
    val p = plan("q_ann_compact")
    p should include("rangepartitioning(cluster") // the layout rewrite
    p should not include "Sort [cluster" // eliminated under a serve
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
  }

  test("q_dedup_retract: the repair path is anti/semi joins + the " +
      "closure's shape — no Window sort, no cartesian; the pair-store " +
      "compaction's exchange is range partitioning") {
    val p = plan("q_dedup_retract")
    p should include("LeftAnti")
    p should include("LeftSemi")
    p should not include "Window"
    p should not include "CartesianProduct"
  }

  test("q_pagerank_incr: the warm-start prior join stays a slim " +
      "node-frame join outside the rounds; no cartesian anywhere in " +
      "the four composed rank chains") {
    val p = plan("q_pagerank_incr")
    p should not include "CartesianProduct"
    p should not include "Window"
  }

  test("q_cms_incr / q_bloom_incr: sketch builds are single " +
      "TypedImperativeAggregate passes (objectagg), merges are slim " +
      "cell-row aggregates; no Window, no cartesian") {
    Seq("q_cms_incr", "q_bloom_incr").foreach { q =>
      val p = plan(q)
      p.toLowerCase should include("objecthashaggregate")
      p should not include "Window"
      p should not include "CartesianProduct"
      val readSchema = "ReadSchema: struct<([^>]*)>".r
        .findFirstMatchIn(p).getOrElse(fail("no ReadSchema in plan")).group(1)
      readSchema should include("user_id")
      readSchema should not include "props"
    }
  }

  test("q_hll_incremental: register builds are partial_max map-side " +
      "aggregates; scans read only the probed columns; no Window, no " +
      "cartesian") {
    val p = plan("q_hll_incremental")
    p should include("partial_max")
    p should not include "Window"
    p should not include "CartesianProduct"
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).getOrElse(fail("no ReadSchema in plan")).group(1)
    readSchema should include("user_id")
    readSchema should not include "props"
    readSchema should not include "value"
  }

  test("q_curate_coreness: the cut is a bounded TakeOrderedAndProject " +
      "over the node-sized coreness frame, broadcast-joined to the " +
      "catalog — the item table never shuffles; no cartesian") {
    val p = plan("q_curate_coreness")
    p should include("TakeOrderedAndProject")
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
  }

  test("q_interpolate: daily partial-aggregated collapse before the " +
      "spine; BOTH neighbor frames fuse into ONE Window (one sort, one " +
      "exchange); no cartesian") {
    val p = plan("q_interpolate")
    p should include("partial_sum")
    "Window".r.findAllIn(p).size shouldBe 1
    p should not include "CartesianProduct"
  }

  test("q_abtest: the corpus folds to four variant counters in ONE " +
      "map-side-partial aggregate; scan reads only user_id+event_type") {
    val p = plan("q_abtest")
    p should include("partial_sum")
    p should not include "Window"
    p should not include "CartesianProduct"
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).getOrElse(fail("no ReadSchema in plan")).group(1)
    readSchema should include("user_id")
    readSchema should include("event_type")
    readSchema should not include "value"
    readSchema should not include "props"
  }

  test("q_incr_agg: base snapshot and change feed each collapse with " +
      "map-side partials; one key-join, no Window, no cartesian; scan " +
      "reads only the three order columns") {
    val p = plan("q_incr_agg")
    p should include("partial_count")
    p should include("partial_sum")
    p should not include "Window"
    p should not include "CartesianProduct"
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).getOrElse(fail("no ReadSchema in plan")).group(1)
    readSchema should include("o_custkey")
    readSchema should include("o_totalprice")
    readSchema should not include "o_orderdate"
  }

  test("q_ks_test: both sides collapse to distinct-value histograms " +
      "with map-side partials before the pooled cumulative window; " +
      "totals on a 1-row broadcast; scan reads only ts+value") {
    val p = plan("q_ks_test")
    p should include("partial_count")
    p should include("Window")
    p should include("BroadcastNestedLoopJoin")
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).getOrElse(fail("no ReadSchema in plan")).group(1)
    readSchema should include("value")
    readSchema should include("ts")
    readSchema should not include "props"
    readSchema should not include "user_id"
  }

  test("q_distinctive_terms: one (group, term) partial-aggregated pass " +
      "over the exploded stream, N on a 1-row broadcast, rank window " +
      "over the vocab frame — no cartesian") {
    val p = plan("q_distinctive_terms")
    p should include("partial_count")
    p should include("BroadcastNestedLoopJoin") // the 1-row N frame
    p should include("Window")
    p should not include "CartesianProduct"
  }

  test("q_sssp: final distance frame reads the pinned fixpoint round " +
      "(ExistingRDD — lineage cut), no cartesian, no Window") {
    val p = plan("q_sssp")
    p should include("ExistingRDD") // per-round pin discipline
    p should not include "CartesianProduct"
    p should not include "Window"
  }

  test("q_benford: the corpus folds to ≤9 digit counters in ONE " +
      "map-side-partial count, total on a 1-row broadcast, scan reads " +
      "only the price column — no Window") {
    val p = plan("q_benford")
    p should include("partial_count")
    p should include("BroadcastNestedLoopJoin") // the 1-row total frame
    p should not include "Window"
    p should not include "CartesianProduct"
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).getOrElse(fail("no ReadSchema in plan")).group(1)
    readSchema should include("l_extendedprice")
    readSchema should not include "l_orderkey"
    readSchema should not include "l_quantity"
  }

  test("q_normalize: shuffle-free narrow per-row replace/regexp chain — " +
      "no join, no aggregate, no Window") {
    val p = plan("q_normalize")
    p should not include "Exchange hashpartitioning"
    p should not include "Join"
    p should not include "Window"
    p should not include "HashAggregate"
  }

  test("q_linkage_em: the cluster-side work folds the blocked pair " +
      "frame to the <=2^K pattern histogram; the EM result itself is a " +
      "driver-local table (rounds x fields rows), not a cluster plan") {
    // The returned frame is the driver EM artifact — pin that nothing
    // heavyweight leaked into it (the histogram collect already ran).
    val p = plan("q_linkage_em")
    p should include("LocalTableScan")
    p should not include "Join"
    p should not include "Window"
  }

  test("q_bpe: rounds ran on the distinct-word table during planning; " +
      "the merge table itself is a driver-local artifact") {
    val p = plan("q_bpe")
    p should include("LocalTableScan")
    p should not include "Join"
    p should not include "Window"
  }

  test("q_pca: covariance reduced cluster-side to dim^2 exact sums; " +
      "the component table is a driver-local artifact") {
    val p = plan("q_pca")
    p should include("LocalTableScan")
    p should not include "Join"
    p should not include "Window"
  }

  test("q_oov: top-k vocab broadcasts onto the eval token stream — " +
      "no sort-merge join, no Window, bounded TakeOrdered vocab cut") {
    val p = plan("q_oov")
    p should include("BroadcastHashJoin")
    p should include("TakeOrderedAndProject")
    p should not include "SortMergeJoin"
    p should not include "Window"
  }

  test("q_hll: registers fold map-side into <= m rows per group; no " +
      "Window, no cartesian, no sort-merge join") {
    val p = plan("q_hll")
    p should include("partial_max")
    p should not include "Window"
    p should not include "CartesianProduct"
    p should not include "SortMergeJoin"
  }

  test("q_url_norm: shuffle-free narrow per-row regex/string chain — " +
      "no join, no aggregate, no Window") {
    val p = plan("q_url_norm")
    p should not include "Exchange hashpartitioning"
    p should not include "Join"
    p should not include "Window"
    p should not include "HashAggregate"
  }

  test("q_simpson: two hash aggregates, no Window, no join — text " +
      "never shuffles past the token count") {
    val p = plan("q_simpson")
    p should include("partial_count")
    p should not include "Window"
    p should not include "Join"
  }

  test("q_seasonal: ONE fused Window for trend sum+count; weekday and " +
      "grand means ride broadcasts — no sort-merge join") {
    val p = plan("q_seasonal")
    "Window".r.findAllIn(p).size shouldBe 1
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
  }

  test("q_pca_project: per-row fold projection — no join, no Window, " +
      "no aggregate; the only exchange is the closing sort") {
    val p = plan("q_pca_project")
    p should not include "Join"
    p should not include "Window"
    p should not include "HashAggregate"
    p should not include "Exchange hashpartitioning"
  }

  test("q_cuped: two slim moment aggregates, pooled row on a 1-row " +
      "broadcast — no Window, no sort-merge join") {
    val p = plan("q_cuped")
    p should include("partial_count")
    p should include("BroadcastNestedLoopJoin")
    p should not include "Window"
    p should not include "SortMergeJoin"
  }

  test("q_calibration: cohort rates ride a broadcast onto the eval " +
      "scan; bin sums aggregate map-side — no Window, no shuffle join") {
    val p = plan("q_calibration")
    p should include("BroadcastHashJoin")
    p should include("partial_count")
    p should not include "Window"
    p should not include "SortMergeJoin"
  }

  test("q_bpe_encode: word-count reduction then per-row HOF merge " +
      "chain — no joins, no Window, map-side partial aggregates") {
    val p = plan("q_bpe_encode")
    p should not include "Join"
    p should not include "Window"
    p should not include "CartesianProduct"
    p should include("partial_count")
  }

  test("q_sample_incr: weighted-sample artifact builds are bounded " +
      "ObjectHashAggregate passes (the priority rides in the buffer — " +
      "no Window sort, no join-back); the merge folds slim pair rows; " +
      "the documents scan never reads text") {
    val p = plan("q_sample_incr")
    p.toLowerCase should include("objecthashaggregate")
    p should include("graft_priority_sample_k")
    p should not include "Window"
    p should not include "CartesianProduct"
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).getOrElse(fail("no ReadSchema in plan")).group(1)
    readSchema should include("n_chars")
    readSchema should not include "text"
  }

  test("q_sample_retract: retraction is a per-row pair filter over " +
      "the stored artifact + a bounded tombstone aggregate — no " +
      "Window sort, no cartesian; text never read") {
    val p = plan("q_sample_retract")
    p.toLowerCase should include("objecthashaggregate")
    p should not include "Window"
    p should not include "CartesianProduct"
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).getOrElse(fail("no ReadSchema in plan")).group(1)
    readSchema should not include "text"
  }

  test("q_dp_count: the DP release costs the two aggregates a plain " +
      "per-group count pays (both map-side partial) + a scalar noise " +
      "expression — no Window, no join, no cartesian; scan reads only " +
      "(event_type, user_id)") {
    val p = plan("q_dp_count")
    p should include("partial_count")
    p should not include "Window"
    p should not include "Join"
    p should not include "CartesianProduct"
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).getOrElse(fail("no ReadSchema in plan")).group(1)
    readSchema should include("event_type")
    readSchema should include("user_id")
    readSchema should not include "props"
  }

  test("q_join_incr: the maintenance legs are equi-joins only — no " +
      "cartesian, no Window, and (round 20) NO exceptAll proof legs: " +
      "the oracle is the proof, so the plan must carry no Generate " +
      "(exceptAll compiles to ReplicateRows) and no from-scratch " +
      "full-corpus join; base scans pruned") {
    val p = plan("q_join_incr")
    p should not include "CartesianProduct"
    p should not include "Window"
    // exceptAll's physical signature: a Generate(replicaterows) over
    // the signed-count union — its reappearance means the in-query
    // proof legs crept back (they cost 5-9s of board time in r19)
    p should not include "Generate"
    p should not include "ReplicateRows"
    val schemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(p).map(_.group(1)).toList
    schemas should not be empty
    schemas.foreach { s =>
      s should not include "o_comment"
      s should not include "l_comment"
    }
  }

  test("q_left_join_incr: maintenance legs are equi/outer joins and " +
      "the counts artifact is a slim aggregate — no cartesian, no " +
      "Window, and (round 20) NO exceptAll proof legs (oracle is the " +
      "proof); base scans pruned") {
    val p = plan("q_left_join_incr")
    p should not include "CartesianProduct"
    p should not include "Window"
    p should not include "Generate"
    p should not include "ReplicateRows"
    val schemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(p).map(_.group(1)).toList
    schemas should not be empty
    schemas.foreach { s =>
      s should not include "o_comment"
      s should not include "l_comment"
    }
  }

  test("q_join_agg_incr: no stored view and no old-join-old leg — the " +
      "plan holds exactly the three delta joins, the two tombstone " +
      "retraction joins, and the slim full-outer aggregate folds; no " +
      "cartesian, no Window; scans pruned") {
    val p = plan("q_join_agg_incr")
    p should not include "CartesianProduct"
    p should not include "Window"
    // every equi-join in the plan is a maintenance leg: 3 delta-rule
    // legs + 2 retraction semi/anti splits' joins with the other side
    // + 2 full-outer aggregate folds + base-agg join. The old⋈old leg
    // would add a join of the two UNFILTERED halves — pin the count
    // ceiling so its reappearance is visible.
    val joins = "(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(p).size
    withClue(s"join count $joins in:\n$p\n") { joins should be <= 12 }
    val schemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(p).map(_.group(1)).toList
    schemas should not be empty
    schemas.foreach { s =>
      s should not include "o_comment"
      s should not include "l_comment"
    }
  }

  test("q_dp_sum: clip+quantize fold into the per-user partial " +
      "aggregate; same two-exchange shape as q_dp_count — no Window, " +
      "no join; scan reads only the three release columns") {
    val p = plan("q_dp_sum")
    p should include("partial_sum")
    p should not include "Window"
    p should not include "Join"
    p should not include "CartesianProduct"
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).getOrElse(fail("no ReadSchema in plan")).group(1)
    readSchema should include("value")
    readSchema should not include "props"
  }
}
