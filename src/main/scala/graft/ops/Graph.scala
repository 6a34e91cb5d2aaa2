package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Graph centrality over relationship graphs the pipeline already
  * builds (near-dup pair graphs, supply/co-occurrence graphs): a
  * fixed-iteration PageRank in INTEGER fixed-point arithmetic, so the
  * result is a pure function of the edge set — bit-for-bit replayable
  * by the DuckDB oracle and stable across engines, partitionings, and
  * summation orders (double-precision PageRank is none of those: fp
  * addition is not associative, so a shuffle reorder changes the
  * ranks).
  *
  * Complements [[Dedup.nearDupClusters]]: components tell you WHICH
  * records form a duplicate group; rank tells you which nodes are the
  * HUBS (a template page duplicated everywhere, a part supplied by
  * every supplier) — the records worth human review before a bulk
  * drop.
  */
object Graph {

  /** Shared PageRank prelude: the pin function (checkpoint vs
    * localCheckpoint — see [[pageRankFixed]] on why per-round pins are
    * load-bearing), the edge frame, the per-source divisor frame, and
    * the pinned divisor-joined edge frame every round re-joins. ONE
    * implementation — the variants' preludes were identical
    * triplicated code. Unweighted (`weightCol` None): distinct edges,
    * divisor = out-degree. Weighted: duplicate (src, dst) edges SUM
    * their weights, divisor = the source's total out-weight (both
    * exposed under the same `outdeg` name so the round bodies share). */
  private def prSetup(edges: DataFrame, srcCol: String, dstCol: String,
      checkpointDir: Option[String], weightCol: Option[String] = None)
      : (DataFrame => DataFrame, DataFrame, DataFrame, DataFrame) = {
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def pin(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint()
      else org.apache.spark.sql.GraftColumnBridge.localCheckpointBounded(df)
    val e = weightCol match {
      case None =>
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
          .distinct()
      case Some(wc) =>
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
            col(wc).cast(org.apache.spark.sql.types.LongType).as("w"))
          // a NULL/zero/negative weight would corrupt every score it
          // touches SILENTLY (null sums, sign flips) — fail loudly with
          // the offending edge instead (the maxEventsPerKey philosophy)
          .where(assert_true(col("w").isNotNull && col("w") > 0,
            concat(lit("pageRankWeighted: edge ("),
              col("src").cast(org.apache.spark.sql.types.StringType),
              lit(" -> "),
              col("dst").cast(org.apache.spark.sql.types.StringType),
              lit(") has non-positive or null weight — weights must be " +
                "positive integers"))).isNull)
          .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    }
    val deg = weightCol match {
      case None => e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      case Some(_) => e.groupBy(col("src")).agg(sum(col("w")).as("outdeg"))
    }
    val ewd = pin(e.join(deg, Seq("src")))
    (pin, e, deg, ewd)
  }

  /** Shared round driver for the NODE-UNIVERSE variants
    * ([[pageRankDangling]], [[pageRankPersonalized]]): universe = src
    * UNION dst, round-invariant dangling set derived once and pinned,
    * per round one contribution join-aggregate + a 1-row broadcast
    * dangling total + a LEFT join onto the universe — the two callers
    * differ ONLY in `scoreFormula(n)`, the selectExpr computing the new
    * score from `node`, `s` (in-mass, null when none), and `dt` (the
    * dangling total). Everything here is the exact code both variants
    * previously triplicated; extracting it changes no plan and no bit
    * (the formulas are passed through verbatim).
    *
    * [[pageRankFixed]] deliberately does NOT route through this
    * driver: its precondition (every node a source, e.g. symmetrized
    * graphs) lets it skip the universe frame, the dangling machinery,
    * and the outer join for a leaner inner-join round — forcing it
    * through the universe shape would cost ~2 extra slim exchanges per
    * round for nothing. */
  private def prUniverseRounds(edges: DataFrame, srcCol: String,
      dstCol: String, iters: Int, unit: Long,
      checkpointDir: Option[String],
      scoreFormula: Long => String,
      weightCol: Option[String] = None,
      init: Option[DataFrame] = None): DataFrame =
    prGraphRounds(prGraph(edges, srcCol, dstCol, checkpointDir, weightCol),
      iters, unit, scoreFormula, init)

  /** The PINNED per-graph setup every universe-variant round loop
    * reads: degree-joined edges, the node universe (+ its one driver
    * count), and the round-invariant dangling set. Build it ONCE with
    * [[prGraph]] when several chains run on the SAME edge frame
    * (warm-vs-cold measurement runs, k+j round compositions —
    * q_pagerank_incr runs three) and pass it to the `*On` variants:
    * each chain then reuses the pinned frames instead of re-deriving
    * distinct/degree/universe per call. Handles are pinned
    * (localCheckpoint or `checkpointDir`), so a PrGraph is tied to
    * the SparkSession that built it. */
  final case class PrGraph private[ops] (
      pin: DataFrame => DataFrame, ewd: DataFrame, nodes: DataFrame,
      n: Long, weighted: Boolean)

  /** Build a [[PrGraph]] — the shared prelude of [[pageRankDangling]]
    * / [[pageRankWeighted]] / [[pageRankWarmStart]] /
    * [[pageRankPersonalized]], extracted so multi-chain callers pay
    * it once. Same contracts as those variants (weighted: positive
    * integer weights, loud raise otherwise). */
  def prGraph(edges: DataFrame, srcCol: String, dstCol: String,
      checkpointDir: Option[String] = None,
      weightCol: Option[String] = None): PrGraph = {
    val (pin, e, deg, ewd) =
      prSetup(edges, srcCol, dstCol, checkpointDir, weightCol)
    // Dangling membership is ROUND-INVARIANT (a function of the edge
    // set alone), so it is derived once — as a BOOLEAN FLAG riding the
    // pinned universe frame (optimization r20): the round loop's
    // dangling total becomes a filter+sum on the scores frame it
    // already holds, replacing the per-round semi-join broadcast (one
    // fewer broadcast-exchange job per round; the loops are
    // driver-job-latency-bound at bench scale). Same motivation as
    // the r17 derive-once fix (deriving in-loop measured 1.4x on the
    // query total at sf0.1: 8.9s -> 6.2s warm at 4 threads).
    val nodes = pin(e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .join(deg.select(col("src").as("node"), lit(true).as("__has_out")),
        Seq("node"), "left")
      .select(col("node"), col("__has_out").isNull.as("__dang")))
    val n = nodes.count() // the one driver scalar: a single long
    PrGraph(pin, ewd, nodes, n, weightCol.isDefined)
  }

  private def prGraphRounds(g: PrGraph, iters: Int, unit: Long,
      scoreFormula: Long => String,
      init: Option[DataFrame]): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val contribSql =
      if (g.weighted) "(score * w) div outdeg" else "score div outdeg"
    // init: a STORED (node, __prior_score) table seeds round 0
    // ([[pageRankWarmStart]]); nodes the prior doesn't know (the edge
    // delta's additions) start at the uniform unit, prior nodes absent
    // from the new universe drop with it (the left join's direction).
    var scores = g.pin(init match {
      case None => g.nodes.withColumn("score", lit(unit))
      case Some(pr) => g.nodes.join(pr, Seq("node"), "left")
        .select(col("node"), col("__dang"),
          coalesce(col("__prior_score"), lit(unit)).as("score"))
    })
    for (_ <- 1 to iters) {
      val contrib = g.ewd.join(scores, g.ewd("src") === scores("node"))
        .select(g.ewd("dst").as("cn"), expr(contribSql).as("c"))
        .groupBy(col("cn")).agg(sum(col("c")).as("s"))
      // dangling total = this round's score mass on the flagged rows —
      // a filter+sum on the frame in hand, not a per-round semi-join
      val dang = scores.where(col("__dang"))
        .agg(coalesce(sum(col("score")), lit(0L)).as("dt"))
      val next = g.pin(scores.select(col("node"), col("__dang"))
        .join(contrib, col("node") === col("cn"), "left")
        .crossJoin(broadcast(dang))
        .selectExpr("node", "__dang", scoreFormula(g.n)))
      // next is eagerly materialized — round R−1's pinned blocks are
      // dead; release them so the loop holds O(1) frames, not O(iters)
      // (r21; the shared g.nodes/g.ewd pins stay for the PrGraph owner)
      org.apache.spark.sql.GraftColumnBridge.releasePin(scores)
      scores = next
    }
    scores.select(col("node"), col("score"))
  }

  /** Fixed `iters` rounds of damped PageRank in integer fixed-point:
    * scores are maintained in units of 1e-6 (`unit` = 1_000_000 ==
    * 1.0), and one round is
    *
    *   score'(v) = base + (dampNum * sum over in-edges (u,v) of
    *               (score(u) div outdeg(u))) div dampDen
    *
    * with `base = unit - unit*dampNum/dampDen` (the un-normalized
    * random-jump mass) and `div` INTEGER division — every operation is
    * exact 64-bit arithmetic, summation is commutative, so the result
    * is deterministic and engine-independent. Fixed iteration count
    * rather than convergence detection for the same reason: the
    * stopping rule must be a pure function of the input.
    *
    * Edges MUST contain every node as a source (symmetrize an
    * undirected graph first — each edge in both directions): the
    * per-round aggregate is keyed on `dst`, so a node with no in-edge
    * would silently leave the frame. Self-loops are honored, duplicate
    * edges are collapsed.
    *
    * Scale shape: each round is one join of the slim (src, dst,
    * outdeg) edge frame against the (node, score) frame plus one
    * map-side-partial sum — the textbook distributed PR round. The
    * edge frame is degree-joined and pinned ONCE; every round's score
    * frame is pinned too, and that per-round pin is LOAD-BEARING, not
    * lineage hygiene: the score side is small, so Catalyst rightly
    * BROADCASTS it into the next round's join, and a broadcast
    * executes its subplan as its own job — with a lazy chain each
    * round re-executes the entire un-pinned prefix (and those re-runs
    * nest), which measured as an exponential job blowup at sf0.1, not
    * the one-job tree a shuffle-only DAG would give. Same
    * `checkpointDir`-for-durability knob as
    * [[Dedup.nearDupClusters]]. */
  def pageRankFixed(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampNum: Long = 85L, dampDen: Long = 100L,
      unit: Long = 1000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val (pin, _, _, ewd) = prSetup(edges, srcCol, dstCol, checkpointDir)
    val base = unit - unit * dampNum / dampDen
    var scores = pin(ewd.select(col("src").as("node")).distinct()
      .withColumn("score", lit(unit)))
    // The lean inner-join round its precondition buys — see
    // [[prUniverseRounds]] for why this variant does not share the
    // universe driver.
    for (_ <- 1 to iters) {
      val next = pin(ewd.join(scores, ewd("src") === scores("node"))
        .select(ewd("dst"), expr("score div outdeg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
        .selectExpr("dst AS node", s"$base + ($dampNum * s) div $dampDen AS score"))
      // release the superseded round pin (r21 loop-storage discipline)
      org.apache.spark.sql.GraftColumnBridge.releasePin(scores)
      scores = next
    }
    scores
  }

  /** [[pageRankFixed]] for REAL directed graphs: lifts both of its
    * preconditions. Nodes with no out-edges (dangling) no longer
    * silently swallow their rank mass — each round their total score
    * is redistributed uniformly (`dt div n` per node, the standard
    * dangling-mass correction); and nodes with no IN-edges no longer
    * fall out of the frame — the node universe is pinned up front as
    * `src UNION dst` and every round LEFT-joins contributions onto it
    * (no in-mass -> coalesce 0, the node keeps its jump base).
    *
    * Same integer fixed-point contract as [[pageRankFixed]]: every
    * operation is exact 64-bit arithmetic, so the DuckDB oracle
    * replays bit-for-bit. The per-node dangling share uses integer
    * division, so up to `n-1` fixed-point UNITS (1e-6 each) of
    * dangling mass round away per iteration — deterministic on both
    * engines, negligible at unit=1e6.
    *
    * Scale shape: the two extra steps per round are a left-anti
    * aggregate of the (small) score frame against the out-degree keys
    * (one slim shuffle) and a 1-row dangling-total frame that CROSS-
    * JOIN-broadcasts into the score update — no driver collect; the
    * only driver scalar is the node COUNT, computed once. Per-round
    * pins are load-bearing for the same broadcast-re-execution reason
    * documented on [[pageRankFixed]]. */
  def pageRankDangling(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampNum: Long = 85L, dampDen: Long = 100L,
      unit: Long = 1000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    val base = unit - unit * dampNum / dampDen
    prUniverseRounds(edges, srcCol, dstCol, iters, unit, checkpointDir,
      n => s"$base + ($dampNum * (coalesce(s, 0L) + dt div $n)) div $dampDen AS score")
  }

  /** PERSONALIZED PageRank (random walk with restart): the jump — and
    * the dangling teleport — return only to the `seeds` instead of
    * uniformly to every node, so rank measures proximity/relevance TO
    * THE SEED SET rather than global centrality (the "related items
    * from these examples" primitive: expand a few flagged templates to
    * the whole template family, rank suppliers around a watchlist).
    * Same [[pageRankDangling]] graph contract (arbitrary directed
    * graphs, dangling + source-only nodes handled) and the same
    * integer fixed-point exactness: the total jump mass
    * `n*unit - (n*unit*damp)` splits evenly over the seeds with
    * integer division (documented sub-unit rounding), non-seeds get a
    * ZERO base — their entire score is inherited walk mass.
    *
    * Seeds are a literal Seq (a personalization set is small by
    * definition — watchlists, flagged ids); they compile into the
    * round projection as an IN list, so no extra join enters the loop.
    * Scale shape and per-round pins: identical to [[pageRankDangling]]. */
  /** WEIGHTED PageRank over [[pageRankDangling]]'s graph contract:
    * edges carry a positive integer weight (duplicate (src, dst) edges
    * SUM theirs — so a raw relationship log IS the input, multiplicity
    * becomes strength), and a source's score splits proportionally —
    * `contribution = (score * w) div out_weight`, exact 64-bit integer
    * arithmetic like every variant here, so the DuckDB oracle replays
    * bit-for-bit. Dangling mass, the pinned node universe, and the
    * uniform jump base are identical to [[pageRankDangling]] (only the
    * contribution split changes).
    *
    * Overflow contract: `max(score) * max(w)` must stay under 2^63 —
    * score is bounded by the total mass `n * unit`, so with the
    * default unit keep weights below ~2^63 / (n * 1e6); rescale
    * heavier weights first (proportions are what matter). */
  def pageRankWeighted(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iters: Int, dampNum: Long = 85L,
      dampDen: Long = 100L, unit: Long = 1000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    val base = unit - unit * dampNum / dampDen
    prUniverseRounds(edges, srcCol, dstCol, iters, unit, checkpointDir,
      n => s"$base + ($dampNum * (coalesce(s, 0L) + dt div $n)) div $dampDen AS score",
      weightCol = Some(weightCol))
  }

  /** WARM-STARTED [[pageRankDangling]] — the graph member of the
    * incremental-artifact family (hllRegisters / lshDedupIndex /
    * ivfPqIndex precedent): after an edge delta, seed round 0 from a
    * STORED rank table (`prior`: the previous run's (node, score)
    * output, persisted like any parquet table) instead of the uniform
    * base. Nodes the prior doesn't know (the delta's additions) start
    * at `unit`; prior nodes that left the universe drop. Ranks on a
    * slightly-changed graph start near the new fixed point, so a warm
    * start reaches a given distance from it in FEWER rounds than a
    * cold start — nightly cost proportional to how much the graph
    * moved, not to the rank computation from scratch (q_pagerank_incr
    * publishes the measured warm-vs-cold convergence deltas). Same
    * integer fixed-point exactness and scale shape as
    * [[pageRankDangling]]; the prior join is one extra slim
    * node-frame join before round 1, outside the loop. */
  def pageRankWarmStart(edges: DataFrame, srcCol: String, dstCol: String,
      prior: DataFrame, priorNodeCol: String, priorScoreCol: String,
      iters: Int, dampNum: Long = 85L, dampDen: Long = 100L,
      unit: Long = 1000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    val base = unit - unit * dampNum / dampDen
    prUniverseRounds(edges, srcCol, dstCol, iters, unit, checkpointDir,
      n => s"$base + ($dampNum * (coalesce(s, 0L) + dt div $n)) div $dampDen AS score",
      init = Some(prior.select(
        col(priorNodeCol).cast(org.apache.spark.sql.types.LongType)
          .as("node"),
        col(priorScoreCol).cast(org.apache.spark.sql.types.LongType)
          .as("__prior_score"))))
  }

  /** [[pageRankDangling]] over a prebuilt [[PrGraph]] — bit-identical
    * rounds, shared setup. Use when several chains (warm/cold/ref
    * comparisons, round compositions) run on ONE edge frame. */
  def pageRankDanglingOn(g: PrGraph, iters: Int, dampNum: Long = 85L,
      dampDen: Long = 100L, unit: Long = 1000000L): DataFrame = {
    require(!g.weighted,
      "pageRankDanglingOn: graph was built weighted — use " +
        "pageRankWeighted's formula via a weighted PrGraph caller")
    val base = unit - unit * dampNum / dampDen
    prGraphRounds(g, iters, unit,
      n => s"$base + ($dampNum * (coalesce(s, 0L) + dt div $n)) div $dampDen AS score",
      init = None)
  }

  /** [[pageRankWarmStart]] over a prebuilt [[PrGraph]] — bit-identical
    * rounds, shared setup (the q_pagerank_incr measurement runs three
    * chains on the same grown graph; this keeps the degree/universe
    * derivation to one). */
  def pageRankWarmStartOn(g: PrGraph, prior: DataFrame,
      priorNodeCol: String, priorScoreCol: String, iters: Int,
      dampNum: Long = 85L, dampDen: Long = 100L,
      unit: Long = 1000000L): DataFrame = {
    require(!g.weighted,
      "pageRankWarmStartOn: graph was built weighted — warm start is " +
        "defined on the unweighted dangling variant")
    val base = unit - unit * dampNum / dampDen
    prGraphRounds(g, iters, unit,
      n => s"$base + ($dampNum * (coalesce(s, 0L) + dt div $n)) div $dampDen AS score",
      init = Some(prior.select(
        col(priorNodeCol).cast(org.apache.spark.sql.types.LongType)
          .as("node"),
        col(priorScoreCol).cast(org.apache.spark.sql.types.LongType)
          .as("__prior_score"))))
  }

  def pageRankPersonalized(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: Seq[Long], iters: Int,
      dampNum: Long = 85L, dampDen: Long = 100L, unit: Long = 1000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    require(seeds.nonEmpty, "personalization needs at least one seed")
    require(seeds.distinct.size == seeds.size, s"duplicate seeds: $seeds")
    val k = seeds.length
    val inSeeds = s"node IN (${seeds.mkString(", ")})"
    prUniverseRounds(edges, srcCol, dstCol, iters, unit, checkpointDir,
      { n =>
        val seedBase = (n * unit - (n * unit * dampNum) / dampDen) / k
        s"(CASE WHEN $inSeeds THEN ${seedBase}L ELSE 0L END) + " +
          s"($dampNum * (coalesce(s, 0L) + " +
          s"(CASE WHEN $inSeeds THEN dt div ${k}L ELSE 0L END))) " +
          s"div $dampDen AS score"
      })
  }

  /** HITS hubs & authorities (Kleinberg 1999) — the centrality the
    * PageRank family cannot express on a DIRECTED graph: PR assigns one
    * importance number, HITS separates "points at important things"
    * (hub) from "is pointed at by important things" (authority) — on a
    * part -> supplier -> nation supply chain, parts are pure hubs,
    * nations pure authorities, suppliers both, each scored by WHO
    * links them, not just how many. Fixed `iters` synchronous rounds
    * of the mutual recursion a = Aᵀh, h = A a (updated a within the
    * round, the classic order), each vector re-normalized to max =
    * `unit` in integer fixed-point: the norm choice only rescales (a
    * scalar divide preserves ratios up to integer truncation), and
    * max-norm keeps every product inside 64 bits. All-integer, so the
    * oracle replays the rounds verbatim.
    *
    * OVERFLOW CONTRACT (the [[pageRankWeighted]] convention): raw
    * sums are bounded by n·unit, and the normalization multiplies by
    * `unit` before dividing — callers must keep n·unit² < 2^63
    * (n < ~9.2e6 at the default unit; drop unit to 1e4 for ~1e11
    * nodes). Scale shape: per round two slim edge |><| score joins +
    * two map-side-partial sums + two 1-row max broadcasts; frames
    * pinned per round (the PR family's load-bearing lineage cut).
    * Returns `(node, hub, authority)` over the edge-endpoint universe. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
      unit: Long = 1000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(unit >= 1, s"unit must be >= 1, got $unit")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def pin(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint()
      else org.apache.spark.sql.GraftColumnBridge.localCheckpointBounded(df)
    val e = pin(edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct())
    val nodes = pin(e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct())
    def normalize(raw0: DataFrame, keyCol: String, valCol: String,
        outCol: String): DataFrame = {
      // raw feeds BOTH the max aggregate and the universe join — cached
      // in-query so the e |><| scores half-round join runs once, not
      // twice (Catalyst re-executes shared subtrees per reference);
      // consumed fully by the eager pin below, so unpersist right after
      val raw = raw0.cache()
      val mx = raw.agg(coalesce(max(col(valCol)), lit(0L)).as("m"))
      val out = pin(nodes.join(raw, nodes("node") === raw(keyCol), "left")
        .crossJoin(broadcast(mx))
        .selectExpr("node",
          s"CASE WHEN m > 0 THEN (coalesce($valCol, 0L) * ${unit}L) div m " +
            s"ELSE 0L END AS $outCol"))
      raw.unpersist(blocking = false)
      out
    }
    var hub = pin(nodes.withColumn("h", lit(unit)))
    var auth = nodes.withColumn("a", lit(0L))
    for (_ <- 1 to iters) {
      val rawA = e.join(hub, e("src") === hub("node"))
        .groupBy(e("dst").as("an")).agg(sum(col("h")).as("ra"))
      val authNext = normalize(rawA, "an", "ra", "a")
      val rawH = e.join(authNext, e("dst") === authNext("node"))
        .groupBy(e("src").as("hn")).agg(sum(col("a")).as("rh"))
      val hubNext = normalize(rawH, "hn", "rh", "h")
      // both successors are pinned — the previous round's hub/auth
      // blocks are dead; release (r21 loop-storage discipline). Round
      // 1's auth was never pinned (plain withColumn) so releasePin is
      // a no-op there by the LogicalRDD match.
      org.apache.spark.sql.GraftColumnBridge.releasePin(hub)
      org.apache.spark.sql.GraftColumnBridge.releasePin(auth)
      auth = authNext
      hub = hubNext
    }
    hub.join(auth, "node")
      .select(col("node"), col("h").as("hub"), col("a").as("authority"))
  }

  /** Semi-supervised LABEL PROPAGATION with clamped seeds (Zhu &
    * Ghahramani 2002 shape, synchronous rounds): spread a small set of
    * trusted labels (hand-audited quality tiers, verified licenses,
    * curated topic tags) across a relationship graph — the near-dup /
    * similarity / supply graphs this file already serves — so every
    * connected record inherits a label without scoring it directly.
    * Per round, every NON-seed node takes the most frequent label
    * among its in-neighbors (`src -> dst`: labels flow along edge
    * direction; symmetrize for undirected spread), ties broken by
    * label ascending — fully deterministic, no RNG, so the whole
    * propagation replays in the oracle as unrolled round CTEs. Seeds
    * never change (clamped); a node with no labeled in-neighbor keeps
    * its previous label (NULL until first reached). Fixed `iters`
    * rounds — labels reach distance-`iters` frontiers; like the PR
    * family, per-round cost is one slim edges |><| labels shuffle-join
    * + one map-side-partial argmax (lexicographic struct min over
    * (-count, label) — no Window), frames pinned per round
    * ([[pageRankFixed]]'s lineage discipline, same `checkpointDir`
    * durability knob).
    *
    * `seeds(seedId, seedLabel)`: at most one row per id (duplicate
    * seed labels for one id would duplicate its node row — enforced).
    * Returns `(id, label)` over the node universe (edge endpoints ∪
    * seeds); label NULL = unreached. */
  def labelPropagate(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedId: String, seedLabel: String, iters: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def pin(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint()
      else org.apache.spark.sql.GraftColumnBridge.localCheckpointBounded(df)
    val e = pin(edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct())
    val sd = seeds.select(col(seedId).as("id"),
      col(seedLabel).as("seed_label"))
      .withColumn("__c", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id"))))
      // duplicate seed rows would duplicate the node row and make the
      // clamp ambiguous — fail loudly with the offending id (seeds are
      // small by contract, so the one-column window is cheap)
      .where(assert_true(col("__c") === 1,
        concat(lit("labelPropagate: duplicate seed rows for id "),
          col("id").cast(org.apache.spark.sql.types.StringType))).isNull)
      .drop("__c")
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .union(sd.select(col("id"))).distinct()
    var lab = pin(nodes.join(sd, Seq("id"), "left")
      .select(col("id"), col("seed_label"),
        col("seed_label").as("label")))
    var round = 0
    while (round < iters) {
      val cnt = e.join(
          lab.where(col("label").isNotNull)
            .select(col("id").as("src"), col("label")),
          Seq("src"))
        .groupBy(col("dst").as("id"), col("label"))
        .agg(count(lit(1)).as("c"))
      // ONE aggregate is both the argmax pick AND the merge back onto
      // the label frame (r21 — the peel loops' job-cut applied here):
      // each id contributes its single lab row (seed + old label, null
      // pick) plus one cnt row per candidate label (null seed/old, the
      // (-count, label) pick struct); keyed by id, min(p) is exactly
      // the old two-step argmax (min over the identical structs, nulls
      // ignored) and max over the singleton lab-row columns recovers
      // seed/old. This replaces the separate pick aggregate + per-round
      // pick broadcast + left join — picks and labels are byte-
      // identical (same structs, same min, same seed-clamp coalesce).
      // The null casts borrow each leg's own label column so the types
      // match by construction.
      val next = pin(lab
        .select(col("id"), col("seed_label"), col("label"),
          when(lit(false),
            struct(lit(0L).as("nc"), col("label").as("l"))).as("p"))
        .unionByName(cnt.select(col("id"),
          when(lit(false), col("label")).as("seed_label"),
          when(lit(false), col("label")).as("label"),
          struct((-col("c")).as("nc"), col("label").as("l")).as("p")))
        .groupBy(col("id"))
        .agg(max(col("seed_label")).as("seed_label"),
          max(col("label")).as("__old"),
          min(col("p")).as("p"))
        .select(col("id"), col("seed_label"),
          when(col("seed_label").isNotNull, col("seed_label"))
            .otherwise(coalesce(col("p.l"), col("__old")))
            .as("label")))
      // release the superseded round pin (r21 loop-storage discipline)
      org.apache.spark.sql.GraftColumnBridge.releasePin(lab)
      lab = next
      round += 1
    }
    lab.select(col("id"), col("label"))
  }

  /** K-CORE (fixed k): the maximal subgraph in which EVERY node keeps
    * degree >= k — the standard graph-density gate (Seidman 1983):
    * spam/bot rings and tight co-purchase communities live in deep
    * cores; pendant chains and one-off links peel away. Computed by
    * the classic cascade: drop all nodes under degree k, recompute
    * degrees (survivors may have lost neighbors), repeat to fixpoint.
    * The result is UNIQUE (the k-core is well-defined independent of
    * peel order), so the operator is deterministic by construction —
    * no tie-breaks, pure integer degree counting.
    *
    * Scale shape: each round is ONE degree aggregate (map-side
    * partials over the edge list) + TWO left-anti joins pruning the
    * edge list against the REMOVED set — pruning by the removed side,
    * not the keep side, is the load-bearing choice: after the first
    * round only the cascade frontier drops out, so the join's build
    * side is a handful of node ids (AQE broadcasts it) instead of the
    * nearly-whole-graph keep set; the edge list shrinks MONOTONICALLY,
    * so every round costs at most the first. Convergence = an empty
    * removed set (one count on the frontier, nothing edge-sized), and
    * the converged round skips the pruning join entirely. Per-round
    * [[org.apache.spark.sql.Dataset!.localCheckpoint(eager:Boolean):org.apache.spark.sql.Dataset[T]* localCheckpoint]]
    * (or reliable checkpoint via `checkpointDir`) truncates lineage —
    * the pageRankFixed discipline; rounds are bounded in practice by
    * the graph's degeneracy cascade depth, with a LOUD `maxIters`
    * refusal rather than a silent wrong answer.
    *
    * Input is an undirected edge list in any form — duplicates, both
    * orientations, and self-loops are cleaned to one canonical
    * `a < b` edge each (the [[triangleStats]] contract). Returns
    * `(v, core_deg)`: the surviving nodes with their degree INSIDE
    * the core (all >= k); an empty frame when the whole graph peels
    * away. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxIters: Int = 100, checkpointDir: Option[String] = None,
      roundsOut: Option[scala.collection.mutable.Buffer[Int]] = None)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def pin(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint()
      else org.apache.spark.sql.GraftColumnBridge.localCheckpointBounded(df)
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    var e = pin(edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b")).distinct())
    // The degree frame rides across rounds (optimization r20): ONE
    // 1-row min aggregate over it is simultaneously the progress test
    // (min < k ⇒ something peels), the emptiness test (NULL ⇒ no
    // edges), and — since the frontier filter reads the same pinned
    // frame — the per-round frontier needs no pin and no count job of
    // its own. Peel sets are byte-identical to the pin-per-frontier
    // loop; only the job count per round drops (measured 53 → ~33
    // driver jobs at sf0.1, wall bound by job latency not data).
    var dg = pin(degrees(e))
    var round = 0
    var converged = false
    while (!converged) {
      val m = dg.agg(min(col("deg"))).head()
      if (m.isNullAt(0) || m.getLong(0) >= k) converged = true
      else {
        if (round >= maxIters)
          throw new IllegalStateException(s"kCore: no fixpoint after " +
            s"$maxIters peel rounds — raise maxIters")
        val removed = dg.where(col("deg") < k).select(col("v"))
        val e2 = pin(e
          .join(removed.select(col("v").as("a")), Seq("a"), "left_anti")
          .join(removed.select(col("v").as("b")), Seq("b"), "left_anti"))
        val dg2 = pin(degrees(e2))
        // both successors materialized — release the superseded round's
        // pins (r21 loop-storage discipline: O(1) frames, not O(rounds))
        org.apache.spark.sql.GraftColumnBridge.releasePin(e)
        org.apache.spark.sql.GraftColumnBridge.releasePin(dg)
        e = e2
        dg = dg2
        round += 1
      }
    }
    // observed pruning-round count — lets callers (the oracle
    // generator) derive an unroll depth from THIS run instead of a
    // hand pin that rots at a new scale factor
    roundsOut.foreach(_ += round)
    dg.select(col("v"), col("deg").as("core_deg"))
  }

  /** FULL CORENESS DECOMPOSITION — every vertex's core NUMBER
    * (max k with v in the k-core; Seidman 1983, phase order after
    * Batagelj–Zaveršnik 2003): [[kCore]] answers one fixed k, but
    * curation gates RANK nodes by coreness ("keep the 100k densest
    * community members"), which needs the whole decomposition.
    *
    * Phase structure (the distributed form of the B-Z bucket walk):
    * while edges remain, read the current min degree `d` — the whole
    * remaining graph then has min degree d, so it sits inside the
    * d-core and EVERY remaining vertex has coreness >= d; credit all
    * of them with d, then peel the (d+1)-threshold cascade to its
    * fixpoint and repeat. A vertex removed in that cascade is never
    * credited again, so its final max-credit is exactly its core
    * number. Phases therefore jump straight between DISTINCT coreness
    * values (no empty-threshold spinning), and total peel work barely
    * exceeds one full [[kCore]] cascade — the edge list only ever
    * shrinks, across phases too. Deterministic by the same argument as
    * kCore (the decomposition is unique; pure integer degree counts).
    *
    * Scale shape per round: ONE degree aggregate (map-side partials)
    * + two left-anti edge prunes keyed by the SMALL removed frontier
    * (the kCore discipline); the per-phase min degree is a 1-row agg
    * on the node-sized degree frame. Credits accumulate node-sized
    * rows per phase and fold with ONE final max groupBy. Per-round
    * pins truncate lineage; LOUD `maxIters` refusal across all phases.
    *
    * Same input contract as [[kCore]] (any undirected edge soup;
    * cleaned to canonical a<b edges); isolated vertices never enter
    * the edge list, so the output domain is the edge endpoints.
    * Returns `(v, coreness)`, coreness >= 1. */
  def coreness(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 1000, checkpointDir: Option[String] = None,
      phaseRoundsOut: Option[scala.collection.mutable.Buffer[Int]] = None)
      : DataFrame = {
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def pin(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint()
      else org.apache.spark.sql.GraftColumnBridge.localCheckpointBounded(df)
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    var e = pin(edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b")).distinct())
    // Unified phase/cascade loop (optimization r20): the degree frame
    // rides across rounds AND phases, and ONE 1-row min aggregate per
    // round is simultaneously the phase detector (min > d ⇒ the
    // (d+1)-cascade stabilized ⇒ jump, credit survivors), the progress
    // test (min <= d ⇒ keep peeling), and the termination test (NULL ⇒
    // no edges left). The per-phase pinned dg0, the per-round frontier
    // pin, its isEmpty job, and the outer e.isEmpty job all collapse
    // into that aggregate — the credit/peel SEQUENCE (and so the
    // decomposition, the per-phase removal-round counts, and the
    // oracle's unroll budgets) is byte-identical to the two-loop form;
    // only the driver job count drops (261 → ~150 at sf0.1, where the
    // loop is bound by job latency, not data).
    var dg = pin(degrees(e))
    var acc: Option[DataFrame] = None
    var rounds = 0
    var d = Long.MinValue
    var phaseRemovals = 0
    var anyPhase = false
    var done = false
    while (!done) {
      val m = dg.agg(min(col("deg"))).head()
      if (m.isNullAt(0)) done = true
      else {
        val dmin = m.getLong(0)
        if (dmin > d) {
          // phase jump: the previous phase's cascade just stabilized
          // (or this is the first phase) — record it, credit survivors
          if (anyPhase) phaseRoundsOut.foreach(_ += phaseRemovals)
          phaseRemovals = 0
          d = dmin
          anyPhase = true
          // every vertex still standing is in the d-core: credit d now;
          // whoever survives the coming cascade gets a higher credit
          val credit = dg.select(col("v"), lit(d).as("coreness"))
          val accNext = acc.map(o => pin(o.unionAll(credit)))
            .getOrElse(pin(credit))
          // the old accumulator is folded into the new pin — release it
          acc.foreach(org.apache.spark.sql.GraftColumnBridge.releasePin)
          acc = Some(accNext)
        }
        if (rounds >= maxIters)
          throw new IllegalStateException(s"coreness: no fixpoint after " +
            s"$maxIters total peel rounds — raise maxIters")
        // nonempty by construction: the argmin vertex has deg <= d
        val removed = dg.where(col("deg") <= d).select(col("v"))
        val e2 = pin(e
          .join(removed.select(col("v").as("a")), Seq("a"), "left_anti")
          .join(removed.select(col("v").as("b")), Seq("b"), "left_anti"))
        val dg2 = pin(degrees(e2))
        // release the superseded round's pins (r21 loop-storage
        // discipline); the credit accumulator handles its own handoff
        org.apache.spark.sql.GraftColumnBridge.releasePin(e)
        org.apache.spark.sql.GraftColumnBridge.releasePin(dg)
        e = e2
        dg = dg2
        phaseRemovals += 1
        rounds += 1
      }
    }
    // observed removal rounds for the final phase — the oracle
    // generator derives its per-phase unroll budgets from these
    if (anyPhase) phaseRoundsOut.foreach(_ += phaseRemovals)
    acc.map(_.groupBy(col("v")).agg(max(col("coreness")).as("coreness")))
      .getOrElse(dg.select(col("v"), col("deg").as("coreness"))
        .limit(0))
  }

  /** CORENESS-GATED CURATION — the use [[coreness]]'s scaladoc names
    * ("keep the N densest community members"), wired as an actual
    * gate: rank the graph's nodes by `(coreness DESC, node ASC)` (the
    * decomposition is unique and the tie order total, so the cut is
    * deterministic), keep the top `topN`, and return the rows of
    * `items` whose `itemCol` survives, with their coreness attached.
    * Items that never appear in the edge list have no coreness and
    * are dropped — density gating is an allowlist, the curation-band
    * convention ([[Dedup.curateCorpus]]'s quality gate drops unscored
    * rows the same way).
    *
    * Scale shape: [[coreness]]'s own phase walk, then ONE
    * TakeOrderedAndProject over the node-sized coreness frame
    * (per-partition top-N, no global sort) and one BROADCAST join of
    * the topN-row cut against `items` — the item table itself never
    * shuffles. */
  def corenessGate(items: DataFrame, itemCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, topN: Int, maxIters: Int = 1000,
      checkpointDir: Option[String] = None,
      phaseRoundsOut: Option[scala.collection.mutable.Buffer[Int]] = None)
      : DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val cut = coreness(edges, srcCol, dstCol, maxIters, checkpointDir,
        phaseRoundsOut)
      .orderBy(desc("coreness"), asc("v"))
      .limit(topN)
    items.join(broadcast(cut), items(itemCol) === cut("v"))
      .drop("v")
  }

  /** K-TRUSS (fixed k, Cohen 2008): the maximal subgraph in which
    * EVERY edge closes at least k-2 triangles — the EDGE-density
    * refinement of [[kCore]] (a k-core can be a sparse hub star; a
    * k-truss is built from overlapping triangles, the signature of a
    * genuine community / collusion ring / near-dup family). Classic
    * cascade: count each edge's triangle support, drop edges under
    * k-2, recount (surviving edges lose triangles), repeat to
    * fixpoint. The k-truss is UNIQUE regardless of peel order —
    * deterministic, pure integer counting, no tie-breaks.
    *
    * Scale shape (r21 — SUPPORT-DECREMENT peel, the standard truss
    * decomposition): triangles are enumerated ONCE, via the shared
    * [[orientedTriangles]] degree-ordered core — O(m^1.5) wedge work
    * bounded by arboricity, never Σdeg² — into an initial per-edge
    * support table. Each peel round then takes the cheaper of two
    * EXACT-EQUIVALENT bodies, chosen by the peel fraction read off
    * the same 1-row aggregate that tests termination: a MASS round
    * (> 1/8 of edges leave — the typical opening cascade) recounts
    * the small survivor set with a fresh oriented enumeration, while
    * a TAIL round touches only the DELTA — re-enumerate just the
    * triangles that contain a peeled edge (a wedge probe of the
    * removed edges against the current adjacency, closed over the
    * current edge set, deduped by sorted vertex triple) and decrement
    * the support of their SURVIVING edges, work proportional to the
    * peeled edges' triangle neighborhoods, not O(m^1.5). The
    * confirming round is now one 1-row aggregate (no enumeration at
    * all). The maintained support is exactly
    * the from-scratch recount by the identity `support(e, E∖R) =
    * support(e, E) − #{triangles through e with an edge in R}`, so
    * the peel sequence, round count, and fixpoint supports are
    * byte-identical to the re-enumerating loop (GraphSpec pins the
    * K4 cascade; the oracle recomputes the unrolled rounds
    * independently). Convergence = one 1-row min(support) aggregate
    * (min >= k-2 ⟺ nothing peels — the kCore discipline). Per-round
    * pins truncate lineage and superseded pins are released; LOUD
    * `maxIters` refusal. Returns `(a, b, support)` — the surviving
    * canonical edges with their FIXPOINT support (all >= k-2). */
  def kTruss(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxIters: Int = 100, checkpointDir: Option[String] = None,
      roundsOut: Option[scala.collection.mutable.Buffer[Int]] = None)
      : DataFrame = {
    require(k >= 3, s"k must be >= 3 (k-2 triangles per edge), got $k")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def pin(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint()
      else org.apache.spark.sql.GraftColumnBridge.localCheckpointBounded(df)
    val km2 = (k - 2).toLong
    val e0 = pin(edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b")).distinct())
    // Initial support: the ONE full triangle enumeration of the run
    // (r21 — the peel rounds below maintain it by decrement).
    // deg is cached (not pinned): consumed by both ek degree joins
    // inside orientedTriangles; released once cur is pinned.
    val deg = e0.select(col("a").as("v")).unionAll(e0.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg")).cache()
    val (tri, fHandle) = orientedTriangles(e0, deg,
      shuffleHashClose = false)
    // each triangle feeds support to its three canonical edges
    val sup0 = tri.select(explode(array(
        struct(least(col("u"), col("v1")).as("a"),
          greatest(col("u"), col("v1")).as("b")),
        struct(least(col("u"), col("v2")).as("a"),
          greatest(col("u"), col("v2")).as("b")),
        struct(least(col("v1"), col("v2")).as("a"),
          greatest(col("v1"), col("v2")).as("b")))).as("t"))
      .select(col("t.a").as("a"), col("t.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))
    // cur = every surviving edge with its CURRENT support (0 included:
    // triangle-free edges must exist in the frame to be peeled)
    var cur = pin(e0.join(sup0, Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        coalesce(col("support"), lit(0L)).as("support")))
    fHandle.unpersist(blocking = false)
    deg.unpersist(blocking = false)
    org.apache.spark.sql.GraftColumnBridge.releasePin(e0)
    var round = 0
    var converged = false
    while (!converged) {
      if (round >= maxIters)
        throw new IllegalStateException(s"kTruss: no fixpoint after " +
          s"$maxIters peel rounds — raise maxIters")
      // ONE 1-row aggregate is progress + termination test (the kCore
      // discipline): min >= k-2 (or no edges) ⟺ nothing peels. The
      // same row carries |edges| and |peeling| for the hybrid choice.
      val mn = cur.agg(min(col("support")), count(lit(1)),
        sum(when(col("support") < km2, 1L).otherwise(0L))).head()
      if (mn.isNullAt(0) || mn.getLong(0) >= km2) {
        converged = true
        round += 1 // the confirming no-change round, as before
      } else if (mn.getLong(2) * 8L > mn.getLong(1)) {
        // MASS PEEL (> 1/8 of the edges leave this round — the typical
        // opening round): enumerating the triangles that TOUCH the
        // removed set would cost more than a fresh degree-oriented
        // enumeration of the small survivor set, so recount — which is
        // the support DEFINITION on the surviving edges, so the
        // maintained frame stays exact by construction. The threshold
        // is a constant fraction (scale-free, not tuned to this rig);
        // either branch computes the identical support table.
        val sv = pin(cur.where(col("support") >= km2)
          .select(col("a"), col("b")))
        val dg = sv.select(col("a").as("v"))
          .unionAll(sv.select(col("b").as("v")))
          .groupBy(col("v")).agg(count(lit(1)).as("deg")).cache()
        val (tri2, fh2) = orientedTriangles(sv, dg,
          shuffleHashClose = false)
        val sup2 = tri2.select(explode(array(
            struct(least(col("u"), col("v1")).as("a"),
              greatest(col("u"), col("v1")).as("b")),
            struct(least(col("u"), col("v2")).as("a"),
              greatest(col("u"), col("v2")).as("b")),
            struct(least(col("v1"), col("v2")).as("a"),
              greatest(col("v1"), col("v2")).as("b")))).as("t"))
          .select(col("t.a").as("a"), col("t.b").as("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))
        val next = pin(sv.join(sup2, Seq("a", "b"), "left")
          .select(col("a"), col("b"),
            coalesce(col("support"), lit(0L)).as("support")))
        fh2.unpersist(blocking = false)
        dg.unpersist(blocking = false)
        org.apache.spark.sql.GraftColumnBridge.releasePin(sv)
        org.apache.spark.sql.GraftColumnBridge.releasePin(cur)
        cur = next
        round += 1
      } else {
        val removed = cur.where(col("support") < km2)
          .select(col("a"), col("b"))
        // Triangles of the CURRENT edge set that contain >= 1 removed
        // edge: wedge-probe each removed edge (a, b) for a common
        // neighbor c — c adjacent to a via the adjacency expansion,
        // (b, c) closed over the canonical edge list — then dedupe by
        // sorted vertex triple (a triangle with 2-3 removed edges is
        // reached via each of them, but dies once).
        val und = cur.select(col("a").as("u"), col("b").as("w"))
          .unionAll(cur.select(col("b").as("u"), col("a").as("w")))
        val destroyed = removed.join(und, col("a") === col("u"))
          .where(col("w") =!= col("b"))
          .join(cur.select(col("a").as("x"), col("b").as("y")),
            least(col("b"), col("w")) === col("x") &&
              greatest(col("b"), col("w")) === col("y"), "left_semi")
          .select(array_sort(array(col("a"), col("b"), col("w"))).as("t"))
          .select(element_at(col("t"), 1).as("t1"),
            element_at(col("t"), 2).as("t2"),
            element_at(col("t"), 3).as("t3"))
          .distinct()
        // every SURVIVING edge of a destroyed triangle loses one
        // triangle of support — exactly the from-scratch recount:
        // support(e, E∖R) = support(e, E) − #destroyed triangles on e
        val dec = destroyed.select(explode(array(
            struct(col("t1").as("a"), col("t2").as("b")),
            struct(col("t1").as("a"), col("t3").as("b")),
            struct(col("t2").as("a"), col("t3").as("b")))).as("d"))
          .select(col("d.a").as("a"), col("d.b").as("b"))
          .join(removed, Seq("a", "b"), "left_anti")
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("__dec"))
        val next = pin(cur.where(col("support") >= km2)
          .join(dec, Seq("a", "b"), "left")
          .select(col("a"), col("b"),
            (col("support") - coalesce(col("__dec"), lit(0L)))
              .as("support")))
        // release the superseded round pin (r21 loop-storage discipline)
        org.apache.spark.sql.GraftColumnBridge.releasePin(cur)
        cur = next
        round += 1
      }
    }
    // observed iteration count (incl. the confirming no-change round)
    // — the oracle generator derives its unroll depth from THIS run
    roundsOut.foreach(_ += round)
    // at the fixpoint the maintained support IS the from-scratch
    // support of the surviving edge set (the decrement identity above)
    cur
  }

  /** TRIANGLE COUNT + LOCAL CLUSTERING COEFFICIENT — the community-
    * structure microscope: how many of a node's neighbor pairs are
    * themselves connected (`lcc = 2·T(v) / (deg(v)·(deg(v)−1))`).
    * High-lcc nodes sit inside cliques (tight communities, near-dup
    * families, bot rings buying identical baskets); lcc ~ 0 at high
    * degree marks a pure hub. Input is an UNDIRECTED edge list in any
    * form — duplicates, self-loops, and both orientations are cleaned
    * to one canonical `a < b` edge each.
    *
    * Scale shape — degree-ordered orientation, the standard trick that
    * makes distributed triangle counting tractable: every canonical
    * edge is directed from its lower-(degree, id) endpoint to the
    * higher, so each node's OUT-list is bounded by O(sqrt(m)) on any
    * graph (arboricity bound) and the wedge self-join does
    * O(m^1.5) work total instead of Σ deg² — a popular hub generates
    * NO wedges from its own huge neighbor list because nearly all its
    * edges point INTO it. Each triangle appears exactly once (its
    * lowest-ranked vertex owns it). Three slim exchanges: wedge
    * self-join on the oriented source, closing-edge join on the
    * (v1, v2) pair, one count per node. Everything is exact integer
    * counting; lcc is ONE IEEE division of two exactly-representable
    * longs — bit-replayable. Rank comparisons spell the (deg, id)
    * lexicographic order as FLAT long compares (`da < db OR (da = db
    * AND a < b)` — codegen'd, zero-allocation; the struct-compare
    * phrasing they replaced built two row objects per candidate pair),
    * so 64-bit ids need no packing. Returns (v, deg, n_tri, lcc);
    * deg < 2 keeps NULL lcc
    * (undefined, not 0 — a pendant node has no neighbor pair to
    * close). Isolated nodes don't appear (no edges, no row). */
  /** Degree-ordered oriented triangle enumeration over canonical
    * `(a, b)` edges with their degree table — the O(m^1.5) wedge +
    * closing-edge core shared by [[triangleStats]] (per-NODE counts)
    * and [[kTruss]] (per-EDGE support, re-enumerated each peel round).
    * Returns one `(u, v1, v2)` row per triangle, owned by its
    * lowest-(deg, id) vertex. */
  private def orientedTriangles(e: DataFrame, deg: DataFrame,
      shuffleHashClose: Boolean = true): (DataFrame, DataFrame) = {
    val ek = e
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    // (deg, id) lexicographic rank spelled as flat long comparisons:
    // `struct(..) < struct(..)` builds + interpretively compares two
    // row objects PER EVALUATION — on the wedge join below that
    // predicate runs once per candidate pair (Σ outdeg² ≈ 9e7 on the
    // sf0.1 co-purchase graph) and measured as the dominant stage
    // (345 core-seconds); the flat form is whole-stage-codegen'd
    // long compares with zero allocation and identical ordering.
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // f is consumed THREE times (both wedge sides + the closing-edge
    // probe); Catalyst re-executes a shared subtree per reference, so
    // an unpinned f re-runs the whole edge derivation (for
    // [[triangleStats]] that includes the source scan) three times —
    // the dominant cost of the un-pinned plan, measured 30 source
    // scans / 1167 core-seconds on the sf0.1 co-purchase graph where
    // the pinned plan does one. Cached, not checkpointed: lazy, so the
    // first executing consumer materializes it in-query. Loop callers
    // ([[kTruss]]) must unpersist the returned handle per round.
    val f = ek.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("w"),
      when(aFirst, col("db")).otherwise(col("da")).as("dw")).cache()
    // same flat spelling of (dw, w) rank (allocation-free, codegen'd)
    val wedges = f.as("x").join(f.as("y"),
        col("x.u") === col("y.u") &&
          (col("x.dw") < col("y.dw") ||
            (col("x.dw") === col("y.dw") && col("x.w") < col("y.w"))))
      .select(col("x.u").as("u"), col("x.w").as("v1"), col("y.w").as("v2"))
    // Closing-edge probe: wedge side is O(m^1.5) rows, the edge side m —
    // for ONE-SHOT counts on a big graph, build the hash table on the
    // edge side instead of sort-merging the wedge flood (guide §3.1;
    // the SMJ sorted 4.1e7 wedge rows on the sf0.1 co-purchase graph).
    // LOOP callers (kTruss) pass shuffleHashClose=false: their edge
    // set shrinks round over round, the planner's broadcast choice
    // wins at the tail, and the forced shuffle measured 2x slower on
    // small graphs.
    val close = f.select(col("u").as("v1"), col("w").as("v2"))
    (wedges.join(
        if (shuffleHashClose) close.hint("shuffle_hash") else close,
        Seq("v1", "v2"))
      .select(col("u"), col("v1"), col("v2")), f)
  }

  def triangleStats(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    // e feeds the degree count twice (unionAll legs) and the oriented
    // edge frame; deg feeds both ek degree joins and the final stats
    // join. Both are re-executed per reference when left lazy (the
    // edge derivation can be an expensive upstream join) — pin them
    // in-query (same rationale as the f pin in orientedTriangles).
    val e = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b")).distinct().cache()
    val deg = e.select(col("a").as("v"))
      .unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg")).cache()
    val (tri, _) = orientedTriangles(e, deg)
    val tc = tri
      .select(explode(array(col("u"), col("v1"), col("v2"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("n_tri"))
    deg.join(tc, Seq("v"), "left")
      .select(col("v"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") >= 2,
          (lit(2L) * coalesce(col("n_tri"), lit(0L))).cast(DoubleType) /
            (col("deg") * (col("deg") - lit(1L))).cast(DoubleType))
          .as("lcc"))
  }

  /** LINK PREDICTION by neighborhood overlap (Liben-Nowell & Kleinberg
    * 2003): score every NON-adjacent vertex pair that shares at least
    * one common neighbor, by three classic indices —
    * common-neighbor count `cn`, the resource-allocation index
    * Σ_{u∈Γ(a)∩Γ(b)} 1/deg(u) (Zhou/Lü/Zhang 2009; Adamic-Adar's
    * 1/log(deg) sibling, chosen because 1/deg is computable in EXACT
    * integer fixed-point — `ra_fp = Σ 2^40 div deg(u)` — where a log
    * would drag in libm bit-divergence between engines), and Jaccard
    * `jac_fp = cn·2^20 div (deg(a)+deg(b)-cn)`. All-integer, so the
    * scores and the (ra_fp desc, a, b) top-k order are bit-replayable.
    *
    * Scale shape: ONE wedge self-join on the neighbor list — Σ_u
    * C(deg(u), 2) pairs, the same frontier as an unoriented triangle
    * count. That sum is hub-dominated, so `maxThruDeg` (part of the
    * SEMANTICS, replayed by the oracle) drops vertices above the cap
    * from the common-neighbor role: a hub shared by half the graph
    * contributes ~nothing to RA (1/deg ≈ 0) yet quadratic wedge work.
    * After the wedge aggregate the frame is one bounded
    * (pair → 3 scores) map-side-partial count, one anti-join against
    * the edge list to keep non-edges, and a TakeOrderedAndProject
    * top-k — no global sort. Returns the top `k` predicted links
    * `(a, b, cn, ra_fp, jac_fp, deg_a, deg_b)`. */
  def linkPrediction(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, maxThruDeg: Long = Long.MaxValue): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxThruDeg >= 2, s"maxThruDeg must be >= 2, got $maxThruDeg")
    // e is consumed 5 times (degree legs, both neighbor-list legs, the
    // non-edge anti-join), deg 3 times, n twice (wedge self-join) —
    // pinned in-query or Catalyst re-executes the whole edge
    // derivation per reference (orientedTriangles' f rationale).
    val e = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b")).distinct().cache()
    val deg = e.select(col("a").as("v"))
      .unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg")).cache()
    // Both directions, with the THROUGH vertex's degree attached and
    // hubs above the cap removed from the through role only (they keep
    // their endpoint role: deg_a/deg_b still count them).
    val n = e.select(col("a").as("u"), col("b").as("w"))
      .unionAll(e.select(col("b").as("u"), col("a").as("w")))
      .join(deg.select(col("v").as("u"), col("deg").as("du")), "u")
      .where(col("du") <= maxThruDeg)
      // Per-through-vertex RA term, integer div (NOT `/`, which is a
      // double divide in Spark) so the wedge sum is an exact Long sum.
      .withColumn("rau", expr("1099511627776 div du"))
      .cache()
    val pairs = n.as("x").join(n.as("y"),
        col("x.u") === col("y.u") && col("x.w") < col("y.w"))
      .groupBy(col("x.w").as("a"), col("y.w").as("b"))
      .agg(count(lit(1)).as("cn"), sum(col("x.rau")).as("ra_fp"))
    pairs
      .join(e, Seq("a", "b"), "left_anti")
      .join(deg.select(col("v").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("deg_b")), "b")
      .select(col("a"), col("b"), col("cn"), col("ra_fp"),
        expr("cn * 1048576 div (deg_a + deg_b - cn)").as("jac_fp"),
        col("deg_a"), col("deg_b"))
      .orderBy(col("ra_fp").desc, col("a"), col("b"))
      .limit(k)
  }

  /** MULTI-SOURCE WEIGHTED SHORTEST PATHS (Bellman-Ford relaxation
    * rounds to fixpoint): the distance of every reachable vertex to
    * its NEAREST seed — one run answers "how far is each part from
    * the strategic set", the multi-source form being the standard
    * trick (init every seed at 0; a single-source run is the 1-seed
    * special case). Undirected; `weightCol` must be a POSITIVE
    * INTEGER cost per canonical edge (duplicate edges keep their MIN
    * cost). Min-plus relaxation is order-free and all-integer, so the
    * fixpoint is deterministic with zero tie-breaks and the oracle
    * replays it as unrolled rounds.
    *
    * Scale shape: per round ONE join of the (both-directions) edge
    * list against the current distance frame + one min-aggregate with
    * map-side partials — the frontier math a giant graph wants; rounds
    * are bounded by the weighted graph's hop diameter; convergence =
    * zero improved vertices (a slim count, nothing edge-sized);
    * per-round pins truncate lineage; LOUD `maxIters` refusal.
    * Returns `(v, dist)` for reachable vertices only. */
  def multiSourceShortestPaths(edges: DataFrame, srcCol: String,
      dstCol: String, weightCol: String, seeds: Seq[Long],
      maxIters: Int = 50, checkpointDir: Option[String] = None,
      roundsOut: Option[scala.collection.mutable.Buffer[Int]] = None)
      : DataFrame = {
    require(seeds.nonEmpty, "seeds must be non-empty")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def pin(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint()
      else org.apache.spark.sql.GraftColumnBridge.localCheckpointBounded(df)
    val e = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"),
        col(weightCol).cast(LongType).as("wt"))
      .where(col("a") =!= col("b") && col("wt").isNotNull)
      .groupBy(col("a"), col("b")).agg(min(col("wt")).as("wt"))
      .select(col("a"), col("b"),
        when(col("wt") < 1L,
          raise_error(lit("multiSourceShortestPaths: edge weights must " +
            "be positive integers — a non-positive cost breaks the " +
            "relaxation bound"))).otherwise(col("wt")).as("wt"))
    val n = pin(e.select(col("a").as("u"), col("b").as("v"), col("wt"))
      .unionAll(e.select(col("b").as("u"), col("a").as("v"), col("wt"))))
    val spark = edges.sparkSession
    var dist = pin(spark.createDataFrame(
      spark.sparkContext.parallelize(seeds.distinct.map(org.apache.spark.sql.Row(_, 0L))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("dist", LongType, nullable = false)))))
    var round = 0
    var converged = false
    // initial signature: the seed frame has |seeds| rows, all dist 0
    var prevSig: (Long, java.math.BigDecimal) =
      (seeds.distinct.size.toLong, java.math.BigDecimal.ZERO)
    while (!converged) {
      if (round >= maxIters)
        throw new IllegalStateException("multiSourceShortestPaths: no " +
          s"fixpoint after $maxIters relaxation rounds — raise maxIters")
      val relaxed = n.join(dist.select(col("v").as("u"), col("dist")), "u")
        .select(col("v"), (col("dist") + col("wt")).as("dist"))
      val next = pin(dist.unionAll(relaxed)
        .groupBy(col("v")).agg(min(col("dist")).as("dist")))
      // Fixpoint by (reached-count, exact dist-sum): per node the
      // distance only DECREASES and the reached set only GROWS, so
      // equal count AND equal sum ⟺ no relaxation improved anything —
      // the same condition the old per-round join+count checked, as
      // one 1-row aggregate with no broadcast join (the loop is
      // driver-job-latency-bound at bench scale).
      val fp = next.agg(count(lit(1)),
        sum(col("dist").cast(DecimalType(38, 0)))).head()
      val sig = (fp.getLong(0), fp.getDecimal(1))
      if (sig._1 == prevSig._1 && sig._2.compareTo(prevSig._2) == 0) {
        converged = true
        // the confirming round's pin duplicates dist — release it
        org.apache.spark.sql.GraftColumnBridge.releasePin(next)
      } else {
        prevSig = sig
        // release the superseded round pin (r21 loop-storage discipline)
        org.apache.spark.sql.GraftColumnBridge.releasePin(dist)
        dist = next
        round += 1
      }
    }
    // observed improving-round count — the oracle generator derives
    // its relaxation unroll depth from THIS run
    roundsOut.foreach(_ += round)
    dist
  }

  /** NEWMAN MODULARITY of a given vertex partition (Newman & Girvan
    * 2004): Q = Σ_c [ m_c/m − (d_c/2m)² ] where m_c = intra-community
    * edges, d_c = total degree of community c, m = edges. Computed as
    * ONE exact integer numerator Σ_c (4·m·m_c − d_c²) over the exact
    * denominator 4m², finished by a single correctly-rounded IEEE
    * division — deterministic with no float accumulation order
    * dependence. Guards the Long bound loudly (|num| ≤ 4m² needs
    * m ≤ ~1.5e9; beyond that route through DECIMAL).
    *
    * The partition is EXTERNAL (a label-prop result, a metadata
    * attribute like brand/category): modularity answers "is the graph
    * assortative under this labeling?" — Q ≈ 0 means the labeling
    * explains nothing beyond chance. Vertices missing from
    * `communities` are dropped (inner join); edges with either
    * endpoint unlabeled don't count toward m. One row:
    * `(n_comm, m, q_num, q_den, modularity)`.
    *
    * Scale shape: two broadcast-or-shuffle joins of the edge list
    * against the (vertex → community) frame, then two map-side-partial
    * aggregates over at most |communities| rows and a 1-row final
    * combine. No per-community state beyond two longs. */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
      communities: DataFrame, vCol: String, commCol: String): DataFrame = {
    val e0 = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val cm = communities.select(col(vCol).as("v"), col(commCol).as("comm"))
      .distinct()
    val e = e0
      .join(cm.select(col("v").as("a"), col("comm").as("comm_a")), "a")
      .join(cm.select(col("v").as("b"), col("comm").as("comm_b")), "b")
      // consumed by both unionAll legs below — pinned in-query so the
      // labeled-edge derivation (source join + distinct) runs once
      .cache()
    // Per-community degree (each labeled edge endpoint counts once) and
    // intra-community edge count, folded in one pass. The intra flag
    // rides the comm_a leg only so an intra edge counts once.
    val byComm = e.select(col("comm_a").as("comm"),
          when(col("comm_a") === col("comm_b"), 1L).otherwise(0L).as("i"))
      .unionAll(e.select(col("comm_b").as("comm"), lit(0L).as("i")))
      .groupBy(col("comm"))
      .agg(count(lit(1)).as("d_c"), sum(col("i")).as("m_c"))
    // Σd_c = 2m, so 4·m·Σm_c = 2·Σd_c·Σm_c and 4m² = (Σd_c)².
    byComm
      .agg(count(lit(1)).as("n_comm"), sum(col("d_c")).as("sum_dc"),
        sum(col("m_c")).as("sum_mc"),
        sum(col("d_c") * col("d_c")).as("sum_dc2"))
      .select(col("n_comm"), expr("sum_dc div 2").as("m"),
        when(col("sum_dc") > lit(3000000000L),
          raise_error(lit("modularity: graph exceeds the Long exactness " +
            "bound (m > 1.5e9 edges) — route the numerator through " +
            "DECIMAL before trusting Q")))
          .otherwise(lit(2L) * col("sum_dc") * col("sum_mc") -
            col("sum_dc2")).as("q_num"),
        (col("sum_dc") * col("sum_dc")).as("q_den"))
      .withColumn("modularity",
        col("q_num").cast(DoubleType) / col("q_den").cast(DoubleType))
  }
}
