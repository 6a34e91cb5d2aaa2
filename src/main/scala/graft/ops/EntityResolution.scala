package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (entity resolution): find records whose NAMES
  * are within a small edit distance, without an all-pairs scan — the
  * classic blocking-key design (Fellegi–Sunter era): records are
  * grouped by a cheap deterministic key (a field, a phonetic code, a
  * name token), and the quadratic comparison runs only WITHIN blocks.
  *
  * The training-data version of this is canonicalizing near-identical
  * titles/authors/product names before dedup: exact dedup misses
  * "red widgets" vs "red widget", MinHash shingles are too coarse for
  * 6-character strings — bounded edit distance on a blocked pair scan
  * is the right tool at this granularity.
  */
object EntityResolution {

  /** `(id_a, id_b, dist)` for every same-block pair at Levenshtein
    * distance <= `maxDist` (id_a < id_b). The distance runs through
    * Spark's codegen'd 3-arg `levenshtein` with the threshold pushed
    * IN (it abandons a row as soon as the running distance exceeds
    * `maxDist` — O(maxDist * len) instead of O(len^2) per pair), after
    * a free |len(a)-len(b)| <= maxDist prune (length difference
    * lower-bounds edit distance, so the result set is unchanged).
    *
    * Scale shape — the low-cardinality-key self-join problem: a good
    * block key is a closed vocabulary / phonetic code, so joining on
    * `block` alone would put ALL quadratic work on #blocks tasks, and
    * AQE makes it worse (it sizes the join by its tiny INPUT bytes and
    * coalesces to one partition — it cannot see the output exploding;
    * measured 2x slower than even the 8-task plan at sf0.1). The fix
    * is the replicated-group pair decomposition: every row gets a
    * deterministic hash group in [0, groups); the left side is
    * replicated across all gj with its own group as gi, the right
    * across all gi with its own group as gj, and the join runs on
    * (block, gi, gj) — each ordered pair (a, b) meets in EXACTLY the
    * (grp_a, grp_b) cell, so block^2 work spreads over groups^2 cells
    * at a replication cost linear in `groups` on the slim (id, name)
    * frame. The exchanges carry an EXPLICIT partition count (AQE
    * respects user-numbered repartitions and won't re-coalesce), and
    * the distance runs inline in the join task — no post-join shuffle
    * of the pair stream. Work remains sum-over-blocks of block^2:
    * the caller still owes a bounded-occupancy key; compose with
    * [[SkewJoin]]-style capping if it can't. Pairs compose with
    * [[Dedup.nearDupClusters]] for transitive merge groups. */
  def fuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, maxDist: Int, groups: Int = 8): DataFrame = {
    require(groups >= 1, "groups must be >= 1")
    val base = df.select(blockKey.as("block"), col(idCol).as("id"),
      col(nameCol).as("name"))
      .withColumn("grp", pmod(
        graft.functions.LongHashes.splitmix64(col("id")),
        lit(groups.toLong)).cast("int"))
    val gs = array((0 until groups).map(lit): _*)
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val l = base.select(col("block"), col("grp").as("gi"),
        explode(gs).as("gj"), col("id").as("id_a"),
        col("name").as("name_a"))
      .repartition(parts, col("block"), col("gi"), col("gj"))
    val r = base.select(col("block"), explode(gs).as("gi"),
        col("grp").as("gj"), col("id").as("id_b"),
        col("name").as("name_b"))
      .repartition(parts, col("block"), col("gi"), col("gj"))
    l.join(r, Seq("block", "gi", "gj"))
      .where(col("id_a") < col("id_b"))
      .where(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist))
      .where(col("dist") >= 0) // 3-arg levenshtein yields -1 above maxDist
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Fellegi–Sunter PROBABILISTIC record linkage (Fellegi & Sunter
    * 1969) — the principled upgrade over single-field distance
    * thresholds: each compared field carries an m-probability
    * (P(fields agree | same entity)) and a u-probability
    * (P(agree | different entities)); a candidate pair's evidence is
    * the likelihood ratio R = prod over fields of m/u (agree) or
    * (1-m)/(1-u) (disagree), and the decision rule is the classic
    * two-threshold one: R >= `matchOdds` -> 'match',
    * R >= `possibleOdds` -> 'possible' (clerical review band), else
    * 'nonmatch'. A rare-field agreement (low u) thus outweighs three
    * common-field agreements — what a fixed agree-count cannot express.
    *
    * Replayability: the per-field ratios are computed ONCE here
    * (`m/u`, `(1-m)/(1-u)` in IEEE double) and multiplied in FIELD
    * DECLARATION ORDER as a left fold, so the score is one fixed
    * expression tree both engines evaluate bit-identically (no logs —
    * the textbook sums log-weights, but log2 is monotone: multiplying
    * raw odds IS the same ranking and decision set, exactly replayable
    * where libm is not; the standing log/pow ban). Field agreement is
    * null-safe equality (both-NULL agrees — document your nulls or
    * filter upstream).
    *
    * Scale shape: same blocked replicated-group pair decomposition as
    * [[fuzzyPairs]] (block^2 work spread over groups^2 explicit cells,
    * AQE-proof); the compare/score runs inline in the join task and
    * only pairs clearing `possibleOdds` leave it — the nonmatch mass
    * (virtually all pairs) dies before any further shuffle. Same
    * bounded-block-occupancy contract as fuzzyPairs. */
  def fsScorePairs(df: DataFrame, idCol: String, blockKey: Column,
      fields: Seq[(String, Double, Double)],
      matchOdds: Double, possibleOdds: Double,
      groups: Int = 8): DataFrame = {
    require(fields.nonEmpty, "fields must be non-empty")
    fields.foreach { case (f, m, u) =>
      require(u > 0 && m < 1 && u < m,
        s"field $f needs 0 < u < m < 1, got m=$m u=$u") }
    require(possibleOdds > 0 && possibleOdds <= matchOdds,
      s"need 0 < possibleOdds <= matchOdds, got $possibleOdds / $matchOdds")
    require(groups >= 1, "groups must be >= 1")
    val agree = fields.map { case (f, _, _) => col(s"a_$f") <=> col(s"b_$f") }
    val score = fields.zip(agree).foldLeft(lit(1.0)) {
      case (acc, ((_, m, u), a)) =>
        acc * when(a, lit(m / u)).otherwise(lit((1 - m) / (1 - u)))
    }
    val nAgree = agree.map(a => when(a, 1L).otherwise(0L))
      .reduce(_ + _)
    blockedFieldPairs(df, idCol, blockKey, fields.map(_._1), groups)
      .select(col("id_a"), col("id_b"), nAgree.as("n_agree"),
        score.as("score"),
        when(score >= matchOdds, "match")
          .when(score >= possibleOdds, "possible")
          .as("decision"))
      .where(col("decision").isNotNull)
  }

  /** Same-block candidate pairs carrying both sides' compare fields —
    * the replicated-group skew decomposition shared by [[fsScorePairs]]
    * and [[fsEmWeights]] (see [[fuzzyPairs]] for why joining on the
    * block alone melts down): `(id_a, id_b, a_<f>…, b_<f>…)` with
    * `id_a < id_b`, each unordered pair exactly once (it meets only in
    * its (grp_a, grp_b) cell). */
  private def blockedFieldPairs(df: DataFrame, idCol: String,
      blockKey: Column, fcols: Seq[String], groups: Int): DataFrame = {
    val base = df.select(blockKey.as("block") +: col(idCol).as("id") +:
        fcols.map(col): _*)
      .withColumn("grp", pmod(
        graft.functions.LongHashes.splitmix64(col("id")),
        lit(groups.toLong)).cast("int"))
    val gs = array((0 until groups).map(lit): _*)
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val l = base.select(col("block") +: col("grp").as("gi") +:
        explode(gs).as("gj") +: col("id").as("id_a") +:
        fcols.map(f => col(f).as(s"a_$f")): _*)
      .repartition(parts, col("block"), col("gi"), col("gj"))
    val r = base.select(col("block") +: explode(gs).as("gi") +:
        col("grp").as("gj") +: col("id").as("id_b") +:
        fcols.map(f => col(f).as(s"b_$f")): _*)
      .repartition(parts, col("block"), col("gi"), col("gj"))
    l.join(r, Seq("block", "gi", "gj"))
      .where(col("id_a") < col("id_b"))
  }

  /** Unsupervised EM estimation of the Fellegi–Sunter parameters —
    * "where do [[fsScorePairs]]'s m/u weights come from": fit, with NO
    * labels, the two-class conditional-independence mixture of Fellegi
    * & Sunter (1969)'s companion estimation problem (the EM fit
    * popularized by Winkler 1988). Per field k: m_k = P(agree | same
    * entity), u_k = P(agree | different), plus the match-class prior
    * p. Output: one row per `(round, field)` — `(round, field, m, u,
    * p)` for rounds 1..`iters` — so convergence is part of the
    * artifact, not just the endpoint.
    *
    * Determinism recipe (the pattern-histogram formulation): a pair's
    * evidence is only its AGREEMENT PATTERN over the K fields, so the
    * corpus reduces to an EXACT integer histogram over <= 2^K patterns
    * (bit k of `pat` = null-safe agreement on field k) — one map-side
    * partial count, order-free. The EM rounds then run as FIXED-ORDER
    * driver arithmetic over the histogram sorted by pattern id: w =
    * p * prod_k (m_k or 1-m_k) in field order, v likewise over u,
    * posterior g = w/(w+v), and every M-step sum is a seeded left fold
    * in ascending-pattern order — one fixed expression tree the oracle
    * replays bit-identically (list_reduce over list(... ORDER BY
    * pat)). No logs anywhere (the standing log/pow ban). Estimates are
    * clamped to [1e-6, 1-1e-6] (both engines, identical literals) so a
    * degenerate corpus saturates instead of poisoning the next round
    * with 0/0.
    *
    * Scale shape: the pair frame (the expensive part) is the same
    * blocked replicated-group decomposition as [[fsScorePairs]]; the
    * ONLY thing that crosses to the driver is the <= 2^K-row histogram
    * (loud K <= 12 guard — the low-cardinality-collect contract), and
    * the EM itself is O(2^K * iters) scalar work. At 100 TB nothing
    * changes: the histogram is still <= 2^K rows. */
  def fsEmWeights(df: DataFrame, idCol: String, blockKey: Column,
      fields: Seq[String], iters: Int = 6, m0: Double = 0.9,
      u0: Double = 0.1, p0: Double = 0.5, groups: Int = 8): DataFrame = {
    require(fields.nonEmpty, "fsEmWeights: fields must be non-empty")
    require(fields.size <= 12,
      s"fsEmWeights: ${fields.size} fields would make a ${1L << fields.size}-" +
        "pattern histogram; the driver-collect contract is K <= 12")
    require(iters >= 1 && iters <= 100,
      s"fsEmWeights: iters must be in [1, 100], got $iters")
    Seq(("m0", m0), ("u0", u0), ("p0", p0)).foreach { case (n, x) =>
      require(x > 0.0 && x < 1.0,
        s"fsEmWeights: $n must be strictly inside (0, 1), got $x") }
    require(groups >= 1, "groups must be >= 1")
    val K = fields.size
    val patCol = fields.zipWithIndex.map { case (f, k) =>
      when(col(s"a_$f") <=> col(s"b_$f"), lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)
    val hist: Array[(Long, Long)] =
      blockedFieldPairs(df, idCol, blockKey, fields, groups)
        .select(patCol.as("pat")).groupBy("pat")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("pat")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    require(hist.nonEmpty,
      "fsEmWeights: no candidate pairs — every block has < 2 records")
    val Eps = 1e-6
    val Hi = 1.0 - Eps
    val m = Array.fill(K)(m0)
    val u = Array.fill(K)(u0)
    var p = p0
    val out = Seq.newBuilder[(Int, String, Double, Double, Double)]
    for (r <- 1 to iters) {
      // E-step off the PREVIOUS round's parameters (gs snapshots them)
      val gs = hist.map { case (pat, cnt) =>
        var w = p
        var v = 1.0 - p
        var k = 0
        while (k < K) {
          if (((pat >> k) & 1L) == 1L) { w = w * m(k); v = v * u(k) }
          else { w = w * (1.0 - m(k)); v = v * (1.0 - u(k)) }
          k += 1
        }
        (pat, cnt.toDouble, w / (w + v))
      }
      // M-step: every sum is a 0.0-seeded left fold in ascending-pat
      // order (gs is sorted) — the exact operand sequence the oracle's
      // list_reduce replays; non-matching patterns contribute an
      // explicit 0.0 so both sequences are identical term for term.
      val sg = gs.foldLeft(0.0) { case (a, (_, c, g)) => a + g * c }
      val sn = gs.foldLeft(0.0) { case (a, (_, c, g)) => a + (1.0 - g) * c }
      var k = 0
      while (k < K) {
        val sgk = gs.foldLeft(0.0) { case (a, (pat, c, g)) =>
          a + (if (((pat >> k) & 1L) == 1L) g * c else 0.0) }
        val suk = gs.foldLeft(0.0) { case (a, (pat, c, g)) =>
          a + (if (((pat >> k) & 1L) == 1L) (1.0 - g) * c else 0.0) }
        m(k) = math.min(math.max(sgk / sg, Eps), Hi)
        u(k) = math.min(math.max(suk / sn, Eps), Hi)
        k += 1
      }
      p = math.min(math.max(sg / (sg + sn), Eps), Hi)
      fields.zipWithIndex.foreach { case (f, k2) =>
        out += ((r, f, m(k2), u(k2), p)) }
    }
    df.sparkSession.createDataFrame(out.result())
      .toDF("round", "field", "m", "u", "p")
  }

  /** Per-record merge-candidate summary over [[fuzzyPairs]]:
    * `(id, canon, n_cands)` where `canon` is the smallest id among the
    * record's LOWER-id fuzzy matches (the record itself when none) and
    * `n_cands` counts those matches — the deterministic one-hop keeper
    * assignment, same min-id convention as [[Dedup.exactDedup]]. One
    * slim aggregate over the pair frame plus a key-join back to the
    * corpus (the match frame carries ids only — names never reshuffle).
    * For full transitive canonicalization feed the pairs through
    * [[Dedup.nearDupClusters]] instead; one-hop is the audit artifact
    * (per-record: does anything look mergeable, and with what). */
  def fuzzyCanonical(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, maxDist: Int): DataFrame = {
    val lower = fuzzyPairs(df, idCol, nameCol, blockKey, maxDist)
      .groupBy(col("id_b").as(idCol))
      .agg(min(col("id_a")).as("lo"), count(lit(1)).as("n"))
    df.select(col(idCol)).join(lower, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("lo"), col(idCol)).as("canon"),
        coalesce(col("n"), lit(0L)).as("n_cands"))
  }
}
