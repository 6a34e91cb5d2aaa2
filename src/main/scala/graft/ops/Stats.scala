package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact-moment bivariate statistics: per-key Pearson correlation and
  * ordinary-least-squares slope/intercept, from DECIMAL co-moments.
  *
  * Spark's built-in `corr`/`regr_slope` accumulate doubles in partition
  * order, so their low bits depend on the physical split — fine for a
  * dashboard, unusable under a value-level hash oracle and unstable
  * across retries/AQE re-plans. This takes the [[EventAnalytics
  * .zScoreOutliers]] recipe one column up: the five co-moment SUMS ride
  * DECIMAL (exact, order-independent, map-side partials still apply),
  * and only the FINAL formula is IEEE double with a fixed evaluation
  * order — bit-exact on any partitioning and replayable by the DuckDB
  * oracle verbatim.
  *
  * Scale shape: one aggregate exchange keyed on `keyCols`, partial
  * sums before it; the stats frame is one row per key. Constant x (or
  * y) makes the corresponding variance term zero — corr/slope go NULL
  * (not a divide-by-zero throw under ANSI mode), intercept degrades to
  * the y mean when only slope is defined. Rows with a NULL in either
  * column are excluded from ALL moments (pairwise deletion, the
  * standard `corr` contract). */
object Stats {

  def corrRegression(df: DataFrame, keyCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(keyCols.nonEmpty, "corrRegression needs at least one key column")
    val x = col(xCol)
    val y = col(yCol)
    val agg = df
      .where(x.isNotNull && y.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(x.cast(DecimalType(18, 6))).cast(DoubleType).as("sx"),
        sum(y.cast(DecimalType(18, 6))).cast(DoubleType).as("sy"),
        sum((x * x).cast(DecimalType(28, 10))).cast(DoubleType).as("sxx"),
        sum((y * y).cast(DecimalType(28, 10))).cast(DoubleType).as("syy"),
        sum((x * y).cast(DecimalType(28, 10))).cast(DoubleType).as("sxy"))
    val n = col("n").cast(DoubleType)
    // fixed-order IEEE arithmetic from here down — every op below is
    // restated verbatim in the oracle SQL
    val num = n * col("sxy") - col("sx") * col("sy")
    val denx = n * col("sxx") - col("sx") * col("sx")
    val deny = n * col("syy") - col("sy") * col("sy")
    val slope = when(denx > 0, num / denx)
    agg.select(keyCols.map(col) :+
      col("n") :+
      when(denx > 0 && deny > 0,
        num / (sqrt(denx) * sqrt(deny))).as("corr") :+
      slope.as("slope") :+
      when(denx > 0, col("sy") / n - slope * (col("sx") / n))
        .as("intercept"): _*)
  }

  /** Distribution drift between a REFERENCE snapshot and a CURRENT
    * one — the monitor a pipeline runs on every new data drop before
    * training on it. Values bucket into fixed-width bins (the
    * q_histogram arithmetic: `floor(v / binWidth)` — no range-discovery
    * pass, so new out-of-range values land in NEW bins instead of
    * silently clipping), each side aggregates to per-bin counts (one
    * slim exchange per side, map-side partials), and a full outer join
    * on the bin aligns them: `n_ref = 0` rows are exactly the novel
    * regions. Per bin: proportions and the L1 term `|p_ref - p_cur|`;
    * `tvd` (total variation distance, `0.5 * sum(l1)`) rides every row
    * as the headline scalar.
    *
    * Determinism note (why TVD is a FOLD, not a sum): `sum()` over
    * doubles adds in partition order, so its low bits vary by split —
    * unverifiable, the Stats.corrRegression lesson. The bin frame is
    * bounded (value range / binWidth — the caller's sizing contract,
    * like temperatureMix), so the L1 terms collect into ONE sorted
    * array and fold left in bin order: bit-identical on any
    * partitioning, and the oracle replays the same fold. The PSI/KL
    * phrasings were rejected for their libm `ln` (last-ulp varies by
    * platform); TVD is subtraction and abs only. */
  def histogramDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def bins(df: DataFrame, cnt: String): DataFrame = df
      .where(col(valueCol).isNotNull)
      .groupBy(floor(col(valueCol) / binWidth).cast(LongType).as("bin"))
      .agg(count(lit(1)).as(cnt))
    driftOverBins(bins(ref, "n_ref"), bins(cur, "n_cur"))
  }

  /** [[histogramDrift]] with EQUI-DEPTH bins: fixed-width bins go
    * blind on heavy-tailed columns — most of the mass lands in one
    * bin, so a shift INSIDE that bin moves no mass between bins and
    * TVD reads ~0 (StatsSpec constructs exactly that miss). Here the
    * bin edges are the REFERENCE snapshot's quantiles — each bin holds
    * ~1/nBins of the reference mass, so intra-bulk shifts move mass
    * across edges and register.
    *
    * Edges come from [[Sketches.quantileSketch]] over `splitmix64(idCol)`
    * (hash-derived retention — the whole monitor stays a pure function
    * of the two row sets and replays in the oracle), taken NEAREST-RANK
    * (`edge_j = sample[ceil(j*n/nBins)]`, exact integer arithmetic, no
    * interpolation) so edges are actual sample values and the bin
    * comparison is long-vs-long. `bin(v) = |{j : v >= edge_j}|` in
    * 0..nBins-1 (values equal to an edge go RIGHT — one fixed,
    * replayable convention); out-of-range new values land in bin 0 or
    * nBins-1 rather than opening new bins (the sketch cannot know the
    * novel range — [[histogramDrift]] remains the novel-region
    * detector; this variant is the bulk-shift detector).
    *
    * `valueCol` must be integral (quantize doubles to fixed point
    * first — the house pattern); `ref` must be non-empty. Scale shape:
    * one bounded sketch aggregate over ref, edges broadcast back onto
    * both narrow scans, then the [[histogramDrift]] tail — per-side
    * bin counts (map-side partials), full outer join on <= nBins rows,
    * ordered-fold TVD. */
  def histogramDriftEqDepth(ref: DataFrame, cur: DataFrame, idCol: String,
      valueCol: String, nBins: Int, k: Int = 256): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    require(k >= nBins, s"sketch k ($k) must be >= nBins ($nBins)")
    val edges = ref.where(col(valueCol).isNotNull)
      .agg(graft.ops.Sketches.quantileSketch(
        graft.functions.LongHashes.splitmix64(col(idCol)),
        col(valueCol), k).as("qs"))
      .select(graft.ops.Sketches.sketchEdges(col("qs"), nBins).as("edges"))
    def bins(df: DataFrame, cnt: String): DataFrame = df
      .where(col(valueCol).isNotNull)
      .crossJoin(broadcast(edges))
      .groupBy(graft.ops.Sketches.edgeBucket(col("edges"), col(valueCol))
        .cast(LongType).as("bin"))
      .agg(count(lit(1)).as(cnt))
    driftOverBins(bins(ref, "n_ref"), bins(cur, "n_cur"))
  }

  /** ROBUST outliers — the median/MAD counterpart to
    * [[EventAnalytics.zScoreOutliers]]: flag rows where the modified
    * z-score `|0.6745 * (v - median) / MAD| > threshold`
    * (Iglewicz-Hoaglin; 3.5 is their standard cut). Mean/std scoring
    * has a 0% breakdown point — the outliers being hunted inflate the
    * std and mask themselves; median/MAD tolerates up to 50%
    * contamination, which is what a monitor scanning a hostile data
    * drop actually needs.
    *
    * Exact per-key medians would cost a full per-group sorted pass at
    * 100 TB, so both location and scale come off the hash-deterministic
    * [[Sketches.quantileSketch]] (~1/sqrt(k) rank error — noise at the
    * 3.5σ-equivalent cut), and the SAME rows feed both sketches
    * (retention depends only on the row hash), so the whole monitor
    * remains a pure function of the row set and oracle-replays.
    * Absolute deviations are rounded half-up to longs for the second
    * sketch (the fixed-point house pattern).
    *
    * Scale shape: two bounded sketch aggregates (one per statistic,
    * each one slim exchange) + two broadcasts of one-row-per-key
    * frames back onto narrow scans — the event log never shuffles,
    * exactly the zScoreOutliers bill. `valueCol` must be integral
    * (fixed-point doubles first). */
  def robustZOutliers(events: DataFrame, idCol: String, keyCol: String,
      valueCol: String, threshold: Double, k: Int = 256): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val hash = graft.functions.LongHashes.splitmix64(col(idCol))
    val medFrame = events.where(col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(Sketches.quantileSketch(hash, col(valueCol), k).as("qs"))
      .select(col(keyCol), Sketches.sketchQuantile(col("qs"), 0.5).as("med"))
    val withMed = events.join(broadcast(medFrame), keyCol)
      .withColumn("__dev",
        floor(abs(col(valueCol).cast(DoubleType) - col("med")) + lit(0.5))
          .cast(LongType))
    val madFrame = withMed.groupBy(col(keyCol))
      .agg(Sketches.quantileSketch(hash, col("__dev"), k).as("qd"))
      .select(col(keyCol), Sketches.sketchQuantile(col("qd"), 0.5).as("mad"))
    // a zero MAD (>= half the sample at the median) leaves the score
    // undefined — null rz, dropped by the filter, same convention as
    // zScoreOutliers' zero-std guard
    withMed.join(broadcast(madFrame), keyCol)
      .select(col(idCol), col(keyCol), col(valueCol),
        when(col("mad") > 0,
          lit(0.6745) * (col(valueCol).cast(DoubleType) - col("med"))
            / col("mad")).as("rz"))
      .where(abs(col("rz")) > threshold)
  }

  /** Per-key EMPIRICAL-CDF normalization — the cross-population score
    * calibrator: raw scores are not comparable across sources (a 0.6
    * "quality" from one crawl is a different animal in another), so
    * curation cuts on a raw global threshold silently over-prune some
    * sources and under-prune others. This maps each value to its
    * within-key percentile `pct = |{s in sample : s <= v}| / n` off
    * the hash-deterministic [[Sketches.quantileSketch]] — after which
    * "keep the top quartile OF EACH source" is one global
    * `pct >= 0.75` filter.
    *
    * The CDF estimate is exact integer counting over the sample plus
    * ONE division (no interpolation — replayable bit-for-bit), with
    * the usual ~1/sqrt(k) sample rank error. Scale shape: one bounded
    * sketch aggregate, the per-key sample frame broadcast back onto a
    * narrow scan — the corpus never shuffles. `valueCol` must be
    * integral (fixed-point doubles first). Appends `pct`; all input
    * columns pass through. */
  def quantileNormalize(df: DataFrame, idCol: String, keyCol: String,
      valueCol: String, k: Int = 1024): DataFrame = {
    require(!df.columns.contains("pct"),
      "column name `pct` is reserved — rename it")
    val sk = df.where(col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(graft.ops.Sketches.quantileSketch(
        graft.functions.LongHashes.splitmix64(col(idCol)),
        col(valueCol), k).as("__qs"))
    // LEFT join: a key whose values are all NULL has no sketch row —
    // its rows must survive with a NULL pct, not silently vanish from
    // a "normalize" pass (an inner join here is a data-loss footgun)
    df.join(broadcast(sk), Seq(keyCol), "left")
      .withColumn("pct",
        // a NULL value (or keyless sketch) has no rank — null pct,
        // not a bogus 0.0
        when(col(valueCol).isNotNull && col("__qs").isNotNull,
          size(filter(col("__qs"), e => e <= col(valueCol))).cast(DoubleType)
            / size(col("__qs")).cast(DoubleType)))
      .drop("__qs")
  }

  /** Shared tail of the drift monitors: align per-bin counts with a
    * full outer join, attach proportions and L1 terms, and fold the
    * bounded bin frame into the TVD in bin order (see
    * [[histogramDrift]]'s determinism note — ONE implementation, so
    * the fixed-width and equi-depth variants cannot drift apart). */
  private def driftOverBins(refBins: DataFrame, curBins: DataFrame)
      : DataFrame = {
    val joined = refBins.join(curBins, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val perBin = joined
      .crossJoin(broadcast(joined.agg(sum(col("n_ref")).as("t_ref"),
        sum(col("n_cur")).as("t_cur"))))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        (col("n_ref").cast(DoubleType) / col("t_ref").cast(DoubleType))
          .as("p_ref"),
        (col("n_cur").cast(DoubleType) / col("t_cur").cast(DoubleType))
          .as("p_cur"))
      .withColumn("l1_term", abs(col("p_ref") - col("p_cur")))
    val tvd = perBin
      .agg(array_sort(collect_list(struct(col("bin"), col("l1_term"))))
        .as("terms"))
      .select((aggregate(
        transform(col("terms"), t => t.getField("l1_term")),
        lit(0.0), (acc, x) => acc + x) * 0.5).as("tvd"))
    perBin.crossJoin(broadcast(tvd))
  }

  /** PER-KEY WINSORIZATION — the cleaning step the outlier monitors
    * ([[robustZOutliers]]) flag for: clamp each value into its key's
    * [pLo, pHi] quantile band instead of dropping the row (drop biases
    * aggregates; clamping keeps the row with a bounded contribution —
    * the standard treatment before computing means/regressions on
    * heavy-tailed telemetry). Band edges come off the hash-
    * deterministic [[Sketches.quantileSketch]] (the SAME kept rows
    * independent of partitioning), read with the fixed-order
    * interpolation, so every clamped value is a pure function of the
    * row set and replays bit-exactly. Emits the original and clamped
    * value plus the clip direction flags (count them — clip rates
    * drifting is itself a monitor signal). Rows whose key has no band
    * (all values NULL for the key, or a NULL key) survive with NULL
    * v_winsor and flags — null in, null out, never a silent drop.
    *
    * Scale shape: one bounded sketch aggregate (16k bytes per (key,
    * partition)), edges broadcast back onto a narrow scan — the
    * corpus never shuffles (the zScoreOutliers bill). `valueCol`
    * integral (fixed-point doubles first). */
  def winsorize(df: DataFrame, idCol: String, keyCol: String,
      valueCol: String, pLo: Double, pHi: Double,
      k: Int = 256): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got $pLo / $pHi")
    val hash = graft.functions.LongHashes.splitmix64(col(idCol))
    val bands = df.where(col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(Sketches.quantileSketch(hash, col(valueCol), k).as("qs"))
      .select(col(keyCol),
        Sketches.sketchQuantile(col("qs"), pLo).as("q_lo"),
        Sketches.sketchQuantile(col("qs"), pHi).as("q_hi"))
    val v = col(valueCol).cast(DoubleType)
    // LEFT join: a row whose key has no band (every value NULL for the
    // key, or a NULL key — NULL never equi-matches) still survives,
    // with NULL v_winsor/flags — the same null-in/null-out contract
    // the value guard below keeps, extended to the band side.
    df.join(broadcast(bands), Seq(keyCol), "left")
      .select(col(idCol), col(keyCol), col(valueCol),
        // guarded: Spark's least/greatest SKIP nulls, so an unguarded
        // clamp would rewrite a NULL value to q_hi (or pass a value
        // through unclamped when the band is missing) — null in/out
        when(v.isNotNull && col("q_lo").isNotNull,
          greatest(least(v, col("q_hi")), col("q_lo"))).as("v_winsor"),
        (v < col("q_lo")).as("clipped_lo"),
        (v > col("q_hi")).as("clipped_hi"))
  }

  /** PER-COLUMN profile drift between two snapshots — the SCHEMA-level
    * drop check next to the value-level monitors ([[histogramDrift]] /
    * [[histogramDriftEqDepth]] watch ONE column's distribution; this
    * watches every column's shape metrics at once): per column and
    * side, exact non-null count / null count / min / max plus the KMV
    * distinct-count estimate ([[Sketches.kmvDistinct]] — exact below
    * `k` distincts, ~1/sqrt(k) relative error above), joined ref-vs-cur
    * with the null-rate delta as one fixed-order double formula. The
    * questions it answers before training on a new drop: did a column
    * go null-heavy, did an id column's cardinality collapse (dedup
    * upstream broke), did a value column's range jump (unit change).
    *
    * `cols` maps output names to INTEGRAL column expressions
    * (fixed-point doubles first — the house pattern; values must be
    * non-negative if the oracle replays the hash chain via HUGEINT).
    * Scale shape: ONE plain aggregate per side — all metrics for all
    * columns in a single map-side-partial pass, no Expand (the
    * q_profile_sketch discipline), 16k bytes per column per partition
    * for the sketches — then a #cols-row melt and join. Nothing
    * corpus-sized ever reshuffles. */
  def profileDrift(ref: DataFrame, cur: DataFrame,
      cols: Seq[(String, org.apache.spark.sql.Column)],
      k: Int = 256): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    def side(df: DataFrame, sfx: String): DataFrame = {
      val aggs = cols.flatMap { case (nm, c) => Seq(
        count(c).as(s"${nm}__n"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${nm}__nulls"),
        Sketches.kmvDistinct(
          graft.functions.LongHashes.splitmix64(c), k)
          .getField("est").as(s"${nm}__dist"),
        min(c).as(s"${nm}__min"), max(c).as(s"${nm}__max")) }
      val wide = df.agg(aggs.head, aggs.tail: _*)
      val stackExpr = cols.map { case (nm, _) =>
        s"'$nm', ${nm}__n, ${nm}__nulls, ${nm}__dist, ${nm}__min, ${nm}__max" }
        .mkString(s"stack(${cols.length}, ", ", ", ")")
      wide.select(expr(s"$stackExpr AS (col_name, n_$sfx, nulls_$sfx, " +
        s"dist_$sfx, min_$sfx, max_$sfx)"))
    }
    def nullRate(sfx: String) =
      col(s"nulls_$sfx").cast(DoubleType) /
        (col(s"n_$sfx") + col(s"nulls_$sfx")).cast(DoubleType)
    side(ref, "ref").join(side(cur, "cur"), Seq("col_name"))
      .withColumn("null_rate_delta", nullRate("cur") - nullRate("ref"))
  }

  /** Poisson(1) CDF, exact shortest-round-trip double literals — the
    * replicate-weight thresholds for [[bootstrapCI]]. Truncated at 8
    * (P(X > 8) < 1.1e-5); embedded as literals in BOTH engines, so the
    * comparison `u >= cdf_k` is bit-identical everywhere. */
  private[ops] val Poisson1Cdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253)

  /** DETERMINISTIC POISSON BOOTSTRAP CI — per-group confidence
    * intervals for the mean in ONE pass (Chamandy et al. 2012, "the
    * poor man's bootstrap" at planet scale): classical resampling
    * needs B passes over shuffled data; the Poisson approximation
    * gives every row an independent Poisson(1) replicate weight, so
    * all B replicate sums ride ONE aggregate with map-side partials.
    * This implementation makes it REPLAYABLE, not just scalable: the
    * weight for (row, replicate i) comes from
    * `splitmix64(id·B + i)` — a pure function of the row id, no RNG
    * state — mapped to a Poisson(1) draw by counting CDF thresholds
    * (exact double literals, [[Poisson1Cdf]]) under the 53-bit
    * uniform `u = (h >>> 11) · 2⁻⁵³`. `valueCol` INTEGRAL (fixed-point
    * doubles first, the house pattern), so every replicate sum is
    * exact integer arithmetic on any partitioning and each replicate
    * mean is one exact-operand IEEE division; the CI edges come off
    * the sorted replicate means via the shared fixed-order
    * interpolation ([[Sketches.sketchQuantile]]).
    *
    * Contracts, enforced loudly: `idCol` UNIQUE, non-negative, and
    * under `2^62 / b` (the replicate fan-out must not wrap);
    * degenerate replicates (all weights 0 — vanishing probability
    * past a handful of rows) drop out of the CI order statistics, and
    * `n_reps` records how many survived. Overflow contract:
    * `8 · max|v| · groupRows < 2^63` (w <= 8 by CDF truncation).
    *
    * Scale shape: ONE aggregate pass, 2B+2 partial sums per group —
    * nothing corpus-sized shuffles, no explosion to (row × replicate)
    * rows; B=32 costs 66 longs per (group, partition). Returns
    * (groupCols..., n, mean, n_reps, ci_lo, ci_hi) with mean/CI in
    * `valueCol`'s fixed-point units. */
  def bootstrapCI(df: DataFrame, groupCols: Seq[String], idCol: String,
      valueCol: String, b: Int = 32, pLo: Double = 0.025,
      pHi: Double = 0.975): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(b >= 8 && b <= 256, s"b must be in [8, 256], got $b")
    require(pLo > 0 && pLo < pHi && pHi < 1,
      s"need 0 < pLo < pHi < 1, got $pLo / $pHi")
    val idMax = (1L << 62) / b
    // NULL values are excluded up front (a CI of the measured values):
    // without this, a null-v row's weights would still land in sw_i
    // while contributing nothing to swx_i, silently biasing every
    // replicate mean down.
    val guarded = df.where(col(valueCol).isNotNull).where(assert_true(
      col(idCol).isNotNull && col(idCol) >= 0 && col(idCol) < idMax,
      concat(lit(s"bootstrapCI: id out of [0, $idMax) — the id*b+i " +
        "replicate hash must not wrap; got "),
        col(idCol).cast(org.apache.spark.sql.types.StringType))).isNull)
    val v = col(valueCol)
    def weight(i: Int): org.apache.spark.sql.Column = {
      val h = graft.functions.LongHashes.splitmix64(
        col(idCol) * lit(b.toLong) + lit(i.toLong))
      val u = shiftrightunsigned(h, 11).cast(DoubleType) *
        lit(1.1102230246251565e-16) // 2^-53, exact
      Poisson1Cdf.map(c => when(u >= lit(c), 1L).otherwise(0L))
        .reduce(_ + _)
    }
    val aggs =
      Seq(count(v).as("n"), sum(v).as("__sv")) ++
      (0 until b).flatMap { i => Seq(
        sum(weight(i) * v).as(s"__swx_$i"),
        sum(weight(i)).as(s"__sw_$i")) }
    val means = array((0 until b).map { i =>
      when(col(s"__sw_$i") > 0,
        col(s"__swx_$i").cast(DoubleType) / col(s"__sw_$i").cast(DoubleType))
    }: _*)
    guarded.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(groupCols.map(col) ++ Seq(
        col("n"),
        (col("__sv").cast(DoubleType) / col("n").cast(DoubleType))
          .as("mean"),
        array_sort(filter(means, m => m.isNotNull)).as("__ms")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("n"), col("mean"),
        size(col("__ms")).cast(LongType).as("n_reps"),
        Sketches.sketchQuantile(col("__ms"), pLo).as("ci_lo"),
        Sketches.sketchQuantile(col("__ms"), pHi).as("ci_hi")): _*)
  }

  /** CALIBRATED MULTI-SIGNAL QUALITY GATE — the keep/drop decision the
    * individual monitors feed: each signal's threshold is read off the
    * CORPUS ITSELF at a chosen percentile (hash-deterministic
    * [[Sketches.quantileSketch]] + the shared fixed-order
    * interpolation), so the gate self-calibrates to the distribution
    * at hand instead of shipping magic constants that rot as the
    * corpus drifts — the practice behind every production filtering
    * stack (fixed thresholds tuned on last year's crawl silently
    * over/under-filter this year's). A row passes a gate when its
    * signal sits on the keep side of that percentile; `keep` is the
    * conjunction over all gates, with NULL signals failing CLOSED
    * (flag NULL, keep false — an unmeasurable row must not sail
    * through a quality gate).
    *
    * `signals`: (name, INTEGRAL column) — fixed-point doubles first,
    * the house pattern. `gates`: (gateName, signalName, percentile,
    * keepBelow) — several gates may read one signal (a [p05, p95]
    * band is two gates on the same sketch).
    *
    * Scale shape: ONE aggregate pass computes every signal's sketch
    * simultaneously (16k bytes per signal per partition, the
    * q_profile no-Expand discipline — NOT one pass per signal), the
    * 1-row threshold frame rides a broadcast back onto a narrow scan;
    * no Window, no join-per-signal, the corpus never reshuffles.
    * Returns idCol, every signal value, every `<gate>_thr`
    * (per-run constants — in the output so drift of the calibration
    * itself is monitorable), every `<gate>_ok`, and `keep`. */
  def calibratedQualityGate(df: DataFrame, idCol: String,
      signals: Seq[(String, org.apache.spark.sql.Column)],
      gates: Seq[(String, String, Double, Boolean)],
      k: Int = 256): DataFrame = {
    require(signals.nonEmpty, "signals must be non-empty")
    require(gates.nonEmpty, "gates must be non-empty")
    val snames = signals.map(_._1)
    require(snames.distinct == snames, s"duplicate signal names: $snames")
    val gnames = gates.map(_._1)
    require(gnames.distinct == gnames, s"duplicate gate names: $gnames")
    gates.foreach { case (g, sn, p, _) =>
      require(snames.contains(sn), s"gate $g reads unknown signal $sn")
      require(p > 0.0 && p < 1.0, s"gate $g percentile must be in (0,1), got $p")
    }
    val base = df.select(
      (col(idCol) +: signals.map { case (n, c) => c.as(n) }): _*)
    val hash = graft.functions.LongHashes.splitmix64(col(idCol))
    val skAggs = signals.map { case (n, _) =>
      Sketches.quantileSketch(hash, col(n), k).as(s"__sk_$n") }
    val thrRow = base.agg(skAggs.head, skAggs.tail: _*)
      .select(gates.map { case (g, sn, p, _) =>
        Sketches.sketchQuantile(col(s"__sk_$sn"), p).as(s"${g}_thr") }: _*)
    val flagCols = gates.map { case (g, sn, _, keepBelow) =>
      val v = col(sn).cast(DoubleType)
      (if (keepBelow) v <= col(s"${g}_thr") else v >= col(s"${g}_thr"))
        .as(s"${g}_ok")
    }
    base.crossJoin(broadcast(thrRow))
      .select((col(idCol) +: signals.map(s => col(s._1))) ++
        gates.map { case (g, _, _, _) => col(s"${g}_thr") } ++
        flagCols: _*)
      // NULL fails closed: coalesce(flag, false) before the AND
      .withColumn("keep", gates.map { case (g, _, _, _) =>
        coalesce(col(s"${g}_ok"), lit(false)) }.reduce(_ && _))
  }

  /** TWO-PROPORTION Z-TEST — the A/B-test workhorse next to
    * [[bootstrapCI]]'s resampling CIs and [[ksTest]]'s distribution
    * drift: for unit-level binary outcomes split into two variants,
    * the pooled-variance z statistic
    * `z = (p₁ − p₂) / sqrt(p̂(1−p̂)(1/n₁ + 1/n₂))` plus the absolute
    * lift. Integer counts to the end, then a FIXED chain of
    * correctly-rounded IEEE ops (divisions of exact integers, one
    * sqrt) — deterministic cross-engine; like [[ksTest]], the z is
    * compared against the classic critical values (1.96 for α=0.05)
    * rather than converted to a p-value (erf is off the determinism
    * menu). z is NULL when either variant is empty or the pooled rate
    * is degenerate (p̂ ∈ {0,1}: zero variance, the test is undefined).
    *
    * `variantCol` must be boolean-like (true = treatment);
    * `successCol` boolean-like. NULL rows drop. Scale: ONE map-side-
    * partial aggregate to four counters. */
  def twoProportionZ(df: DataFrame, variantCol: String,
      successCol: String): DataFrame = {
    val v = col(variantCol).cast(BooleanType)
    val y = col(successCol).cast(BooleanType)
    df.where(v.isNotNull && y.isNotNull)
      .agg(
        sum(when(v, 1L).otherwise(0L)).as("n1"),
        sum(when(v && y, 1L).otherwise(0L)).as("x1"),
        sum(when(!v, 1L).otherwise(0L)).as("n2"),
        sum(when(!v && y, 1L).otherwise(0L)).as("x2"))
      .select(col("n1"), col("x1"), col("n2"), col("x2"),
        // ANSI divide throws on a zero divisor, so empty variants
        // surface as NULL rates rather than a job failure
        when(col("n1") > 0L, col("x1").cast(DoubleType) /
          col("n1").cast(DoubleType)).as("p1"),
        when(col("n2") > 0L, col("x2").cast(DoubleType) /
          col("n2").cast(DoubleType)).as("p2"),
        when(col("n1") + col("n2") > 0L,
          (col("x1") + col("x2")).cast(DoubleType) /
            (col("n1") + col("n2")).cast(DoubleType)).as("p_pool"))
      .select(col("n1"), col("x1"), col("n2"), col("x2"), col("p1"),
        col("p2"), (col("p1") - col("p2")).as("lift"),
        when(col("n1") === 0L || col("n2") === 0L ||
            col("x1") + col("x2") === 0L ||
            col("x1") + col("x2") === col("n1") + col("n2"), lit(null))
          .otherwise((col("p1") - col("p2")) /
            sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
              (lit(1.0) / col("n1").cast(DoubleType) +
                lit(1.0) / col("n2").cast(DoubleType))))
          .as("z"))
  }

  /** The INTEGRAL contract made loud: integer-typed columns pass
    * through as Longs; fractional types (double/float/decimal) RAISE on
    * the first non-integral value instead of silently truncating — a
    * caller handing ksTest/rocAuc raw doubles would otherwise get a
    * plausible but wrong D/AUC whose tie blocks depend on the engine's
    * truncation. NULLs stay NULL (the callers' isNotNull filters drop
    * them). */
  private def integralLong(df: DataFrame, c: String,
      opName: String): Column = df.schema(c).dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      col(c).cast(LongType)
    case FloatType | DoubleType | _: DecimalType =>
      // NaN and ±Inf must raise too: Spark's NaN = NaN is TRUE and
      // floor(Inf) = Inf, so the non-integral compare alone lets both
      // through to a silent 0L / Long.MaxValue cast
      val d = col(c).cast(DoubleType)
      when(isnan(d) || abs(d) === lit(Double.PositiveInfinity) ||
          (d =!= floor(d)),
        raise_error(concat(
          lit(s"$opName: `$c` must be integral-valued (quantize first, " +
            "e.g. round(x*100)) — got "), col(c).cast(StringType))))
        .otherwise(col(c).cast(LongType))
    case other => throw new IllegalArgumentException(
      s"$opName: `$c` must be a numeric column, got ${other.simpleString}")
  }

  /** TWO-SAMPLE KOLMOGOROV-SMIRNOV statistic — the binning-free member
    * of the drift family (histogramDrift's TVD depends on the bin
    * width; KS D = sup|F_ref − F_cur| is the distribution-level
    * answer): D over INTEGER-valued samples (cent-scale first),
    * computed entirely in exact Long arithmetic — the sup is
    * `max|cum_ref·n_cur − cum_cur·n_ref|` over the pooled distinct
    * values (the ECDF difference only changes there), and
    * `d = d_num/(n_ref·n_cur)` is ONE closing division. Also emits
    * `ks_stat = sqrt(n_ref·n_cur/(n_ref+n_cur))·d` — the scaled
    * statistic compared against the K-S critical values (1.36 for
    * α=0.05) — as a fixed chain of correctly-rounded IEEE ops (sqrt
    * is exact-rounded; no exp/log, so no p-value by design).
    * NULL values drop; a side with no rows yields NULL d. LOUD raise
    * past ~3e9 rows per side (n_ref·n_cur Long bound).
    *
    * Scale shape: each side collapses to its distinct-value histogram
    * with map-side partials; the cumulative walk windows over the
    * POOLED VALUE DOMAIN, not the rows — and because that walk is an
    * unpartitioned Window (ONE task sorts the whole domain), the
    * domain size is GUARDED, not just documented: the totals
    * broadcast carries the pooled distinct count and every row
    * entering the window asserts it <= `maxDomain`, so a
    * high-cardinality value column (micros where cents were meant)
    * raises with the coarsening remedy instead of silently
    * serializing the job. One row out. */
  def ksTest(ref: DataFrame, cur: DataFrame, valueCol: String,
      maxDomain: Long = 1L << 22): DataFrame = {
    require(maxDomain >= 1, s"maxDomain must be >= 1, got $maxDomain")
    def side(df: DataFrame, n: String) = df
      .select(integralLong(df, valueCol, "ksTest").as("v"))
      .where(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as(n))
    val g = side(ref, "nr").join(side(cur, "nc"), Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("nr"), lit(0L)).as("nr"),
        coalesce(col("nc"), lit(0L)).as("nc"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val totals = g.agg(sum(col("nr")).as("n_ref"), sum(col("nc")).as("n_cur"),
      count(lit(1)).as("__n_domain"))
    // the guard sits on the window INPUT: rows stream through the
    // assert while exchanging into the sort, so the raise fires before
    // the single-task walk is paid, not after
    g.crossJoin(broadcast(totals))
      .where(assert_true(col("__n_domain") <= lit(maxDomain),
        concat(lit("ksTest: "), col("__n_domain"),
          lit(s" pooled distinct values exceed maxDomain=$maxDomain — " +
            "the cumulative walk would serialize through one task; " +
            "coarsen the value (e.g. cents instead of micros: " +
            "round(x*100)) or raise maxDomain deliberately"))).isNull)
      .select(sum(col("nr")).over(w).as("cr"), sum(col("nc")).over(w).as("cc"),
        col("n_ref"), col("n_cur"))
      .agg(max(abs(col("cr") * col("n_cur") - col("cc") * col("n_ref")))
        .as("d_num"),
        first(col("n_ref")).as("n_ref"), first(col("n_cur")).as("n_cur"))
      .select(col("n_ref"), col("n_cur"), col("d_num"))
      .withColumn("d",
        when(col("n_ref") > lit(3000000000L) ||
            col("n_cur") > lit(3000000000L),
          raise_error(lit("ksTest: side sizes exceed the Long " +
            "exactness bound (n_ref*n_cur overflows) — route the " +
            "cross-products through DECIMAL")))
          .when(col("n_ref") === 0L || col("n_cur") === 0L, lit(null))
          .otherwise(col("d_num").cast(DoubleType) /
            (col("n_ref") * col("n_cur")).cast(DoubleType)))
      .withColumn("ks_stat",
        sqrt((col("n_ref") * col("n_cur")).cast(DoubleType) /
          (col("n_ref") + col("n_cur")).cast(DoubleType)) * col("d"))
  }

  /** COHEN'S KAPPA between two binary raters (Cohen 1960): agreement
    * beyond chance for any pair of keep/drop decisions the engine
    * produces — two quality gates, a classifier vs ground truth, two
    * dedup policies. From the 2×2 confusion counts (a = both true,
    * b = only rater 1, c = only rater 2, d = both false):
    * κ = (p_o − p_e)/(1 − p_e), computed as ONE division of exact
    * Longs — κ = (n·(a+d) − pe_num)/(n² − pe_num) with
    * pe_num = (a+b)(a+c) + (c+d)(b+d) — so the statistic is
    * order-independent and oracle-replayable; p_o and p_e are each one
    * exact-operand division for display. Rows where either rater is
    * NULL drop before counting. κ is NULL when p_e = 1 (n² = pe_num:
    * both raters constant AND agreeing — beyond-chance agreement is
    * undefined; a single constant rater yields the well-defined κ=0).
    * LOUD raise past n ~ 3e9 (n² Long bound).
    *
    * Scale shape: ONE map-side-partial aggregate to four counters —
    * nothing else. */
  def cohenKappa(df: DataFrame, rater1Col: String,
      rater2Col: String): DataFrame = {
    val r1 = col(rater1Col).cast(BooleanType)
    val r2 = col(rater2Col).cast(BooleanType)
    df.where(r1.isNotNull && r2.isNotNull)
      .agg(
        sum(when(r1 && r2, 1L).otherwise(0L)).as("a"),
        sum(when(r1 && !r2, 1L).otherwise(0L)).as("b"),
        sum(when(!r1 && r2, 1L).otherwise(0L)).as("c"),
        sum(when(!r1 && !r2, 1L).otherwise(0L)).as("d"))
      .select(col("a"), col("b"), col("c"), col("d"),
        (col("a") + col("b") + col("c") + col("d")).as("n"),
        ((col("a") + col("b")) * (col("a") + col("c")) +
          (col("c") + col("d")) * (col("b") + col("d"))).as("pe_num"))
      .select(col("n"), col("a"), col("b"), col("c"), col("d"),
        when(col("n") > lit(3000000000L),
          raise_error(lit("cohenKappa: n exceeds the Long exactness " +
            "bound (n^2 overflows) — route the chance terms through " +
            "DECIMAL")))
          .otherwise((col("a") + col("d")).cast(DoubleType) /
            col("n").cast(DoubleType)).as("po"),
        (col("pe_num").cast(DoubleType) /
          (col("n") * col("n")).cast(DoubleType)).as("pe"),
        when(col("n") * col("n") === col("pe_num"), lit(null))
          .otherwise(
            (col("n") * (col("a") + col("d")) - col("pe_num"))
              .cast(DoubleType) /
            (col("n") * col("n") - col("pe_num")).cast(DoubleType))
          .as("kappa"))
  }

  /** ROC-AUC of an integer score against a binary label, by the
    * Mann-Whitney rank-sum identity: AUC = (Σ ranks of positives −
    * n⁺(n⁺+1)/2) / (n⁺·n⁻), with AVERAGE ranks over tied scores (the
    * standard tie correction — without it an all-constant score would
    * not land at 0.5). Everything up to the final division is exact
    * Long arithmetic: doubling the average-rank formula clears the
    * ½-fractions (a tied block of `n` scores with `cum` values below
    * it has doubled average rank `2·cum + n + 1`), so
    * `u2 = Σ_blocks n⁺_block·(2·cum+n+1) − 2·n⁺·(n⁺+1)/2` and
    * `auc = u2 / (2·n⁺·n⁻)` is ONE correctly-rounded IEEE division of
    * two exact integers — order-independent, oracle-replayable.
    * The score must be integral (cent-scale doubles first — the
    * [[q_profile_sketch]]-style `round(x*100)` key): float scores
    * would make the tie blocks engine-sensitive.
    *
    * Scale shape: ONE hash aggregate collapses the corpus to its
    * distinct-score histogram (n, n⁺ per score) with map-side
    * partials; the cumulative rank walk is a window over THAT frame,
    * whose row count is the score DOMAIN, not the corpus — and since
    * the walk is an unpartitioned Window (one task sorts the domain),
    * the domain size is GUARDED like [[ksTest]]'s: a 1-row broadcast
    * carries the distinct-score count and every row entering the
    * window asserts it <= `maxDomain` (one extra slim aggregate over
    * the histogram — the price of failing loudly BEFORE the
    * serialized sort instead of after). The doubled rank sum grows
    * ~2N², exceeding Long exactness past N ~ 2.1e9 rows — guarded
    * loudly. Returns one row `(n_pos, n_neg, u2, auc)`. */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String,
      maxDomain: Long = 1L << 22): DataFrame = {
    require(maxDomain >= 1, s"maxDomain must be >= 1, got $maxDomain")
    val byScore = df
      .select(integralLong(df, scoreCol, "rocAuc").as("s"),
        col(labelCol).cast(LongType).as("y"))
      .where(col("s").isNotNull && col("y").isNotNull)
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("np"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val domain = byScore.agg(count(lit(1)).as("__n_domain"))
    byScore
      .crossJoin(broadcast(domain))
      .where(assert_true(col("__n_domain") <= lit(maxDomain),
        concat(lit("rocAuc: "), col("__n_domain"),
          lit(s" distinct scores exceed maxDomain=$maxDomain — the " +
            "rank walk would serialize through one task; coarsen the " +
            "score (e.g. round(x*100)) or raise maxDomain " +
            "deliberately"))).isNull)
      .select(col("n"), col("np"),
        (col("np") * (lit(2L) * coalesce(sum(col("n")).over(w), lit(0L)) +
          col("n") + lit(1L))).as("r2"))
      .agg(sum(col("np")).as("n_pos"),
        (sum(col("n")) - sum(col("np"))).as("n_neg"),
        sum(col("r2")).as("sum_r2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") + col("n_neg") > lit(2000000000L),
          raise_error(lit("rocAuc: row count exceeds the Long " +
            "exactness bound (sum of doubled ranks ~2N^2 overflows " +
            "past N~2.1e9) — route the rank sums through DECIMAL")))
          .otherwise(col("sum_r2") - col("n_pos") * (col("n_pos") + lit(1L)))
          .as("u2"))
      .withColumn("auc", col("u2").cast(DoubleType) /
        (lit(2L) * col("n_pos") * col("n_neg")).cast(DoubleType))
  }

  /** KAPLAN–MEIER SURVIVAL CURVE (Kaplan & Meier 1958) per group —
    * time-to-event with RIGHT CENSORING done honestly: "mean lifetime
    * of churned users" is survivorship bias (the still-active are the
    * longest-lived and get dropped); KM keeps them in the risk set
    * until their observation ends. Input is one row per subject:
    * integer `duration` and `event` (true = the event happened at
    * duration, false = censored there). Output one row per (group,
    * event time): risk-set size, events, censored-at-t, and the
    * survival estimate `S(t) = prod_{s <= t} (1 - d_s / n_s)`.
    *
    * Determinism: d/c/n are exact integer counts (the risk set is a
    * descending-time suffix sum — one integer RANGE window); the
    * survival product is a 1.0-seeded fold over event times ASCENDING
    * of `(1 - d/n)` factors — each one exact-operand division — so
    * every S(t) is one fixed expression tree the oracle replays via
    * list_reduce over a list ORDER BY time. Prefix products come from
    * folding a SLICE of the per-group sorted factor array (O(T^2)
    * work, T = distinct event times — bounded by the observation
    * horizon in days, LOUDLY guarded at 10k).
    *
    * Scale: one (group, t) count aggregate, one integer window, one
    * bounded per-group array — subject rows never shuffle twice. */
  def kaplanMeier(df: DataFrame, groupCol: String, durationCol: String,
      eventCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("grp"),
        col(durationCol).cast(LongType).as("t"),
        col(eventCol).cast(BooleanType).as("ev"))
      .where(assert_true(col("t").isNotNull && col("t") >= 0L,
        concat(lit("kaplanMeier: negative or NULL duration in group "),
          col("grp").cast(StringType))).isNull)
    val byT = base.groupBy(col("grp"), col("t"))
      .agg(sum(when(col("ev"), 1L).otherwise(0L)).as("d"),
        sum(when(!col("ev"), 1L).otherwise(0L)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("t"))
      .rangeBetween(0L, org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val withRisk = byT.select(col("grp"), col("t"), col("d"), col("c"),
      sum(col("d") + col("c")).over(w).as("n_risk"))
    val packed = withRisk
      .where(col("d") > 0L) // KM steps only at event times
      .groupBy(col("grp"))
      .agg(sort_array(collect_list(
        struct(col("t"), col("d"), col("n_risk"), col("c")))).as("steps"))
      .where(assert_true(size(col("steps")) <= lit(10000),
        concat(lit("kaplanMeier: group "), col("grp").cast(StringType),
          lit(" has more than 10k distinct event times — bucket " +
            "durations first (the O(T^2) fold contract)"))).isNull)
    packed
      .select(col("grp"), posexplode(col("steps")).as(Seq("i", "s")))
      .select(col("grp").as(groupCol), col("s.t").as("t"),
        col("s.n_risk").as("n_risk"), col("s.d").as("d"),
        col("s.c").as("c"),
        aggregate(slice(col("steps"), lit(1), col("i") + 1), lit(1.0),
          (acc, x) => acc * (lit(1.0) -
            x.getField("d").cast(DoubleType) /
              x.getField("n_risk").cast(DoubleType))).as("surv"))
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013,
    * "Improving the Sensitivity of Online Controlled Experiments by
    * Utilizing Pre-Experiment Data"): adjust each unit's experiment
    * metric by its pre-period covariate — `adj = post - theta * (pre -
    * mean_pre)` with `theta = cov(pre, post) / var(pre)` fit POOLED
    * across variants (fitting per-variant would leak the treatment
    * effect into the adjustment). The variant means of `adj` keep the
    * same expectation as `post` but with variance shrunk by corr^2 —
    * the standard way an A/B test reaches significance on a fraction
    * of the traffic.
    *
    * Determinism: the corrRegression moment recipe — exact DECIMAL
    * sums (order-free) cast once to double, then one fixed closing
    * expression tree (theta, means, corr, and `var_reduction =
    * corr * corr`) restated verbatim in the oracle. Zero pre-period
    * variance yields NULL theta/adjustment columns (nothing to adjust
    * with), not a throw — a constant covariate is a data fact.
    *
    * Scale: one pooled 1-row aggregate + one per-variant slim
    * aggregate, both map-side partial; the pooled row rides a 1-row
    * broadcast cross join. Returns one row per variant:
    * `(variant, n, mean_post, mean_adj, theta, corr, var_reduction)`. */
  def cuped(df: DataFrame, variantCol: String, preCol: String,
      postCol: String): DataFrame = {
    val x = col(preCol)
    val y = col(postCol)
    val base = df.where(x.isNotNull && y.isNotNull)
    val pooled = base.agg(
      count(lit(1)).as("n_all"),
      sum(x.cast(DecimalType(18, 6))).cast(DoubleType).as("sx"),
      sum(y.cast(DecimalType(18, 6))).cast(DoubleType).as("sy"),
      sum((x * x).cast(DecimalType(28, 10))).cast(DoubleType).as("sxx"),
      sum((x * y).cast(DecimalType(28, 10))).cast(DoubleType).as("sxy"),
      sum((y * y).cast(DecimalType(28, 10))).cast(DoubleType).as("syy"))
    val per = base.groupBy(col(variantCol).as("variant"))
      .agg(count(lit(1)).as("n"),
        sum(x.cast(DecimalType(18, 6))).cast(DoubleType).as("vx"),
        sum(y.cast(DecimalType(18, 6))).cast(DoubleType).as("vy"))
    val nAll = col("n_all").cast(DoubleType)
    val nV = col("n").cast(DoubleType)
    val denx = nAll * col("sxx") - col("sx") * col("sx")
    val deny = nAll * col("syy") - col("sy") * col("sy")
    val num = nAll * col("sxy") - col("sx") * col("sy")
    val theta = when(denx > 0, num / denx)
    val corr = when(denx > 0 && deny > 0, num / (sqrt(denx) * sqrt(deny)))
    per.crossJoin(broadcast(pooled))
      .select(col("variant"), col("n"),
        (col("vy") / nV).as("mean_post"),
        (col("vy") / nV - theta * (col("vx") / nV - col("sx") / nAll))
          .as("mean_adj"),
        theta.as("theta"),
        corr.as("corr"),
        (corr * corr).as("var_reduction"))
  }

  /** CALIBRATION CURVE + per-bin ECE contributions — "when the model
    * says 30%, does it happen 30% of the time": bucket predictions
    * into `bins` equal-width probability bins, and per bin report
    * volume, mean prediction, observed rate, the |gap|, and the bin's
    * expected-calibration-error contribution `(n / N) * gap` (ECE =
    * their plain sum). The reliability artifact read next to
    * [[rocAuc]]: AUC says the ranking is right, this says the
    * NUMBERS are right — the difference decides whether a quality
    * score can gate at a fixed threshold.
    *
    * Exactness contract: the score arrives PRE-QUANTIZED as an
    * integer `score_fp` in [0, scale] (probability * scale, the
    * lmScore fixed-point recipe — produce it with integer arithmetic,
    * e.g. `(pos * scale) div cnt`, and it stays exact at ANY corpus
    * size). Binning is pure integer arithmetic (`(score_fp * bins)
    * div scale`, clamped); per-bin sums are exact Longs with a LOUD
    * 2^53 guard; the only doubles are the final per-bin divisions.
    * One hash aggregate into <= `bins` groups, totals on a 1-row
    * broadcast. */
  def calibrationBins(df: DataFrame, scoreFpCol: String, labelCol: String,
      bins: Int, scale: Long = 1L << 20): DataFrame = {
    require(bins >= 2 && bins <= 4096,
      s"calibrationBins: bins must be in [2, 4096], got $bins")
    require(scale >= bins && scale <= (1L << 40),
      s"calibrationBins: scale must be in [bins, 2^40], got $scale")
    val sfp = col(scoreFpCol).cast(LongType)
    val base = df
      .where(assert_true(
        sfp.isNotNull && sfp >= 0L && sfp <= lit(scale),
        concat(lit(s"calibrationBins: score_fp "),
          sfp.cast(StringType),
          lit(s" outside [0, $scale] — quantize the probability as " +
            "floor(p * scale) first"))).isNull)
      .select(sfp.as("sfp"), col(labelCol).cast(LongType).as("y"))
      // integer bin arithmetic: (sfp * bins) div scale, clamped —
      // sfp*bins <= 2^40 * 2^12 = 2^52, no overflow
      .select(expr(s"CAST(least((sfp * ${bins}L) div ${scale}L, " +
        s"${bins - 1}L) AS INT)").as("bin"), col("sfp"), col("y"))
    val agg = base.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"),
        sum(col("sfp")).as("s_fp"))
      .where(assert_true(col("s_fp") <= lit(1L << 53),
        lit("calibrationBins: per-bin fixed-point sum passed the 2^53 " +
          "exactness bound — lower `scale` or raise the sum to " +
          "DECIMAL")).isNull)
      // the mean_pred denominator n*scale is a Long product — guard it
      // to the same 2^53 exactness bound (scale can sit at 2^40, so a
      // bin past ~2^13 rows would otherwise overflow the multiply with
      // a confusing ANSI error instead of this loud refusal)
      .where(assert_true(col("n") <= lit((1L << 53) / scale),
        lit("calibrationBins: per-bin row count passed the 2^53/scale " +
          "exactness bound for the n*scale denominator — lower `scale` " +
          "or split the bin")).isNull)
    val tot = base.agg(count(lit(1)).as("n_total"))
    val meanPred = col("s_fp").cast(DoubleType) /
      (col("n") * lit(scale)).cast(DoubleType)
    val obs = col("pos").cast(DoubleType) / col("n").cast(DoubleType)
    agg.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"), col("pos"),
        meanPred.as("mean_pred"), obs.as("obs_rate"),
        abs(obs - meanPred).as("gap"),
        ((col("n").cast(DoubleType) / col("n_total").cast(DoubleType)) *
          abs(obs - meanPred)).as("ece_part"))
  }
}
