package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream analytics over an immutable event log (`user_id`, `ts`,
  * `event_type`, `value`): ordered funnels, per-entity time-series
  * gap-filling with carry-forward + rolling windows, and population
  * z-score outlier flagging.
  *
  * These are batch analogues of what the reference pipeline's users do
  * downstream of it (the reference itself is a record-at-a-time
  * transformer with no temporal or cross-row surface — SURVEY §2.3);
  * they are part of the large-scale-pipeline extension mandated by the
  * brief.
  *
  * Scale notes (100 TB):
  *  - [[funnel]] is ONE shuffle on the user key; the per-user state is a
  *    sorted (ts, type) array of only the funnel-relevant events
  *    (filtered before the shuffle), folded with a codegen-friendly
  *    higher-order `aggregate` — no self-joins, no per-stage passes.
  *  - [[gapFillDaily]]'s only large exchange is the first (user, day)
  *    pre-aggregation (map-side partial); everything downstream operates
  *    on the |users| x |days| daily grid, orders of magnitude smaller
  *    than the event log.
  *  - [[zScoreOutliers]] aggregates per-key moments (tiny frame),
  *    broadcasts them back, and flags rows in a narrow codegen'd scan —
  *    the event log is read, not shuffled.
  */
object EventAnalytics {

  /** LOUD per-key cardinality guard for the per-entity sequence family
    * ([[funnel]], [[ewmaSmooth]], [[transitionMatrix]]): each of those
    * materializes one entity's events as a sorted array (or sorts them
    * in one window partition), under a documented per-key-cardinality
    * contract — at 100 TB a single hot entity (bot traffic, a null-ish
    * sentinel key) would OOM an executor SILENTLY. With
    * `maxEventsPerKey` set, the violated contract instead fails the
    * job with the offending key and its count in the error message —
    * a diagnosable failure instead of an executor autopsy. The check
    * is an `assert_true` over a count that rides the operator's
    * EXISTING exchange (the array size / a same-partition window
    * count): no extra pass, no extra shuffle. */
  private def guardMaxEvents(df: DataFrame, key: Column, n: Column,
      max: Option[Long], op: String): DataFrame = max match {
    case None => df
    case Some(m) =>
      require(m >= 1, s"maxEventsPerKey must be >= 1, got $m")
      df.where(assert_true(n <= m,
        concat(lit(s"$op: key "), key.cast(StringType),
          lit(" holds "), n.cast(StringType),
          lit(s" events, over maxEventsPerKey=$m — a hot key this size " +
            "would OOM an executor at scale; filter it (bot traffic?) " +
            "or raise the cap"))).isNull)
  }

  /** Ordered windowed funnel: for each user, walk the user's events in
    * timestamp order and record the time each `stages(i)` is first
    * reached, where stage i+1 must occur STRICTLY after stage i and
    * within `maxGapSeconds` of it. Returns one row per user holding any
    * of the stage events: (`userCol`, `stage_ts` array, `depth`).
    *
    * `depth` is the number of stages reached; only funnel ENTRANTS
    * (users who reached the first stage, depth >= 1) are returned — the
    * entry check is a cheap flag computed in the same aggregate, NOT a
    * post-hoc filter on `depth` (which Catalyst would push through the
    * projection and re-evaluate the whole fold for). Equivalent to the
    * cascaded "min(ts) where ts in (prev, prev+gap]" SQL formulation:
    * the fold takes the FIRST qualifying event in sorted order, which
    * is exactly the minimum of the qualifying set.
    *
    * Per-key contract: one user's stage-relevant events must fit an
    * executor's working memory (they collect into one sorted array).
    * Set `maxEventsPerKey` to turn a violation into a loud failure
    * naming the hot key — see [[guardMaxEvents]].
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String], maxGapSeconds: Long,
      maxEventsPerKey: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size,
      s"funnel stages must be distinct, got $stages")
    require(maxGapSeconds > 0, s"maxGapSeconds must be positive, got $maxGapSeconds")
    val nStages = stages.length
    val stageLits = array(stages.map(lit): _*)
    val perUser = events
      .filter(col(typeCol).isin(stages: _*))
      .groupBy(col(userCol))
      .agg(array_sort(collect_list(struct(col(tsCol).as("ts"),
        col(typeCol).as("et")))).as("evs"),
        max(when(col(typeCol) === stages.head, 1).otherwise(0))
          .as("has_first"))
      // guard BEFORE the entrant filter: a hot key that never reached
      // stage 1 still collected its array and must still be named
      .transform(guardMaxEvents(_, col(userCol), size(col("evs")),
        maxEventsPerKey, "funnel"))
      .where(col("has_first") === 1)
    // Fold the sorted events into the achieved-stage timestamp array.
    // `get(acc, size-1)` (not element_at) so the empty-acc probe yields
    // null instead of an ANSI out-of-bounds error; `null > x` is null,
    // and the leading size(acc)===0 disjunct makes the condition true.
    val prevTs = (acc: org.apache.spark.sql.Column) => get(acc, size(acc) - 1)
    val folded = perUser.select(col(userCol),
      aggregate(col("evs"),
        lit(Array.empty[java.sql.Timestamp]).cast(ArrayType(TimestampType)),
        (acc, e) => when(
          size(acc) < nStages &&
            e.getField("et") === element_at(stageLits, size(acc) + 1) &&
            (size(acc) === 0 ||
              (e.getField("ts") > prevTs(acc) &&
                e.getField("ts") <= prevTs(acc) + expr(s"INTERVAL '$maxGapSeconds' SECOND"))),
          concat(acc, array(e.getField("ts")))).otherwise(acc)).as("stage_ts"))
    folded.select(col(userCol), col("stage_ts"),
      size(col("stage_ts")).as("depth"))
  }

  /** Daily per-entity time series with gaps filled: aggregate
    * `valueCol` per (`userCol`, day), then for each user emit EVERY day
    * between that user's first and last active day, carrying the last
    * seen daily sum forward across gaps and computing a trailing
    * `windowDays`-day rolling mean (gap days count as zero).
    *
    * Sums route through DECIMAL(18,6) so accumulation is exact and
    * order-independent (identical whatever partition order either
    * engine sums in); the rolling mean divides the exact decimal sum by
    * the frame row count in one IEEE double divide.
    *
    * Output: user day (yyyy-MM-dd string), n_events, day_sum (null on
    * gap days), carry_sum (last non-null daily sum), rollN_avg.
    */
  def gapFillDaily(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be positive, got $windowDays")
    val dec = DecimalType(18, 6)
    val daily = events
      .groupBy(col(userCol), to_date(col(tsCol)).as("day"))
      .agg(sum(col(valueCol).cast(dec)).as("dsum"),
        count(lit(1)).as("n_events"))
    val span = daily.groupBy(col(userCol))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = span.select(col(userCol),
      explode(sequence(col("d0"), col("d1"))).as("day"))
    val filled = grid.join(daily, Seq(userCol, "day"), "left")
    val w = Window.partitionBy(col(userCol)).orderBy(col("day"))
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRoll = w.rowsBetween(-(windowDays - 1), Window.currentRow)
    filled.select(
      col(userCol),
      date_format(col("day"), "yyyy-MM-dd").as("day"),
      coalesce(col("n_events"), lit(0L)).as("n_events"),
      col("dsum").cast(DoubleType).as("day_sum"),
      last(col("dsum"), ignoreNulls = true).over(wAll)
        .cast(DoubleType).as("carry_sum"),
      (sum(coalesce(col("dsum"), lit(0).cast(dec))).over(wRoll).cast(DoubleType) /
        count(lit(1)).over(wRoll)).as(s"roll${windowDays}_avg"))
  }

  /** Batch sessionization (gaps-and-islands): per user, a new session
    * starts at the first event and whenever the gap since the previous
    * event EXCEEDS `gapSeconds` (a gap of exactly `gapSeconds` stays in
    * the session — same closed-boundary convention as the streaming
    * session windows). Returns one row per session: (`userCol`,
    * `session_idx` 1-based, `n_events`, `start_us`, `end_us`).
    *
    * All arithmetic is integer (epoch-microsecond diffs, counts), so
    * the oracle replays it exactly. Scale shape: ONE shuffle on the
    * user key + an in-partition sort for the lag/cumsum window; the
    * session summary then aggregates the already-slim (user, session)
    * rows (its exchange carries one row per event, combinable
    * map-side, and at 100 TB is dominated by the window exchange). */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val us = unix_micros(col(tsCol))
    val isNew = when(lag(us, 1).over(w).isNull ||
      us - lag(us, 1).over(w) > gapSeconds * 1000000L, 1L).otherwise(0L)
    events
      .withColumn("__new", isNew)
      .withColumn("session_idx",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(us).as("start_us"), max(us).as("end_us"))
  }

  /** Population z-score outliers: per `keyCol`, exact first/second
    * moments of `valueCol` (DECIMAL-routed, order-independent), then
    * each row scores `z = (v - mean) / stddev_pop` and rows with
    * `|z| > threshold` survive. The moments frame is tiny (one row per
    * key) and is broadcast back onto the event scan — the log itself
    * never shuffles. All post-aggregate arithmetic is IEEE double with
    * a fixed evaluation order, reproduced verbatim by the oracle. */
  def zScoreOutliers(events: DataFrame, idCol: String, keyCol: String,
      valueCol: String, threshold: Double): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val stats = events.groupBy(col(keyCol)).agg(
      count(col(valueCol)).as("n"),
      sum(col(valueCol).cast(DecimalType(18, 6))).cast(DoubleType).as("s"),
      sum((col(valueCol) * col(valueCol)).cast(DecimalType(28, 10)))
        .cast(DoubleType).as("sq"))
    val mean = col("s") / col("n")
    val std = sqrt(col("sq") / col("n") - (col("s") / col("n")) * (col("s") / col("n")))
    // A constant key has std 0; its rows have no meaningful z (and ANSI
    // mode would raise DIVIDE_BY_ZERO) — null z, dropped by the filter.
    events.join(broadcast(stats), keyCol)
      .select(col(idCol), col(keyCol), col(valueCol),
        when(std > 0, (col(valueCol) - mean) / std).as("z"))
      .where(abs(col("z")) > threshold)
  }

  /** First-order Markov transition matrix of `typeCol` per entity: for
    * every consecutive event pair inside a key (in `(tsCol, tieCol)`
    * order — the tie column makes the sequence total, so the matrix is
    * deterministic even under equal timestamps), count `from -> to`
    * and the row-conditional probability `n / n_from` (one IEEE
    * division of exact counts). The user-journey summary that funnels
    * (fixed stage lists) and association rules (unordered baskets)
    * don't capture: where do users actually GO next.
    *
    * Scale shape: ONE hash exchange + partition sort for the single
    * lead window on the entity key (the sessionize shape); everything
    * after operates on the |types|² count frame, with the per-from
    * totals broadcast back.
    *
    * Rows with a NULL `tsCol` or `tieCol` are EXCLUDED: a null has no
    * position in a sequence, and keeping it would make the pair order
    * depend on the engine's null-sort default (Spark windows order
    * nulls first, DuckDB's ORDER BY orders them last — the [[ewmaSmooth]]
    * cross-engine trap).
    *
    * Per-key contract: one key's events are sorted inside one window
    * partition; `maxEventsPerKey` turns a hot key into a loud failure
    * via a count over the SAME window partition (shares the exchange
    * and the sort) — see [[guardMaxEvents]]. */
  def transitionMatrix(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, typeCol: String,
      maxEventsPerKey: Option[Long] = None): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val tr = events
      .where(col(tsCol).isNotNull && col(tieCol).isNotNull)
      .select(col(keyCol), col(tsCol), col(tieCol),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .transform { df =>
        // window exprs can't sit in a Filter — materialize the count,
        // guard, drop (only when the guard is requested at all)
        if (maxEventsPerKey.isEmpty) df
        else guardMaxEvents(
          df.withColumn("__n",
            count(lit(1)).over(Window.partitionBy(col(keyCol)))),
          col(keyCol), col("__n"), maxEventsPerKey, "transitionMatrix")
          .drop("__n")
      }
      .where(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = tr.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    tr.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        (col("n").cast(DoubleType) / col("n_from").cast(DoubleType))
          .as("prob"))
  }

  /** Association rules over baskets (the Apriori 1- and 2-itemset
    * layer): for every unordered item pair, its co-occurrence support
    * plus directed confidences and the LIFT
    * `n_xy * n_baskets / (n_x * n_y)` — exact-count casts and single
    * IEEE divisions, the [[TextAnalysis.collocations]] recipe on
    * transactional data (log2-free: lift ranks identically to PMI).
    * A basket is one distinct combination of `basketCols`; items are
    * the DISTINCT `itemCol` values inside it.
    *
    * Scale shape: one exchange for the (basket, item) distinct
    * (map-side partial dedup); the pair scan joins that slim frame
    * with itself ON THE BASKET KEY — fanout bounded by items-per-
    * basket squared, never corpus²; item supports and the 1-row basket
    * total broadcast back onto the (small) pair-count frame. */
  def associationRules(df: DataFrame, basketCols: Seq[String],
      itemCol: String): DataFrame = {
    require(basketCols.nonEmpty, "need at least one basket column")
    // NULL basket-key rows are excluded like NULL items: the pair
    // self-join compares baskets via struct equality, which treats NULL
    // components as EQUAL — keeping them would double-count pairs
    // relative to the documented per-column-equality SQL semantics.
    val bi = df
      .where(basketCols.map(col(_).isNotNull).reduce(_ && _))
      .select(struct(basketCols.map(col): _*).as("__b"),
        col(itemCol).as("item"))
      .where(col("item").isNotNull)
      .distinct()
    val nBaskets = bi.select(col("__b")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemCnt = bi.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val pairs = bi.as("x").join(bi.as("y"),
        col("x.__b") === col("y.__b") && col("x.item") < col("y.item"))
      .groupBy(col("x.item").as("item_a"), col("y.item").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(itemCnt.select(col("item").as("item_a"),
        col("n_item").as("n_a"))), Seq("item_a"))
      .join(broadcast(itemCnt.select(col("item").as("item_b"),
        col("n_item").as("n_b"))), Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
        col("n_ab"), col("n_baskets"),
        (col("n_ab").cast(DoubleType) / col("n_baskets").cast(DoubleType))
          .as("support"),
        (col("n_ab").cast(DoubleType) / col("n_a").cast(DoubleType))
          .as("conf_a_to_b"),
        (col("n_ab").cast(DoubleType) / col("n_b").cast(DoubleType))
          .as("conf_b_to_a"),
        ((col("n_ab") * col("n_baskets")).cast(DoubleType) /
          (col("n_a") * col("n_b")).cast(DoubleType)).as("lift"))
  }

  /** Per-entity exponentially-weighted moving average of `valueCol` in
    * `tsCol` order: `s_1 = x_1`, `s_t = (1-alpha)*s_{t-1} + alpha*x_t`
    * — the standard trend smoother, reduced per key to its FINAL
    * smoothed level (the "current state" a monitor compares new events
    * against). An EWMA is inherently sequential, so it cannot be a
    * partition-parallel aggregate; instead each key's events collect
    * into ONE sorted array (the [[funnel]] shape: one exchange on the
    * key, per-key cardinality is the caller's contract) and fold left
    * in `(ts, value)` order. The fold's operation order is fixed —
    * `acc * (1-alpha) + x * alpha`, two multiplies one add per step —
    * so the result is bit-identical on any partitioning and the oracle
    * replays it as the same left fold (pick `alpha` with an exact
    * binary representation, e.g. 0.25, and the *constants* are
    * bit-identical too). Returns `(keyCol, n_events, ewma)`.
    *
    * Rows with a NULL timestamp are EXCLUDED (alongside NULL values):
    * a null has no position in a sequence, and leaving it in would pin
    * the fold order to one engine's null-sort default (Spark's
    * array_sort is nulls-first, DuckDB's ORDER BY is nulls-last — a
    * silent cross-engine divergence).
    *
    * Per-key contract: one key's events must fit an executor's working
    * memory; `maxEventsPerKey` makes a violation loud — see
    * [[guardMaxEvents]]. */
  def ewmaSmooth(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, alpha: Double,
      maxEventsPerKey: Option[Long] = None): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val grouped = events
      .where(col(valueCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(col(tsCol).as("t"),
        col(valueCol).as("v")))).as("xs"))
      .transform(guardMaxEvents(_, col(keyCol), size(col("xs")),
        maxEventsPerKey, "ewmaSmooth"))
      .select(col(keyCol), size(col("xs")).cast(LongType).as("n_events"),
        transform(col("xs"), x => x.getField("v")).as("vs"))
    grouped.select(col(keyCol), col("n_events"),
      aggregate(
        slice(col("vs"), lit(2), greatest(size(col("vs")) - 1, lit(0))),
        element_at(col("vs"), 1),
        (acc, x) => acc * lit(1.0 - alpha) + x * lit(alpha)).as("ewma"))
  }

  /** TIME-DECAYED activity per key — the recency-weighted rollup a
    * monitor ranks "currently active" entities by: each event
    * contributes `2^-b`, where `b = (refDay - day) div halfLifeDays`
    * (full half-lives elapsed — STEPWISE decay, one step per
    * half-life, the deliberately-exact approximation of `2^(-age/hl)`:
    * a per-day decay factor is irrational and a libm `pow` replays
    * differently across engines — the repo's standing log/pow ban).
    * Weights are applied as integer fixed point, `2^(S - b)` with
    * `S = maxHalfLives`, summed EXACTLY (long for counts, DECIMAL for
    * the value-weighted sum — order/partition independent), and
    * divided back by `2^S` in one fixed-order IEEE step, so the
    * doubles are bit-identical on any partitioning and any engine.
    * Events older than `maxHalfLives` half-lives (weight < 2^-S) and
    * events after `refDay` are excluded.
    *
    * Returns `(keyCol, n_events, decayed_n, decayed_sum)` — raw count,
    * decayed count, decayed sum of `valueCol` (same units as
    * `valueCol`). One aggregate exchange with map-side partials; the
    * log never shuffles raw rows beyond it. `dayCol`/`valueCol`
    * integral (fixed-point doubles first). */
  def decayedAgg(events: DataFrame, keyCol: String, dayCol: String,
      valueCol: String, refDay: Long, halfLifeDays: Long,
      maxHalfLives: Int = 32): DataFrame = {
    require(halfLifeDays > 0, s"halfLifeDays must be positive, got $halfLifeDays")
    require(maxHalfLives >= 1 && maxHalfLives <= 62,
      s"maxHalfLives must be in [1, 62], got $maxHalfLives")
    val b = expr(s"($refDay - `$dayCol`) div ${halfLifeDays}L")
    val wfp = call_function("shiftleft", lit(1L),
      (lit(maxHalfLives) - b).cast(IntegerType))
    val scale = math.pow(2.0, maxHalfLives) // exact: a power of two
    events
      .where(col(dayCol).isNotNull && col(dayCol) <= refDay &&
        b < maxHalfLives)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        // DECIMAL like sfp, not a plain long sum: recent events weigh
        // up to 2^maxHalfLives each, so ~2^31 same-key recent events
        // would silently wrap a BIGINT accumulator (Spark sums
        // non-ANSI) while the oracle sums wide — the overflow would
        // surface only as an opaque hash mismatch.
        sum(wfp.cast(DecimalType(38, 0))).as("nfp"),
        sum(col(valueCol).cast(DecimalType(38, 0)) * wfp).as("sfp"))
      .select(col(keyCol), col("n_events"),
        (col("nfp").cast(DoubleType) / lit(scale)).as("decayed_n"),
        (col("sfp").cast(DoubleType) / lit(scale)).as("decayed_sum"))
  }

  /** Cohort retention matrix: bucket activity into fixed periods of
    * `bucketUs` epoch-micros, cohort each user by their FIRST active
    * period, and count how many of each cohort's users are active
    * again `period_offset` periods later. The classic growth-analytics
    * rollup (cohort x offset grid with a retention rate against the
    * offset-0 cohort size); callers pick the cohorting event by
    * pre-filtering (e.g. `event_type = 'purchase'` for purchase
    * retention).
    *
    * Scale shape (100 TB event log):
    *  1. the only corpus-sized exchange is the (user, period) DISTINCT
    *     — map-side partial dedup collapses each user's events per
    *     partition before anything shuffles;
    *  2. cohorting is a min-aggregate + self-join on the user key over
    *     that already-slim activity frame (orders of magnitude smaller
    *     than the log: one row per user-period);
    *  3. the final grid aggregate needs COUNT(*), not COUNT(DISTINCT):
    *     rows are unique per (user, period) by construction, so the
    *     cohort cell count gets map-side partials and no Expand;
    *  4. cohort sizes come from the grid's own offset-0 slice (one row
    *     per cohort) joined back via broadcast — no second pass over
    *     anything big.
    * `retention` is ONE IEEE division of two exact longs — bit-exact
    * across engines, no rounding needed. */
  def retentionCohorts(events: DataFrame, userCol: String, usCol: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val activity = events
      .select(col(userCol).as("__u"),
        // integer `div`, NOT `/` (which widens longs to double)
        expr(s"`$usCol` div ${bucketUs}L").as("__p"))
      .where(col("__u").isNotNull && col("__p").isNotNull)
      .distinct()
    val cohorts = activity.groupBy(col("__u"))
      .agg(min(col("__p")).as("cohort"))
    val grid = activity.join(cohorts, "__u")
      .groupBy(col("cohort"), (col("__p") - col("cohort")).as("period_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = grid.where(col("period_offset") === 0)
      .select(col("cohort"), col("n_active").as("n_cohort"))
    grid.join(broadcast(sizes), "cohort")
      .select(col("cohort"), col("period_offset"), col("n_active"),
        col("n_cohort"),
        (col("n_active").cast(DoubleType) / col("n_cohort").cast(DoubleType))
          .as("retention"))
  }

  /** FIRST/LAST-TOUCH conversion attribution — the credit-assignment
    * step after [[funnel]] measures whether users convert at all: for
    * every conversion event, which touch (ad view, click, referral —
    * any `touchTypes` member) within the trailing `lookbackUs`
    * micros window gets the credit? Emits one row per conversion with
    * the first and last qualifying touch's type and timestamp plus the
    * touch count — feed a groupBy over the channels for the campaign
    * report. No RNG, no position fractions (linear/U-shaped models
    * need per-touch credit SPLITTING — a different output grain;
    * first/last are the two models every attribution system starts
    * with, and both are exact here).
    *
    * Shape: ONE key exchange + partition sort shared by two RANGE
    * frames over the SAME window spec (Spark fuses them into a single
    * Window operator — the q_rank_suite discipline): per conversion,
    * `min/max(struct(touch_us, type))` over `[ts - lookbackUs, ts]`
    * picks the first/last touch in one pass — no self-join, no
    * per-conversion re-scan; equal-timestamp touches tie-break on the
    * type string lexicographically (max: later name wins; min:
    * earlier), identical in both engines. Same per-user-cardinality
    * contract as [[sessionize]]; conversions with no touch in the
    * window emit NULL channel (count them — a high null share means
    * the lookback is too short or tracking is broken). */
  def attribution(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, touchTypes: Seq[String], convType: String,
      lookbackUs: Long): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(!touchTypes.contains(convType),
      s"conversion type $convType cannot also be a touch type")
    require(lookbackUs > 0, s"lookbackUs must be positive, got $lookbackUs")
    val us = unix_micros(col(tsCol))
    val isTouch = col(typeCol).isInCollection(touchTypes)
    val w = Window.partitionBy(col(userCol)).orderBy(us)
      .rangeBetween(-lookbackUs, 0L)
    val touchStruct = when(isTouch,
      struct(us.as("t_us"), col(typeCol).as("ch")))
    events
      // one projection: all three expressions share the window spec, so
      // they land in ONE Window operator (separate withColumns plan one
      // Window each — the q_rank_suite lesson)
      .select(col(userCol), col(typeCol), us.as("__us"),
        min(touchStruct).over(w).as("__first"),
        max(touchStruct).over(w).as("__last"),
        count(when(isTouch, lit(1))).over(w).as("__n_touches"))
      .where(col(typeCol) === convType)
      .select(col(userCol), col("__us").as("conv_us"),
        col("__first.ch").as("first_channel"),
        col("__first.t_us").as("first_us"),
        col("__last.ch").as("last_channel"),
        col("__last.t_us").as("last_us"),
        col("__n_touches").as("n_touches"))
  }

  /** TRAILING-WINDOW RATE-SPIKE MONITOR — the per-day burst detector
    * completing the growth family ([[graft.SparkEntry]] q_trending
    * compares two fixed halves; [[decayedAgg]] smooths with exponential
    * forgetting; THIS flags the day a key's rate jumps over its own
    * trailing baseline — the on-call question "which keys just went
    * hot, and when"). Per active (key, day): `lift = (n + 1) /
    * (mean_prev + 1)` against the mean over the FIXED trailing
    * `windowDays` (absent days count 0 — a key active once a week must
    * not look flat), Laplace-smoothed so fresh keys rank high but
    * bounded. Computed as ONE division of exact integers,
    * `(n+1)·W / (sum_prev + W)` — bit-replayable; spikes are only
    * evaluated on ACTIVE days (a spike requires activity; silent keys
    * are [[gapFillDaily]]'s domain).
    *
    * Scale shape: one (key, day) count aggregate with map-side
    * partials — the only pass over the raw log — then a slim
    * count-row self-join banded on the day range (rows = active
    * (key, day) pairs, never events) and one aggregate back to
    * per-(key, day). Returns (key, day, n, sum_prev, lift); bound the
    * output with a TakeOrderedAndProject top-k downstream. */
  def rateSpikes(events: DataFrame, keyCol: String, dayCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val counts = events
      .groupBy(col(keyCol).as("key"), col(dayCol).as("day"))
      .agg(count(lit(1)).as("n"))
    counts.as("a")
      .join(counts.as("b"),
        col("b.key") === col("a.key") &&
          col("b.day").between(col("a.day") - windowDays, col("a.day") - 1),
        "left")
      .groupBy(col("a.key").as(keyCol), col("a.day").as(dayCol),
        col("a.n").as("n"))
      .agg(coalesce(sum(col("b.n")), lit(0L)).as("sum_prev"))
      .select(col(keyCol), col(dayCol), col("n"), col("sum_prev"),
        ((col("n") + lit(1L)) * lit(windowDays.toLong)).cast(DoubleType)
          ./((col("sum_prev") + lit(windowDays.toLong)).cast(DoubleType))
          .as("lift"))
  }

  /** LINEAR-INTERPOLATION gap fill — [[gapFillDaily]]'s carry-forward
    * is a step function; for rates and balances the straight line
    * between the surrounding observations is the honest fill. Per key,
    * build the integer day spine [min observed, max observed], fill
    * interior gaps with
    * `v_prev + (v_next − v_prev)·(d − d_prev)/(d_next − d_prev)` —
    * every operand an exact integer-to-double cast and every operation
    * correctly rounded in a FIXED parenthesized order, so the filled
    * value is deterministic cross-engine (`valCol` must be integral —
    * cent-scale first). Spine endpoints are observed by construction,
    * so every gap is interior: `filled` is never NULL. `observed`
    * keeps the raw value (NULL on filled days) as the audit column.
    *
    * Scale shape: ONE (key, day) aggregate with map-side partials,
    * a per-key spine explode (|days-per-key| rows), and TWO
    * key-partitioned windows (previous/next non-null neighbor) over
    * the daily frame — never the event stream. */
  def interpolateDaily(df: DataFrame, keyCol: String, dayCol: String,
      valCol: String): DataFrame = {
    val daily = df
      .groupBy(col(keyCol).as("key"), col(dayCol).cast(LongType).as("day"))
      .agg(sum(col(valCol).cast(LongType)).as("v"))
    val span = daily.groupBy(col("key"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = span.select(col("key"),
      explode(sequence(col("d0"), col("d1"))).as("day"))
    val joined = grid.join(daily, Seq("key", "day"), "left")
    val wPrev = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    joined.select(col("key"), col("day"), col("v"),
        last(col("v"), ignoreNulls = true).over(wPrev).as("vp"),
        last(when(col("v").isNotNull, col("day")), ignoreNulls = true)
          .over(wPrev).as("dp"),
        first(col("v"), ignoreNulls = true).over(wNext).as("vn"),
        first(when(col("v").isNotNull, col("day")), ignoreNulls = true)
          .over(wNext).as("dn"))
      .select(col("key").as(keyCol), col("day"), col("v").as("observed"),
        when(col("v").isNotNull, col("v").cast(DoubleType))
          .otherwise(col("vp").cast(DoubleType) +
            (col("vn") - col("vp")).cast(DoubleType) *
              ((col("day") - col("dp")).cast(DoubleType) /
                (col("dn") - col("dp")).cast(DoubleType)))
          .as("filled"))
  }

  /** GINI CONCENTRATION per group — "how concentrated is the mass
    * across keys?" (spend across users, tokens across sources,
    * training mass across shards): the dataset-card inequality number.
    * For per-key non-negative integer masses x₁ ≤ … ≤ xₙ (ascending),
    * G = (2·Σ i·xᵢ − (n+1)·Σx)/(n·Σx) — 0 when uniform, → 1−1/n when
    * one key holds everything. The index-weighted sum over a TIED run
    * of equal x is invariant to the order within the run (same x times
    * a fixed index block), so G is deterministic with no tie-break,
    * and everything up to the one closing division is exact Long
    * arithmetic (`valueCol` must be integral — cent-scale first).
    * G is NULL when the group's total mass is 0.
    *
    * Scale shape: ONE (group, key) map-side-partial sum collapses the
    * events, then the rank window runs over the per-key AGGREGATE
    * partitioned by group — |keys-per-group| rows, never the event
    * stream — and one final per-group fold. Σ i·xᵢ ≤ n·Σx: LOUD raise
    * when n·Σx exceeds the Long bound. */
  def giniByGroup(df: DataFrame, groupCol: String, keyCol: String,
      valueCol: String): DataFrame = {
    val perKey = df
      .groupBy(col(groupCol).as("grp"), col(keyCol).as("key"))
      .agg(sum(col(valueCol).cast(LongType)).as("x"))
    val w = Window.partitionBy(col("grp")).orderBy(col("x"), col("key"))
    perKey
      .select(col("grp"), col("x"),
        (row_number().over(w).cast(LongType) * col("x")).as("ix"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_keys"), sum(col("x")).as("total"),
        sum(col("ix")).as("sum_ix"))
      .select(col("grp"), col("n_keys"), col("total"),
        when(col("n_keys") * col("total") > lit(4000000000000000000L),
          raise_error(lit("giniByGroup: n*total exceeds the Long " +
            "exactness bound — rescale the value or route through " +
            "DECIMAL")))
          .when(col("total") === 0L, lit(null))
          .otherwise(
            (lit(2L) * col("sum_ix") - (col("n_keys") + lit(1L)) *
              col("total")).cast(DoubleType) /
            (col("n_keys") * col("total")).cast(DoubleType))
          .as("gini"))
  }

  /** ADDITIVE SEASONAL DECOMPOSITION of per-key daily totals —
    * `value = trend + seasonal + resid`, the monitoring view that
    * separates "traffic grew" (trend) from "it's Saturday" (seasonal)
    * from "something broke" (resid). Raw day-over-day deltas alarm
    * every weekend; [[rateSpikes]]' lift is the burst RATIO view —
    * the residual here is the seasonally-honest LEVEL alarm.
    *
    *  - trend: centered ±`halfWin`-day moving average via ONE RANGE
    *    window over the integer day — exact Long sums, one division
    *    per row; day gaps shrink the window honestly (average over
    *    PRESENT days) instead of fabricating zero days.
    *  - seasonal: weekday (`day % 7`) mean minus the key's grand
    *    mean, both exact-integer sums with one division each — the
    *    classic means-based additive index, computed from RAW values
    *    rather than the detrended series BY DESIGN: a detrended mean
    *    would sum doubles in partition order (nondeterministic);
    *    with a near-stationary trend the two agree, and the raw form
    *    replays bit-for-bit (documented simplification).
    *  - resid = `(v - trend) - seasonal` in that fixed order.
    *
    * `valCol` must be integral (cent-scale first — the house rule).
    * Scale: one (key, day) aggregate, one RANGE window per key
    * (partitions bounded by the day span, never the event stream),
    * and two slim per-key aggregate joins that broadcast (keys here
    * are monitored series — event types, sources — not users). */
  def seasonalDecompose(events: DataFrame, keyCol: String, dayCol: String,
      valCol: String, halfWin: Int = 3): DataFrame = {
    require(halfWin >= 1 && halfWin <= 45,
      s"seasonalDecompose: halfWin must be in [1, 45], got $halfWin")
    val daily = events
      .groupBy(col(keyCol).as("key"), col(dayCol).as("day"))
      .agg(sum(col(valCol)).as("v"))
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
      .rangeBetween(-halfWin, halfWin)
    // both window expressions in ONE projection (single Window node)
    val trended = daily.select(col("key"), col("day"), col("v"),
      (sum(col("v")).over(w).cast(DoubleType) /
        count(lit(1)).over(w).cast(DoubleType)).as("trend"),
      pmod(col("day"), lit(7)).as("wd"))
    val wk = daily
      .groupBy(col("key"), pmod(col("day"), lit(7)).as("wd"))
      .agg(sum(col("v")).as("sw"), count(lit(1)).as("cw"))
    val g = daily.groupBy(col("key"))
      .agg(sum(col("v")).as("sg"), count(lit(1)).as("cg"))
    val seasonal =
      col("sw").cast(DoubleType) / col("cw").cast(DoubleType) -
        col("sg").cast(DoubleType) / col("cg").cast(DoubleType)
    trended
      .join(broadcast(wk), Seq("key", "wd"))
      .join(broadcast(g), Seq("key"))
      .select(col("key").as(keyCol), col("day").as(dayCol), col("v"),
        col("trend"), seasonal.as("seasonal"),
        ((col("v").cast(DoubleType) - col("trend")) - seasonal)
          .as("resid"))
  }
}
