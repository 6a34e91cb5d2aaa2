package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders,
  SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Stateful Structured-Streaming operators for the ingest side of a
  * training-data pipeline: event-time windowed statistics, gap
  * sessionization, watermark-bounded streaming dedup, and custom
  * per-key state via `flatMapGroupsWithState`.
  *
  * The reference engine is deliberately stateless (SURVEY §2.3:
  * watermarks/windows/state ABSENT); these are the Spark-native
  * extensions the brief mandates. Every op here works on BOTH a
  * streaming frame (`readStream`, where the watermark bounds state) and
  * a batch frame (`withWatermark` is a no-op in batch) — which is how
  * the driver's DuckDB oracle verifies the window semantics while the
  * ScalaTest suite exercises true incremental execution via
  * MemoryStream.
  *
  * Scale notes: windowed/session aggregation shuffles once on
  * (window, key) with map-side partials; state size is bounded by the
  * watermark horizon x key cardinality, and late data beyond the
  * watermark is dropped instead of growing state without bound. The
  * streaming dedup keeps only ids inside the watermark horizon.
  */
object StreamOps {

  /** Event-time tumbling (or sliding, if `slide` is given) windowed
    * count + sum per key. Emits `(win_start, win_end, key, n, total)`. */
  def windowedAgg(df: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, windowDur: String, slide: Option[String] = None,
      watermarkDelay: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur, slide.getOrElse(windowDur)),
        col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col(keyCol), col("n"), col("total"))

  /** Gap-based sessionization: events of one key closer than `gap`
    * merge into one session row `(sess_start, sess_end, key, n)`. */
  def sessionAgg(df: DataFrame, tsCol: String, keyCol: String,
      gap: String, watermarkDelay: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col(keyCol), col("n"))

  /** Watermarked stream-stream interval join: per key, pairs each left
    * row with the right rows whose event time falls in
    * `[leftTs + lowerSec, leftTs + upperSec]` (seconds; negative lower
    * = lookback) — the streaming analogue of
    * [[graft.ops.RangeJoin.intervalJoin]] for ingest-time enrichment
    * (purchase <- clicks in the preceding hour, sensor alignment).
    *
    * The time-range predicate lives IN the join condition as foldable
    * interval arithmetic, which is what lets Spark derive a state
    * eviction bound from the watermarks: each side keeps only rows
    * inside `watermark + |bound|`, so state is bounded by arrival rate
    * x (delay + window), not by stream length. Right payload columns
    * are emitted as `right_<name>` (batch RangeJoin convention); the
    * join also runs on batch frames unchanged (watermark is a no-op).
    *
    * `joinType` may be "left_outer": left rows with no right row in
    * their interval emit once with null right columns — Structured
    * Streaming supports outer stream-stream joins exactly because the
    * watermark + interval bound tells it when a left row can no longer
    * match and must be null-emitted (an unbounded condition would have
    * to hold every left row forever). */
  def streamingIntervalJoin(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, lowerSec: Long, upperSec: Long,
      watermarkDelay: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    require(upperSec >= lowerSec, s"upper ($upperSec) < lower ($lowerSec)")
    require(Set("inner", "left_outer").contains(joinType),
      s"joinType must be inner or left_outer, got $joinType")
    val rPayload = right.columns.filterNot(_ == keyCol)
    val reserved = "__rkey" +: rPayload.map(c => s"right_$c")
    val clashes = left.columns.toSet.intersect(reserved.toSet)
    require(clashes.isEmpty,
      s"left side already has column(s) ${clashes.mkString(", ")} — rename them")

    val lw = left.withWatermark(tsCol, watermarkDelay)
    val rw = right.select(
        (col(keyCol).as("__rkey") +:
          rPayload.map(c => col(c).as(s"right_$c")).toIndexedSeq): _*)
      .withWatermark(s"right_$tsCol", watermarkDelay)
    // bounds as `ts + INTERVAL literal`: StreamingJoinHelper derives the
    // state-eviction watermark only from interval-literal arithmetic —
    // the earlier make_interval(...) phrasing defeated the extraction
    // (its decimal-cast seconds argument is opaque to the analyzer), so
    // join state was silently UNBOUNDED on both sides and outer joins
    // were rejected outright; with the literal the analyzer proves each
    // side's horizon, evicts state behind it, and can null-emit for
    // left_outer. (The quoted '$sec' is a Long, not user input.)
    def bound(sec: Long): Column =
      col(tsCol) + expr(s"INTERVAL '$sec' SECOND")
    lw.join(rw,
        col(keyCol) === col("__rkey") &&
          col(s"right_$tsCol") >= bound(lowerSec) &&
          col(s"right_$tsCol") <= bound(upperSec),
        joinType)
      .drop("__rkey")
  }

  /** Stream-static enrichment: join a stream against a STATIC dimension
    * frame (the remaining streaming join mode next to stream-stream —
    * Spark re-plans the static side per micro-batch, so a dim table
    * refreshed in place is picked up batch over batch). The dim is
    * broadcast-hinted: enrichment is stateless — no watermark, no join
    * state, each micro-batch hash-probes the dim map-side, the stream
    * never shuffles. LEFT join: an unmatched stream row survives with
    * null dim columns (dropping events because the dim is stale is a
    * silent-loss bug; filter explicitly downstream if wanted). Dim
    * payload columns are emitted as `dim_<name>`. Runs on batch frames
    * unchanged — the parity query q_stream_enrich is this exact call.
    * At 100 TB-of-stream: the dim must fit a broadcast (~8 GiB hard
    * cap); beyond that, pre-bucket both sides ([[graft.ops.Bucketing]])
    * or reduce the dim to the probed columns first. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
      streamKey: String, dimKey: String): DataFrame = {
    val payload = dim.columns.filterNot(_ == dimKey)
    val slim = dim.select(
      (col(dimKey).as("__dimkey") +:
        payload.map(c => col(c).as(s"dim_$c")).toIndexedSeq): _*)
    stream.join(broadcast(slim), col(streamKey) === col("__dimkey"), "left")
      .drop("__dimkey")
  }

  /** Streaming exact dedup on `idCols`, with state bounded by the
    * watermark horizon (`dropDuplicatesWithinWatermark`): duplicates
    * arriving within the horizon are dropped; state for older ids is
    * reclaimed. The batch analogue is plain `dropDuplicates`. */
  def dedupWithinWatermark(df: DataFrame, tsCol: String,
      watermarkDelay: String, idCols: Seq[String]): DataFrame = {
    val wm = df.withWatermark(tsCol, watermarkDelay)
    if (wm.isStreaming) wm.dropDuplicatesWithinWatermark(idCols)
    else wm.dropDuplicates(idCols)
  }

  /** Custom state op: emit each key's record only the FIRST time the
    * key is seen (streaming first-wins dedup with explicit state).
    * Works in append mode; `flatMapGroupsWithState` holds one boolean
    * per live key. `ProcessingTimeTimeout` + `ttl` reclaims state for
    * keys idle longer than the TTL (at-least-once re-emission after
    * expiry — the standard trade for bounded state). */
  def firstSeen[K: Encoder, V: Encoder](ds: Dataset[V], key: V => K,
      ttl: Option[String] = None): Dataset[V] = {
    implicit val boolEnc: Encoder[Boolean] = Encoders.scalaBoolean
    val timeout =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(key).flatMapGroupsWithState[Boolean, V](
        OutputMode.Append(), timeout) {
      (_: K, rows: Iterator[V], state: GroupState[Boolean]) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else if (state.exists) {
          ttl.foreach(state.setTimeoutDuration) // refresh: idle-based TTL
          Iterator.empty
        } else {
          state.update(true)
          ttl.foreach(state.setTimeoutDuration)
          rows.take(1)
        }
    }
  }

  /** [[firstSeen]] on Spark 4's `transformWithState` (SPARK-49564), the
    * successor to `flatMapGroupsWithState`: named typed state
    * (`ValueState`), native per-state TTL via [[TTLConfig]] (replacing
    * the hand-rolled ProcessingTimeTimeout dance), and timers when
    * needed. Evaluated for round-5 ADVICE: AVAILABLE in this sandbox's
    * Spark 4.1.2 and adopted here; the `flatMapGroupsWithState`
    * variants above remain for sessions on the default HDFS-backed
    * state store, because transformWithState REQUIRES the RocksDB
    * provider (`spark.sql.streaming.stateStore.providerClass =
    * ...state.RocksDBStateStoreProvider`) — at 100 TB you want RocksDB
    * anyway (state spills to disk instead of capping at executor heap).
    */
  def firstSeenTws[K: Encoder, V: Encoder](ds: Dataset[V], key: V => K,
      ttl: Option[java.time.Duration] = None): Dataset[V] = {
    val processor = new StatefulProcessor[K, V, V] {
      @transient private var seen: ValueState[Boolean] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean,
          ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))
      override def handleInputRows(k: K, rows: Iterator[V],
          tv: TimerValues): Iterator[V] =
        if (seen.exists()) {
          // re-write the value so the TTL clock restarts: [[firstSeen]]'s
          // TTL is IDLE-based (refreshed on every arrival), and TTLConfig
          // expires from the last update, not the last read. Validated
          // empirically on Spark 4.1.2 (2026-08-12): with ttl=2s and 5s
          // arrival gaps, every arrival found expired state and
          // re-emitted — expiry counts from the last update, so updating
          // here keeps a busy key's state alive. (Wall-clock TTL is
          // deliberately NOT in the MemoryStream suite: timing-based
          // streaming assertions flake under CI load.)
          if (ttl.isDefined) seen.update(true)
          Iterator.empty
        } else { seen.update(true); rows.take(1) }
    }
    // TTL needs a clock; without one, no time semantics at all
    val timeMode =
      if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    ds.groupByKey(key).transformWithState(processor, timeMode,
      OutputMode.Append())
  }

  /** [[runningMean]] on `transformWithState` (see [[firstSeenTws]] for
    * the adoption rationale and the RocksDB provider requirement). */
  def runningMeanTws[K: Encoder](ds: Dataset[(K, Double)]): Dataset[(K, Long, Double)] = {
    implicit val outEnc: Encoder[(K, Long, Double)] = Encoders.tuple(
      implicitly[Encoder[K]], Encoders.scalaLong, Encoders.scalaDouble)
    val processor = new StatefulProcessor[K, (K, Double), (K, Long, Double)] {
      @transient private var acc: ValueState[(Long, Double)] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        acc = getHandle.getValueState[(Long, Double)]("acc",
          Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
          TTLConfig.NONE)
      override def handleInputRows(k: K, rows: Iterator[(K, Double)],
          tv: TimerValues): Iterator[(K, Long, Double)] = {
        var (n, sum) = if (acc.exists()) acc.get() else (0L, 0.0)
        rows.foreach { case (_, v) => n += 1; sum += v }
        acc.update((n, sum))
        Iterator.single((k, n, if (n > 0) sum / n else 0.0))
      }
    }
    ds.groupByKey(_._1).transformWithState(processor, TimeMode.None(),
      OutputMode.Update())
  }

  /** ONLINE per-entity EWMA — [[graft.ops.EventAnalytics.ewmaSmooth]]
    * as streaming state, so the monitor level new events compare
    * against updates as each micro-batch lands instead of re-folding
    * the history. Input rows are `(key, eventTimeUs, value)`; state per
    * key is `(n, ewma)`; each batch's rows for a key fold in EVENT-TIME
    * order — `(ts, value)` ascending, exactly the batch op's
    * `array_sort(struct(t, v))` order — through the IDENTICAL
    * recurrence (`s1 = x1; s = s*(1-alpha) + x*alpha`, same two
    * multiplies one add with the same Scala-computed `1-alpha`
    * constant), and the updated `(key, n, ewma)` emits per batch
    * (update mode).
    *
    * Parity contract (StreamOpsSpec proves it across 3 batch splits):
    * feed the event log in event-time-ordered batch prefixes and after
    * every batch each key's state equals batch `ewmaSmooth` on that
    * prefix BIT-EXACTLY — the streaming fold is the batch fold,
    * checkpoint-resumed instead of recomputed. Out-of-order arrival
    * ACROSS batches folds in arrival order (state cannot rewind); the
    * batch op remains the replayable ground truth, this op is its
    * incremental serve path.
    *
    * Scale shape: one stateful exchange on the key per micro-batch;
    * state is 16 bytes per live key — no per-key history is retained,
    * which is the whole point of an exponential average. */
  def ewmaState[K: Encoder](ds: Dataset[(K, Long, Double)],
      alpha: Double): Dataset[(K, Long, Double)] = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val oneMinus = 1.0 - alpha // computed once, the batch op's constant
    implicit val stateEnc: Encoder[(Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    implicit val outEnc: Encoder[(K, Long, Double)] = Encoders.tuple(
      implicitly[Encoder[K]], Encoders.scalaLong, Encoders.scalaDouble)
    ds.groupByKey(_._1).mapGroupsWithState[(Long, Double), (K, Long, Double)](
        GroupStateTimeout.NoTimeout()) {
      (k: K, rows: Iterator[(K, Long, Double)], state: GroupState[(Long, Double)]) =>
        var (n, s) = state.getOption.getOrElse((0L, 0.0))
        // (ts, value) ascending == the batch op's struct sort order
        rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, _, v) =>
          s = if (n == 0L) v else s * oneMinus + v * alpha
          n += 1
        }
        state.update((n, s))
        (k, n, s)
    }
  }

  /** Custom state op: running per-key mean, emitted as an update after
    * every batch — the canonical `mapGroupsWithState` accumulator. */
  /** Streaming [[graft.ops.TextAnalysis.lmScore]]: score an ARRIVING
    * document stream against a bigram model built ONCE from the STATIC
    * `train` corpus — the online quality gate on the ingest path,
    * running the exact batch kernel (shared [[graft.ops.TextAnalysis
    * .lmScoreAgainst]], zero drift): per-row explode → two
    * stream-static left joins on the broadcast-able count frames → the
    * fixed-point per-doc aggregate. Run in complete/update output
    * mode (it ends in a streaming aggregation keyed by doc id). Two
    * contract deltas vs batch, both stream-imposed: token-free docs
    * emit NOTHING (the reinstating left join after an aggregation is
    * not stream-legal), and a doc split across micro-batches keeps
    * accumulating (update mode re-emits its row — ship whole docs per
    * row, which is the schema anyway). Batch-vs-stream parity is
    * pinned by StreamOpsSpec; the batch query q_lm_score stays the
    * DuckDB oracle anchor. */
  def lmScoreStream(train: DataFrame, stream: DataFrame, idCol: String,
      textCol: String): DataFrame =
    graft.ops.TextAnalysis.lmScoreAgainst(
      graft.ops.TextAnalysis.lmModel(train, textCol), stream, idCol,
      textCol, reinstate = false)

  /** Streaming [[graft.ops.TextAnalysis.dsirWeights]]: importance
    * weights for an ARRIVING stream against hashed-bigram bucket
    * models built ONCE from STATIC frames — `target` is the quality
    * reference, `rawSample` the static sample standing in for the raw
    * pool's bucket distribution (a stream cannot model itself: its
    * distribution is unbounded state). Same shared kernel
    * ([[graft.ops.TextAnalysis.dsirScoreAgainst]]), same complete/
    * update-mode and no-reinstate contract as [[lmScoreStream]]. */
  def dsirWeightsStream(rawSample: DataFrame, target: DataFrame,
      stream: DataFrame, idCol: String, textCol: String,
      buckets: Int = 1024): DataFrame =
    graft.ops.TextAnalysis.dsirScoreAgainst(
      graft.ops.TextAnalysis.dsirModel(target, textCol, buckets),
      graft.ops.TextAnalysis.dsirModel(rawSample, textCol, buckets),
      stream, idCol, textCol, buckets, reinstate = false)

  /** Streaming [[graft.ops.EventAnalytics.rateSpikes]]: flag ARRIVING
    * activity against a STATIC trailing baseline of historical daily
    * counts — the production monitor shape (the nightly job refreshes
    * the baseline; the stream only answers "is today hot"). Identical
    * lift arithmetic to batch: `lift = (n+1)·W / (sum_prev + W)`, one
    * division of exact integers.
    *
    * The stream-legal plan inverts the batch self-join: the trailing
    * band is PRE-AGGREGATED static-side — each baseline (key, day, n)
    * is exploded to the `windowDays` FUTURE days it serves and summed
    * to `(key, day, sum_prev)` — so the stream side is one stateless
    * equi-join (no band join, no join after aggregation, both
    * stream-illegal) followed by ONE streaming aggregation keyed on
    * (key, day, sum_prev); sum_prev is functionally dependent on
    * (key, day), so grouping by it is free and keeps the aggregate a
    * plain count. Run in update/complete mode; a day split across
    * micro-batches keeps accumulating (update re-emits its row).
    *
    * Contract delta vs batch, stream-imposed and deliberate: arriving
    * days do NOT feed later days' baselines (a stream cannot join its
    * own aggregate) — parity with the batch monitor holds exactly for
    * stream days whose full trailing window lies in the static
    * baseline (StreamOpsSpec pins it); production rolls the baseline
    * forward nightly. The batch query q_rate_spikes stays the DuckDB
    * oracle anchor.
    *
    * Scale shape: the served-day explode is |key-days| × W static slim
    * rows built once; per micro-batch work is one broadcast-able
    * equi-join plus a keyed count. */
  def rateSpikesStream(baseline: DataFrame, stream: DataFrame,
      keyCol: String, dayCol: String, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val counts = baseline
      .groupBy(col(keyCol).as("key"), col(dayCol).cast(LongType).as("day"))
      .agg(count(lit(1)).as("n"))
    val serves = counts.select(col("key"),
        explode(sequence(col("day") + 1, col("day") + windowDays))
          .as("day"), col("n"))
      .groupBy(col("key"), col("day")).agg(sum(col("n")).as("sum_prev"))
    stream
      .select(col(keyCol).as("key"), col(dayCol).cast(LongType).as("day"))
      .join(serves, Seq("key", "day"), "left")
      .groupBy(col("key"), col("day"),
        coalesce(col("sum_prev"), lit(0L)).as("sum_prev"))
      .agg(count(lit(1)).as("n"))
      .select(col("key").as(keyCol), col("day").as(dayCol), col("n"),
        col("sum_prev"),
        ((col("n") + lit(1L)) * lit(windowDays.toLong)).cast(DoubleType)
          ./((col("sum_prev") + lit(windowDays.toLong)).cast(DoubleType))
          .as("lift"))
  }

  /** Streaming [[graft.ops.Stats.histogramDrift]]: per event-time
    * window, the total-variation distance of the ARRIVING value
    * distribution against a STATIC reference snapshot — the drift
    * monitor a pipeline runs on live ingest instead of per data drop.
    * The stream-legal inversion follows the [[rateSpikesStream]]
    * recipe: the static side pre-aggregates to its (bounded) bin
    * histogram, folded into ONE broadcast row; the stream side is a
    * CHAINED pair of time-window aggregations (append mode, the
    * Spark 3.4+ multi-stateful-operator shape): (window, bin) counts —
    * bounded state, never per-event rows — then the per-window bin
    * list; a closing stateless projection computes the SAME per-bin
    * L1 terms and the SAME ascending-bin fold as the batch op, so a
    * fully-arrived window's `tvd` equals batch
    * `histogramDrift(ref, slice)` bit-for-bit (StreamOpsSpec).
    * Also emits `n_novel_bins` — arriving bins the reference never
    * saw, the novel-region alarm. Contract delta vs batch, pinned
    * here: the reference is FROZEN (arriving windows never feed it),
    * and a window emits only once its watermark closes. */
  def histogramDriftStream(ref: DataFrame, stream: DataFrame,
      tsCol: String, valueCol: String, binWidth: Double,
      windowDuration: String, watermarkDelay: String): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val refArr = ref.where(col(valueCol).isNotNull)
      .groupBy(floor(col(valueCol) / binWidth).cast(LongType).as("bin"))
      .agg(count(lit(1)).as("n_ref"))
      .agg(array_sort(collect_list(struct(col("bin"), col("n_ref"))))
        .as("ref_bins"), sum(col("n_ref")).as("t_ref"))
      .select(lit(1).as("__one"), col("ref_bins"), col("t_ref"))
    val perBin = stream
      .withWatermark(tsCol, watermarkDelay)
      .where(col(valueCol).isNotNull)
      .select(window(col(tsCol), windowDuration).as("win"),
        floor(col(valueCol) / binWidth).cast(LongType).as("bin"))
      .groupBy(col("win"), col("bin"))
      .agg(count(lit(1)).as("n_cur"))
    val perWin = perBin
      .groupBy(window(col("win"), windowDuration).as("win"))
      .agg(array_sort(collect_list(struct(col("bin"), col("n_cur"))))
        .as("cur_bins"), sum(col("n_cur")).as("t_cur"))
    val joined = perWin.select(lit(1).as("__one"), col("win"),
        col("cur_bins"), col("t_cur"))
      .join(broadcast(refArr), Seq("__one"))
    def lookup(arr: Column, b: Column, field: String): Column =
      coalesce(get(filter(arr, e => e.getField("bin") === b), lit(0))
        .getField(field), lit(0L))
    val allBins = array_sort(array_union(
      transform(col("ref_bins"), e => e.getField("bin")),
      transform(col("cur_bins"), e => e.getField("bin"))))
    joined
      .withColumn("__bins", allBins)
      .withColumn("tvd",
        aggregate(
          transform(col("__bins"), b =>
            abs(lookup(col("ref_bins"), b, "n_ref").cast(DoubleType) /
                col("t_ref").cast(DoubleType) -
              lookup(col("cur_bins"), b, "n_cur").cast(DoubleType) /
                col("t_cur").cast(DoubleType))),
          lit(0.0), (acc, x) => acc + x) * 0.5)
      .withColumn("n_novel_bins",
        size(filter(transform(col("cur_bins"), e => e.getField("bin")),
          b => size(filter(col("ref_bins"),
            e => e.getField("bin") === b)) === 0)).cast(LongType))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col("t_cur"), col("n_novel_bins"), col("tvd"))
  }

  /** Streaming [[graft.ops.Stats.ksTest]]: per event-time window, the
    * two-sample Kolmogorov–Smirnov statistic of the arriving values
    * against a STATIC reference — the binning-free companion of
    * [[histogramDriftStream]], same chained-aggregation recipe. The
    * static side ships as one broadcast row of (value, cumulative
    * count) pairs; the stream side aggregates (window, value) counts
    * then the per-window value list; the projection computes
    * `d_num = max |cum_ref·n_cur − cum_cur·n_ref|` over the pooled
    * distinct values in EXACT Long arithmetic (max is order-free, so
    * parity with the batch op needs no fold-order care) and closes
    * with the batch op's exact d / ks_stat chains. `valueCol` must
    * already be integral longs (quantize first — the batch contract);
    * the per-window distinct-value state is bounded by that
    * quantization, and the projection RAISES past `maxDistinct`
    * pooled values rather than degrading silently. */
  def ksTestStream(ref: DataFrame, stream: DataFrame, tsCol: String,
      valueCol: String, windowDuration: String, watermarkDelay: String,
      maxDistinct: Int = 4096): DataFrame = {
    require(maxDistinct >= 1, s"maxDistinct must be >= 1, got $maxDistinct")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val refHist = ref.where(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast(LongType).as("v"))
      .agg(count(lit(1)).as("n"))
    // the reference's values all enter the pooled set, so its domain
    // is bounded by the same maxDistinct — and the guard sits on the
    // static window's INPUT (the ksTest recipe), so an over-wide
    // reference raises before its single-task cumulative sort is paid
    val refDomain = refHist.agg(count(lit(1)).as("__nd"))
    val refArr = refHist.crossJoin(broadcast(refDomain))
      .where(assert_true(col("__nd") <= lit(maxDistinct.toLong),
        concat(lit("ksTestStream: "), col("__nd"),
          lit(s" reference distinct values exceed maxDistinct=" +
            s"$maxDistinct — quantize coarser or raise the cap"))).isNull)
      .select(col("v"), sum(col("n")).over(w).as("cum"))
      .agg(array_sort(collect_list(struct(col("v"), col("cum"))))
        .as("ref_cum"), max(col("cum")).as("n_ref"))
      .select(lit(1).as("__one"), col("ref_cum"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"))
    val perVal = stream
      .withWatermark(tsCol, watermarkDelay)
      .where(col(valueCol).isNotNull)
      .select(window(col(tsCol), windowDuration).as("win"),
        col(valueCol).cast(LongType).as("v"))
      .groupBy(col("win"), col("v"))
      .agg(count(lit(1)).as("n"))
    val perWin = perVal
      .groupBy(window(col("win"), windowDuration).as("win"))
      .agg(array_sort(collect_list(struct(col("v"), col("n"))))
        .as("cur_vals"), sum(col("n")).as("n_cur"))
    val joined = perWin.select(lit(1).as("__one"), col("win"),
        col("cur_vals"), col("n_cur"))
      .join(broadcast(refArr), Seq("__one"))
    // ONE merge pass over the pooled sorted union instead of per-value
    // filter/aggregate lookups (which re-walked both arrays per pooled
    // value — O(n^2) lambda evaluations, ~16.7M at the default cap):
    // ref values and cur values are each ascending SUBSETS of pooled,
    // so a fold over pooled advances a pointer into each array by at
    // most one per step — the accumulator carries (ref consumed, cur
    // consumed, running cur cumulative, best |ECDF gap| numerator) and
    // every step is O(1) `get` probes. Null-safe by construction:
    // `get` past either end reads null and the coalesced compare says
    // "don't advance".
    val pooled = array_sort(array_union(
      transform(col("ref_cum"), e => e.getField("v")),
      transform(col("cur_vals"), e => e.getField("v"))))
    val foldInit = struct(lit(0).as("r"), lit(0).as("c"),
      lit(0L).as("cumcur"), lit(0L).as("best"))
    def mergeStep(acc: Column, v: Column): Column = {
      val r0 = acc.getField("r")
      val c0 = acc.getField("c")
      val rAdv = coalesce(
        get(col("ref_cum"), r0).getField("v") === v, lit(false))
      val cAdv = coalesce(
        get(col("cur_vals"), c0).getField("v") === v, lit(false))
      val r1 = when(rAdv, r0 + 1).otherwise(r0)
      val cumcur = when(cAdv, acc.getField("cumcur") +
          get(col("cur_vals"), c0).getField("n"))
        .otherwise(acc.getField("cumcur"))
      val cumref = coalesce(get(col("ref_cum"), r1 - 1).getField("cum"),
        lit(0L))
      struct(r1.as("r"), when(cAdv, c0 + 1).otherwise(c0).as("c"),
        cumcur.as("cumcur"),
        greatest(acc.getField("best"),
          abs(cumref * col("n_cur") - cumcur * col("n_ref"))).as("best"))
    }
    joined
      .withColumn("__pooled",
        when(size(pooled) > maxDistinct, raise_error(concat(
          lit("ksTestStream: "), size(pooled).cast("string"),
          lit(s" pooled distinct values exceed maxDistinct=$maxDistinct" +
            " — quantize coarser or raise the cap"))))
          .otherwise(pooled))
      .withColumn("d_num",
        aggregate(col("__pooled"), foldInit, mergeStep _)
          .getField("best"))
      .withColumn("d",
        when(col("n_ref") > lit(3000000000L) ||
            col("n_cur") > lit(3000000000L),
          raise_error(lit("ksTestStream: side sizes exceed the Long " +
            "exactness bound (n_ref*n_cur overflows) — route the " +
            "cross-products through DECIMAL")))
          .when(col("n_ref") === 0L || col("n_cur") === 0L, lit(null))
          .otherwise(col("d_num").cast(DoubleType) /
            (col("n_ref") * col("n_cur")).cast(DoubleType)))
      .withColumn("ks_stat",
        sqrt((col("n_ref") * col("n_cur")).cast(DoubleType) /
          (col("n_ref") + col("n_cur")).cast(DoubleType)) * col("d"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col("n_ref"), col("n_cur"), col("d_num"), col("d"), col("ks_stat"))
  }

  // ---- ledgered nightly-fold store ---------------------------------
  // [[BatchLedger]] gives the replay/gap LAW; these helpers make the
  // safe path the DEFAULT path (round-19 verdict: the ledger existed
  // but no production fold used it — every foreachBatch caller had to
  // thread Ledgered state and persist the high-water by hand, so
  // replay safety held by discipline, not by construction).
  //
  // Commit protocol (local/HDFS-style FS): each commit writes a fresh
  // `c{n}/` version dir holding BOTH the artifact parquet and the
  // one-row ledger parquet, then flips the `CURRENT` pointer file via
  // write-temp + ATOMIC_MOVE. Artifact and ledger live or die
  // together — a crash before the flip leaves the previous commit
  // intact (the orphan dir is overwritten on the retried batch); a
  // crash after the flip is a completed commit. Old version dirs are
  // pruned best-effort AFTER the flip.
  //
  // Epoch binding (round-19 ADVICE, the checkpoint-reset hazard): the
  // ledger stores the caller's `epoch` — the streaming query id or
  // checkpoint path, any string that changes when the checkpoint
  // lineage changes. A fold arriving under a DIFFERENT epoch RAISES:
  // its batch ids restart at 0, and absorbing them as replays would
  // be silent data loss. Re-pointing an artifact at a new query is an
  // explicit operator action: [[rebindEpoch]] keeps the artifact and
  // resets the high-water to -1 under the new epoch (the new query's
  // batch 0 then folds as NEW data — the operator is asserting the
  // new stream does not re-deliver rows the artifact already holds).

  private def currentPointer(dir: String): java.nio.file.Path =
    java.nio.file.Paths.get(dir, "CURRENT")

  /** The committed version name (e.g. "c4"), if any. */
  private def currentVersion(dir: String): Option[String] = {
    val p = currentPointer(dir)
    if (java.nio.file.Files.exists(p))
      Some(java.nio.file.Files.readString(p).trim)
    else None
  }

  /** Read the committed (artifact, appliedBatch, epoch) triple, or
    * None if nothing was ever committed. The artifact frame reads
    * lazily from the committed version dir — it is valid until the
    * NEXT fold commits (which prunes old versions); consume or persist
    * it promptly. */
  def readLedgered(spark: SparkSession, dir: String): Option[(DataFrame, Long, Option[String])] =
    currentVersion(dir).map { v =>
      val ledger = spark.read.parquet(s"$dir/$v/ledger")
      val (hw, epoch) = BatchLedger.ledgerOf(ledger)
      (spark.read.parquet(s"$dir/$v/artifact"), hw, epoch)
    }

  private def commitLedgered(spark: SparkSession, dir: String,
      artifact: DataFrame, appliedBatch: Long, epoch: String): Unit = {
    val next = "c" + (currentVersion(dir)
      .map(_.stripPrefix("c").toLong + 1L).getOrElse(0L))
    // overwrite mode: a crash between this write and the pointer flip
    // leaves an orphan `next` dir that the retried batch rewrites
    artifact.write.mode("overwrite").parquet(s"$dir/$next/artifact")
    BatchLedger.ledgerFrame(spark, appliedBatch, epoch)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/$next/ledger")
    val tmp = java.nio.file.Paths.get(dir, s"CURRENT.tmp.$next")
    java.nio.file.Files.writeString(tmp, next)
    java.nio.file.Files.move(tmp, currentPointer(dir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // prune superseded commits AFTER the flip (best-effort: a leftover
    // dir is disk, not corruption)
    val root = java.nio.file.Paths.get(dir)
    scala.util.Try {
      scala.util.Using.resource(java.nio.file.Files.list(root)) { s =>
        s.iterator().asScala
          .filter(p => p.getFileName.toString.matches("c\\d+") &&
            p.getFileName.toString != next)
          .foreach { old =>
            scala.util.Using.resource(java.nio.file.Files.walk(old)) { w =>
              w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
                .forEach(f => java.nio.file.Files.deleteIfExists(f))
            }
          }
      }
    }
  }

  /** Apply one micro-batch to the persisted artifact EXACTLY ONCE —
    * the production `foreachBatch` body:
    *
    * {{{
    * stream.writeStream.foreachBatch { (df: DataFrame, id: Long) =>
    *   StreamOps.ledgeredFold(spark, artifactDir, epoch, df, id) {
    *     (prior, batch) => prior match {
    *       case None      => build(batch)
    *       case Some(art) => merge(art, batch)
    *     }
    *   }
    * }.option("checkpointLocation", ckpt).start()
    * }}}
    *
    * A replayed batch (id <= stored high-water, same epoch) returns
    * without evaluating `fold` — free and corruption-free; the
    * successor batch folds and commits artifact + ledger atomically
    * (one pointer flip); a gap raises ([[BatchLedger.fold]]'s law); a
    * DIFFERENT epoch raises (checkpoint-reset hazard — see
    * [[rebindEpoch]]). `fold` receives None when nothing was ever
    * committed (first batch builds the artifact). Returns true when
    * the batch folded, false when it was dropped as a replay. */
  def ledgeredFold(spark: SparkSession, dir: String, epoch: String,
      batch: DataFrame, batchId: Long)(
      fold: (Option[DataFrame], DataFrame) => DataFrame): Boolean = {
    require(epoch.nonEmpty, "StreamOps.ledgeredFold: epoch must be " +
      "non-empty (use the streaming query id or the checkpoint path)")
    val prior = readLedgered(spark, dir)
    prior.foreach { case (_, hw, storedEpoch) =>
      if (!storedEpoch.contains(epoch)) throw new IllegalStateException(
        s"StreamOps.ledgeredFold: artifact at $dir is bound to query " +
          s"epoch ${storedEpoch.getOrElse("<none — pre-epoch ledger>")} " +
          s"but this fold arrived under epoch '$epoch'. A query on a " +
          "fresh checkpoint numbers batches from 0 — absorbing them " +
          s"against high-water $hw would drop real data as 'replays'. " +
          "If the artifact should continue under the new query, " +
          "acknowledge the reset explicitly with StreamOps.rebindEpoch")
    }
    val state = Ledgered(prior.map(_._1), prior.map(_._2).getOrElse(-1L))
    val next = BatchLedger.fold(state, batchId)(a => Some(fold(a, batch)))
    if (next eq state) false // replay: nothing evaluated, nothing written
    else {
      commitLedgered(spark, dir, next.artifact.get, batchId, epoch)
      true
    }
  }

  /** Re-bind a committed artifact to a NEW query epoch, resetting the
    * high-water to -1: the explicit operator acknowledgment that a
    * fresh-checkpoint query now owns the artifact and its batch 0 is
    * NEW data (if the new stream replays rows the artifact already
    * folded, this double-counts — that is exactly why it never happens
    * implicitly). Raises if nothing is committed. */
  def rebindEpoch(spark: SparkSession, dir: String,
      newEpoch: String): Unit = {
    require(newEpoch.nonEmpty, "StreamOps.rebindEpoch: epoch must be " +
      "non-empty")
    val (artifact, _, _) = readLedgered(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"StreamOps.rebindEpoch: no committed artifact at $dir — " +
          "nothing to rebind; the first ledgeredFold commit binds the " +
          "epoch itself"))
    // materialize before the commit prunes the version dir being read
    commitLedgered(spark, dir, artifact.localCheckpoint(), -1L, newEpoch)
  }

  def runningMean[K: Encoder](ds: Dataset[(K, Double)]): Dataset[(K, Long, Double)] = {
    implicit val stateEnc: Encoder[(Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    implicit val outEnc: Encoder[(K, Long, Double)] = Encoders.tuple(
      implicitly[Encoder[K]], Encoders.scalaLong, Encoders.scalaDouble)
    ds.groupByKey(_._1).mapGroupsWithState[(Long, Double), (K, Long, Double)](
        GroupStateTimeout.NoTimeout()) {
      (k: K, rows: Iterator[(K, Double)], state: GroupState[(Long, Double)]) =>
        var (n, sum) = state.getOption.getOrElse((0L, 0.0))
        rows.foreach { case (_, v) => n += 1; sum += v }
        state.update((n, sum))
        (k, n, if (n > 0) sum / n else 0.0)
    }
  }
}
