package graft.ops

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.LongHashes

/** Deterministic sampling for corpus curation.
  *
  * The family, by contract:
  *  - fixed RATE, duplicate-consistent: content-hash bucket filters
  *    ([[TextAnalysis.withSplit]] / [[TextAnalysis.mixCorpus]]);
  *  - fixed SIZE, global: bottom-k of the id hash in unsigned order
  *    (SparkEntry q_sample — a `TakeOrderedAndProject`);
  *  - fixed SIZE PER STRATUM (this file): k smallest id-hashes within
  *    each group — the balanced-eval-set builder ("20 docs per
  *    language"), where a global bottom-k would follow the corpus mix
  *    and drown minority strata.
  *
  * All three are pure functions of the id/content SET — no RNG state,
  * no insertion-order sensitivity — so a sample is reproducible across
  * runs, engines, partitionings, and retries, and appending one new
  * document displaces at most one sample member per stratum.
  *
  * Scale shape: [[BottomKByHash]] is a bounded TypedImperativeAggregate
  * (exactly the [[Similarity.TopKByScore]] recipe with unsigned-long
  * order instead of double order): every partition keeps at most k
  * (hash, id) pairs PER GROUP map-side, the shuffle moves `16k` bytes
  * per (group, partition), and the merge is a bounded heap union. No
  * window sort (a `row_number() OVER (PARTITION BY ...)` sorts whole
  * partitions to keep k rows), no second scan, no join-back: the id
  * rides inside the buffer. At 100 TB: cost is one partial+final
  * aggregate exchange over group keys.
  */
object Sampling {

  /** k smallest (unsigned) hashes with their ids, as a sorted
    * `array<struct<skey, id>>`. Pair with
    * [[graft.functions.LongHashes.splitmix64]] — a bijection, so
    * distinct ids give distinct hashes and the selection is total. */
  def bottomKByHash(hash: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      BottomKByHash(GraftColumnBridge.expression(hash),
          GraftColumnBridge.expression(id), k)
        .toAggregateExpression())

  /** Stratified exact-size sample: the k rows of `df` with the
    * smallest `splitmix64(idCol)` in unsigned order within each
    * `strataCol` group (all rows if the stratum holds fewer than k).
    * Returns `(strataCol, idCol, skey)` rows; join back on `idCol` to
    * recover full rows where needed (the sample frame is groups×k —
    * broadcastable). */
  def sampleKPerGroup(df: DataFrame, strataCol: String, idCol: String,
      k: Int): DataFrame = {
    df.groupBy(col(strataCol))
      .agg(bottomKByHash(LongHashes.splitmix64(col(idCol)), col(idCol), k)
        .as("picks"))
      .select(col(strataCol), explode(col("picks")).as("p"))
      .select(col(strataCol), col("p.id").as(idCol), col("p.skey").as("skey"))
  }

  /** WEIGHTED exact-size sample per stratum — the fourth cell of the
    * sampling matrix ({uniform, weighted} x {global, per-stratum}):
    * within each group, the k rows with the largest Duffield–Lund–
    * Thorup priority `w/u`, where `u` is the 63-bit odd id hash (the
    * q_sample_weighted key) — heavy rows are proportionally likelier,
    * minority strata still get their full k, and the pick stays a pure
    * function of the (id, weight) set (append-stable, retry-stable,
    * partitioning-independent; the priority is ONE IEEE division of
    * exactly-rounded casts, so an oracle replays it bit-exactly).
    *
    * Scale shape: rides [[Similarity.topKPerKey]]'s bounded-heap
    * aggregate — map-side partial top-k, `<= 16k` bytes per (group,
    * partition) on the one exchange, no Window sort, no join-back.
    * Returns `(strataCol, idCol, priority, rank)`. */
  def weightedSampleKPerGroup(df: DataFrame, strataCol: String,
      idCol: String, weight: Column, k: Int): DataFrame = {
    val u = shiftrightunsigned(LongHashes.splitmix64(col(idCol)), 1)
      .bitwiseOR(lit(1L))
    Similarity.topKPerKey(
      df.select(col(strataCol), col(idCol),
        (weight.cast(DoubleType) / u.cast(DoubleType)).as("priority")),
      strataCol, idCol, "priority", k)
  }

  /** EXACT-TOTAL proportional sampling — hit a hard budget (`totalK`
    * rows / documents / examples) while keeping every stratum's share
    * proportional to its size: per-group quotas by LARGEST-REMAINDER
    * apportionment (Hamilton's method — `floor(totalK * n_g / ntot)`
    * each, the leftover units to the largest remainders, ties to the
    * ascending group name), then the quota smallest id-hashes per
    * group. Rate-based mixing ([[TextAnalysis.mixCorpus]]) cannot hit
    * an exact total (rounding per group drifts), a global bottom-k
    * ignores strata; this does both: sum of outputs == totalK
    * EXACTLY, and each group is within one row of its exact
    * proportional share. All integer arithmetic — the quota derivation
    * replays verbatim in the oracle.
    *
    * Scale shape: one count aggregate collects #groups rows to the
    * driver ([[TextAnalysis.temperatureMix]]'s documented
    * low-cardinality contract — sources, languages), then ONE bounded
    * bottom-k aggregate exchange (k = max quota per (group,
    * partition)) with the per-group cut applied on the exploded ranks
    * — no Window, no join-back, the corpus never shuffles.
    * `totalK * n_g` must fit a long (totalK is an Int — fine to
    * exabyte row counts). Returns `(strataCol, quota, idCol, rank)`,
    * rank ascending in unsigned hash order within each group. */
  def quotaSampleByGroup(df: DataFrame, strataCol: String, idCol: String,
      totalK: Int): DataFrame = {
    require(totalK >= 1, s"totalK must be >= 1, got $totalK")
    require(df.schema(strataCol).dataType == StringType,
      s"quotaSampleByGroup: strata column '$strataCol' must be STRING, " +
        s"got ${df.schema(strataCol).dataType.simpleString} — cast it " +
        "explicitly so the quota keys are unambiguous")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
      .collect().map { r =>
        require(!r.isNullAt(0),
          s"quotaSampleByGroup: strata column '$strataCol' contains " +
            "NULL — NULL forms no quota group; filter or fill it first")
        (r.getString(0), r.getLong(1))
      }.sortBy(_._1)
    val ntot = counts.map(_._2).sum
    require(ntot >= totalK,
      s"totalK=$totalK exceeds the corpus size $ntot")
    val base = counts.map { case (g, n) =>
      (g, totalK * n / ntot, totalK * n % ntot) }
    val extra = (totalK - base.map(_._2).sum).toInt
    val quotas = base.sortBy { case (g, _, r) => (-r, g) }.zipWithIndex
      .map { case ((g, b, _), i) => g -> (b + (if (i < extra) 1L else 0L)) }
      .toMap
    val maxQ = quotas.values.max.toInt
    val quotaCol = counts.foldLeft(lit(null).cast(LongType)) {
      case (acc, (g, _)) => when(col(strataCol) === g, lit(quotas(g)))
        .otherwise(acc)
    }
    df.groupBy(col(strataCol))
      .agg(bottomKByHash(LongHashes.splitmix64(col(idCol)), col(idCol),
        maxQ).as("picks"))
      .select(col(strataCol), posexplode(col("picks")).as(Seq("rank", "p")))
      .withColumn("quota", quotaCol)
      .where(col("rank") < col("quota"))
      .select(col(strataCol), col("quota"), col("p.id").as(idCol),
        col("rank").cast(LongType).as("rank"))
  }

  // ------------------------------------------------- weighted-sample
  // artifact — the SAMPLING member of the incremental-artifact family.
  //
  // The quantile summaries ([[Sketches.quantileSummaries]]) already
  // persist the UNIFORM bottom-k-by-hash sample; this persists the
  // WEIGHTED one: per group, the m rows with the largest Duffield–
  // Lund–Thorup priority `w/u` (the q_sample_weighted key — one IEEE
  // division of exactly-rounded casts, so every engine replays it
  // bit-for-bit; the textbook u^(1/w) key needs pow/ln, whose
  // last-ulp varies by libm). Top-m by a total order is closed under
  // union — top-m(A ∪ B) ⊆ top-m(A) ∪ top-m(B) — so merged and
  // single-pass artifacts agree PAIR FOR PAIR, the same exact sketch
  // algebra as the KMV/quantile members; and dropping rows leaves
  // exactly the survivors' top-m' (a removal cannot promote a
  // survivor past the old m-th priority), the bottom-k graceful-
  // degradation contract of [[Sketches.quantilePairsRetract]].

  /** Bounded per-group aggregate: the m largest-(w/u)-priority rows as
    * a sorted `array<struct<np, id, w>>` — `np` the NEGATED priority
    * (so plain ascending struct sort reproduces (priority DESC, id
    * ASC) — the [[Sketches.quantilePairs]] sign trick in double form),
    * `w` the weight payload riding along for serving. `u` is the
    * 63-bit odd [[LongHashes.splitmix64]] id hash, so the pick is a
    * pure function of the (id, weight) set: append-stable,
    * retry-stable, partitioning-independent. Ids must be UNIQUE rows
    * (a duplicate id is two population members); weights must be
    * >= 0 (the DLT estimator is undefined for negative weights — the
    * aggregate raises on one). */
  def priorityPairs(id: Column, weight: Column, m: Int): Column =
    GraftColumnBridge.column(
      PrioritySampleK(
        GraftColumnBridge.expression(id.cast(LongType)),
        GraftColumnBridge.expression(weight.cast(LongType)), m)
        .toAggregateExpression())

  /** Per-group [[priorityPairs]] artifacts as a STORED table —
    * `(groupCols..., wsample)`, one bounded pair array per group,
    * written like any parquet table; tonight's snapshot artifact
    * [[prioritySampleMerge]]-folds into yesterday's without rescanning
    * either corpus. Id and weight columns must be integral (the stored
    * schema is fixed at `(double, bigint, bigint)`; a silent cast to
    * null rows would hide data — the [[Dedup.winnowIndexCounted]]
    * fail-loudly convention). Scale shape: one partial+final bounded
    * aggregate exchange, `<= 24m` bytes per (group, partition); no
    * Window sort, no join-back — the weight rides in the buffer. */
  def prioritySamples(df: DataFrame, groupCols: Seq[String], idCol: String,
      weightCol: String, m: Int): DataFrame = {
    require(groupCols.nonEmpty, "prioritySamples: need a group col")
    requireIntegralCol(df, idCol, "prioritySamples id")
    requireIntegralCol(df, weightCol, "prioritySamples weight")
    ArtifactStamp.stamp(
      df.groupBy(groupCols.map(col): _*)
        .agg(priorityPairs(col(idCol), col(weightCol), m).as("wsample")),
      "wsample", "priority_sample", "m" -> m.toLong)
  }

  /** Merge [[priorityPairs]] arrays: ascending struct sort of the
    * concatenation, first m — EXACTLY the from-scratch sample of the
    * concatenated snapshots (top-m closure under union; ties broken by
    * id inside the struct order, so the result is a pure function of
    * the union row set). Same-m contract with the loud oversized guard
    * ([[Sketches.quantilePairsMergeAll]] precedent). Snapshots must be
    * row-disjoint (the ivfPqIndexAppend contract — a row present in
    * two parts would be sampled twice). */
  def priorityPairsMergeAll(samples: Column, m: Int): Column = {
    val merged = slice(array_sort(flatten(samples)), 1, m)
    when(exists(samples, s => size(s) > m),
      raise_error(lit(s"priorityPairsMergeAll: a sample holds more " +
        s"than m=$m entries — it was built with a larger m (same-m " +
        "contract)")))
      .otherwise(merged)
  }

  /** Merge stored [[prioritySamples]] tables per group — the
    * [[Sketches.quantileMergeSummaries]] shape: corpora behind the
    * artifacts are never touched, work is |groups| × m slim structs,
    * and the output is the same stored form so merges CHAIN across any
    * number of nights. */
  def prioritySampleMerge(parts: Seq[DataFrame], groupCols: Seq[String],
      m: Int): DataFrame = {
    require(parts.nonEmpty, "prioritySampleMerge: need >= 1 table")
    parts.foreach(ArtifactStamp.check(_, "wsample", "priority_sample",
      "prioritySampleMerge", "m" -> m.toLong))
    ArtifactStamp.stamp(
      parts.map(_.select(groupCols.map(col) :+ col("wsample"): _*))
        .reduce(_ unionAll _)
        .groupBy(groupCols.map(col): _*)
        .agg(priorityPairsMergeAll(collect_list(col("wsample")), m)
          .as("wsample")),
      "wsample", "priority_sample", "m" -> m.toLong)
  }

  /** RETRACT rows from a stored [[priorityPairs]] sample by id — the
    * weighted-sample member of the deletion taxonomy: dropping the
    * removed pairs leaves EXACTLY the survivors' top-m' priorities
    * (`m' = m − |removed ∩ sampled|`; a removal can never promote a
    * survivor past the old m-th priority), i.e. a VALID priority
    * sample of the surviving population at reduced resolution — the
    * evicted replacements were never stored; only a rebuild restores
    * full m. Removed ids that were never sampled cost nothing. The
    * caller reads `size(...)` to decide when m' has degraded enough to
    * warrant the rebuild, and must keep `size > k` for any
    * [[priorityEstimates]] serve (the threshold needs a real (k+1)-th
    * entry once the sample no longer covers its population). Fold
    * FURTHER snapshots into a degraded artifact only at the reduced
    * resolution (cap the merge at m'): a merge at the original m would
    * claim pairs past the information the artifact still holds —
    * rebuild to restore full m. */
  def priorityPairsRetract(sample: Column, removedIds: Column): Column =
    // null-safe on the tombstone side: a NULL removedIds array (the
    // natural left-join-no-tombstones shape) and null elements both
    // coalesce to "not removed" — without this, filter's non-true
    // predicate semantics would silently EMPTY the whole sample
    filter(sample, s =>
      !coalesce(array_contains(removedIds, s.getField("id")), lit(false)))

  /** Serve Duffield–Lund–Thorup estimates off a stored/merged sample:
    * the top-k entries as `struct<id, w, w_est>` where
    * `w_est = max(w, tau)` and `tau` is the (k+1)-th stored priority
    * RESCALED TO WEIGHT UNITS — the DLT subset-sum estimator: summing
    * `w_est` over any id-predicate subset of the k entries unbiasedly
    * estimates that subset's total weight in the FULL population
    * (Duffield, Lund & Thorup, "Priority sampling for estimation of
    * arbitrary subset sums", JACM 2007). DLT defines the priority as
    * `w / u` with `u` UNIFORM ON (0, 1]; the stored priority uses the
    * RAW 63-bit odd hash as `u` (scale-invariant for the ORDER, which
    * is all the sample build needs), so the uniform variate is
    * `u / 2^63` and the threshold must be served as
    * `tau = stored_priority * 2^63` — without the rescale, tau is
    * ~2^-63 of the weight scale, `max(w, tau)` collapses to `w`, and
    * the estimate is biased LOW whenever the sample truncated its
    * population (round-19 ADVICE fix). The multiply is by an exact
    * power of two — pure exponent arithmetic, no rounding — so the
    * serve stays bit-replayable in any engine. When the sample holds
    * the entire population (size <= k and never evicted/retracted),
    * tau = 0 and the estimates are exact weights. Output is itemwise
    * (no sum is folded here) so downstream engines replay it
    * order-free. */
  def priorityEstimates(sample: Column, k: Int): Column = {
    require(k >= 1, s"priorityEstimates: k must be >= 1, got $k")
    // (k+1)-th entry via null-safe 0-based get: absent -> tau = 0;
    // 2^63 as a Double is exact, and scaling a Double by it is exact
    val tau = coalesce(
      (lit(0.0) - get(sample, lit(k)).getField("np")) *
        lit(9223372036854775808.0),
      lit(0.0))
    transform(slice(sample, 1, k), s => struct(
      s.getField("id").as("id"), s.getField("w").as("w"),
      greatest(s.getField("w").cast(DoubleType), tau).as("w_est")))
  }

  /** Plan-time integral-column check for the ops whose STORED artifact
    * fixes a BIGINT schema: a silent cast to null would hide data.
    * ONE copy, shared across the ops package ([[Dedup]] delegates
    * here) so the guard and its remedy text cannot drift. */
  private[ops] def requireIntegralCol(df: DataFrame, c: String,
      what: String): Unit = {
    df.schema.fields.find(_.name == c).map(_.dataType) match {
      case Some(ByteType | ShortType | IntegerType | LongType) => ()
      case Some(other) => throw new IllegalArgumentException(
        s"$what column '$c' is ${other.sql} — the stored artifact " +
          "keeps it as BIGINT, so it must be integral (map string " +
          "values to longs upstream, e.g. xxhash64 + a dictionary)")
      case None => throw new IllegalArgumentException(
        s"$what column '$c' missing (columns: ${df.columns.mkString(", ")})")
    }
  }
}

/** TypedImperativeAggregate keeping the k smallest (hash, id) pairs in
  * UNSIGNED hash order. Hashes are assumed distinct per id (feed a
  * bijective hash); a duplicate hash keeps the smaller id, so even a
  * collision stays deterministic. */
case class BottomKByHash(hash: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKBuffer] {
  require(k >= 1, s"bottom-k needs k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType == LongType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (long hash, long id), got " +
        s"${hash.dataType.simpleString}, ${id.dataType.simpleString}")

  override def children: Seq[Expression] = Seq(hash, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("skey", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): BottomKBuffer = new BottomKBuffer(k)

  override def update(buf: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val h = hash.eval(input)
    val i = id.eval(input)
    if (h != null && i != null)
      buf.offer(h.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BottomKBuffer, other: BottomKBuffer): BottomKBuffer = {
    other.foreach((h, i) => buf.offer(h, i))
    buf
  }

  override def eval(buf: BottomKBuffer): Any = {
    val rows = new Array[Any](buf.size)
    var idx = 0
    buf.foreach { (h, i) =>
      rows(idx) = InternalRow(h, i)
      idx += 1
    }
    new GenericArrayData(rows): ArrayData
  }

  override def serialize(buf: BottomKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): BottomKBuffer =
    BottomKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): BottomKByHash =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKByHash =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKByHash =
    copy(hash = newChildren(0), id = newChildren(1))
  override def prettyName: String = "graft_bottom_k_by_hash"
}

/** Bounded map of the k smallest distinct longs under UNSIGNED order,
  * each carrying an id payload. O(log k) offer, O(k) memory.
  * Iteration is in ascending unsigned order (the output contract). */
final class BottomKBuffer(k: Int) {
  private val map = new java.util.TreeMap[java.lang.Long, java.lang.Long](
    (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b))

  def offer(h: Long, id: Long): Unit = {
    if (map.size < k) {
      val prev = map.get(h)
      if (prev == null || prev > id) { map.put(h, id); () }
    } else if (java.lang.Long.compareUnsigned(h, map.lastKey) < 0) {
      val prev = map.get(h)
      if (prev == null) {
        map.put(h, id)
        map.pollLastEntry()
        ()
      } else if (prev > id) { map.put(h, id); () }
    } else if (map.containsKey(h) && map.get(h) > id) {
      map.put(h, id)
      ()
    }
  }

  def size: Int = map.size
  /** Largest kept hash (unsigned order) — the k-th minimum when full. */
  def lastKey: Long = map.lastKey
  def foreach(f: (Long, Long) => Unit): Unit =
    map.forEach((h, i) => f(h, i))

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + map.size * 16)
    bb.putInt(map.size)
    map.forEach((h, i) => { bb.putLong(h); bb.putLong(i); () })
    bb.array()
  }
}

object BottomKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): BottomKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new BottomKBuffer(k)
    var i = 0
    while (i < n) { buf.offer(bb.getLong, bb.getLong); i += 1 }
    buf
  }
}

/** TypedImperativeAggregate keeping the m rows with the largest
  * Duffield–Lund–Thorup priority `w / u` per group, `u` the 63-bit odd
  * [[graft.functions.LongHashes.splitmix64]] id hash — the weighted
  * twin of [[BottomKByHash]], with the weight payload riding in the
  * buffer (no join-back). The priority is computed HERE, not taken as
  * input, so every artifact ever stored shares one key definition —
  * merged tables from different builds cannot key-drift. Output is
  * sorted ascending by `(np, id)` = (priority DESC, id ASC); `np` is
  * the negated priority, so `array_sort` over concatenated artifacts
  * reproduces the same order ([[Sampling.priorityPairsMergeAll]]).
  * Negative weights raise (the DLT estimator is undefined for them);
  * a zero weight gets priority 0.0 (np normalized to +0.0 so the
  * stored bytes are engine-portable). */
case class PrioritySampleK(id: Expression, weight: Expression, m: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PriorityKBuffer] {
  require(m >= 1, s"priority sample needs m >= 1, got $m")

  override def checkInputDataTypes(): TypeCheckResult =
    if (id.dataType == LongType && weight.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (long id, long weight), got " +
        s"${id.dataType.simpleString}, ${weight.dataType.simpleString}")

  override def children: Seq[Expression] = Seq(id, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("np", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("w", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): PriorityKBuffer =
    new PriorityKBuffer(m)

  override def update(buf: PriorityKBuffer,
      input: InternalRow): PriorityKBuffer = {
    val i = id.eval(input)
    val w = weight.eval(input)
    if (i != null && w != null) {
      val wl = w.asInstanceOf[Long]
      if (wl < 0) throw new IllegalArgumentException(
        s"$prettyName: negative weight $wl for id $i — the DLT " +
          "priority sample is undefined for negative weights")
      val il = i.asInstanceOf[Long]
      val u = (LongHashes.splitmix64Of(il) >>> 1) | 1L
      buf.offer(wl.toDouble / u.toDouble, il, wl)
    }
    buf
  }

  override def merge(buf: PriorityKBuffer,
      other: PriorityKBuffer): PriorityKBuffer = {
    other.foreach((p, i, w) => buf.offer(p, i, w))
    buf
  }

  override def eval(buf: PriorityKBuffer): Any =
    new GenericArrayData(buf.sortedDesc.map { case (p, i, w) =>
      // normalize -0.0 (a zero-weight row) so stored bytes carry one
      // canonical zero on every engine
      InternalRow(if (p == 0.0d) 0.0d else -p, i, w)
    }): ArrayData

  override def serialize(buf: PriorityKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): PriorityKBuffer =
    PriorityKBuffer.fromBytes(m, bytes)

  override def withNewMutableAggBufferOffset(o: Int): PrioritySampleK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): PrioritySampleK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PrioritySampleK =
    copy(id = newChildren(0), weight = newChildren(1))
  override def prettyName: String = "graft_priority_sample_k"
}

/** Min-heap of (priority, id, weight) triples bounded at m; the root is
  * the WORST kept triple (smallest priority, then LARGEST id — the
  * [[TopKBuffer]] order), so `offer` is O(log m) and memory O(m). */
final class PriorityKBuffer(m: Int) {
  private val ps  = new Array[Double](m)
  private val ids = new Array[Long](m)
  private val ws  = new Array[Long](m)
  private var size = 0

  private def worse(p1: Double, i1: Long, p2: Double, i2: Long): Boolean =
    p1 < p2 || (p1 == p2 && i1 > i2)

  def offer(p: Double, id: Long, w: Long): Unit = {
    // priorities from w/u with u >= 1 are never NaN, but the buffer is
    // defensive anyway — a NaN root would freeze eviction (the
    // TopKBuffer rationale)
    if (p.isNaN) return
    if (size < m) {
      var i = size
      ps(i) = p; ids(i) = id; ws(i) = w; size += 1
      while (i > 0 && worse(ps(i), ids(i), ps((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (worse(ps(0), ids(0), p, id)) {
      ps(0) = p; ids(0) = id; ws(0) = w
      siftDown(0)
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val tp = ps(a); ps(a) = ps(b); ps(b) = tp
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    val tw = ws(a); ws(a) = ws(b); ws(b) = tw
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    var continue = true
    while (continue) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var mm = i
      if (l < size && worse(ps(l), ids(l), ps(mm), ids(mm))) mm = l
      if (r < size && worse(ps(r), ids(r), ps(mm), ids(mm))) mm = r
      if (mm == i) continue = false else { swap(i, mm); i = mm }
    }
  }

  def foreach(f: (Double, Long, Long) => Unit): Unit = {
    var i = 0
    while (i < size) { f(ps(i), ids(i), ws(i)); i += 1 }
  }

  /** (priority, id, w) triples by (priority DESC, id ASC). */
  def sortedDesc: Array[(Double, Long, Long)] = {
    val out = new Array[(Double, Long, Long)](size)
    var i = 0
    while (i < size) { out(i) = (ps(i), ids(i), ws(i)); i += 1 }
    out.sortBy { case (p, id, _) => (-p, id) }
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + size * 24)
    bb.putInt(size)
    var i = 0
    while (i < size) {
      bb.putDouble(ps(i)); bb.putLong(ids(i)); bb.putLong(ws(i)); i += 1
    }
    bb.array()
  }
}

object PriorityKBuffer {
  def fromBytes(m: Int, bytes: Array[Byte]): PriorityKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new PriorityKBuffer(m)
    var i = 0
    while (i < n) {
      val p = bb.getDouble; val id = bb.getLong; val w = bb.getLong
      buf.offer(p, id, w)
      i += 1
    }
    buf
  }
}
