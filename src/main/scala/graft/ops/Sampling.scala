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
