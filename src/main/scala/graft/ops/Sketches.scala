package graft.ops

import java.math.BigInteger
import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Mergeable sketch aggregates for cardinality at 100 TB scale.
  *
  * KMV ("k minimum values", Bar-Yossef et al. 2002): keep the k smallest
  * DISTINCT hash values seen; if the stream held n distinct keys, the
  * k-th smallest hash sits near `k/n` of the unsigned hash space, so
  * `(k-1) * 2^64 / kth` estimates n (the classic unbiased form). The
  * buffer is O(k) regardless of input size, partial aggregation happens
  * map-side, and merge is a bounded set-union — exactly the shape an
  * exact `count(DISTINCT x)` lacks: exact distinct must shuffle every
  * distinct key (Spark's Expand doubles the scan for the multi-distinct
  * case), while the sketch ships `32 * k` bytes per partition, a
  * constant, whatever the key cardinality. At 100 TB the sketch is the
  * only viable per-group distinct count; the estimator's relative error
  * is ~`1/sqrt(k-2)` (~6% at k=256).
  *
  * Determinism contract (what makes the DuckDB oracle replayable): the
  * kept set is a pure function of the input VALUE SET — no RNG, no
  * insertion-order sensitivity — and the estimate is pure integer
  * arithmetic (floor((k-1) * 2^64 / kth), no doubles), so partitioning
  * cannot change a single output bit.
  *
  * (LLM-data-pipeline extension; the reference is a stateless
  * record-at-a-time transformer with no aggregate surface — SURVEY
  * §2.3.)
  */
object Sketches {

  /** KMV distinct-count sketch over a pre-hashed column (pair with
    * [[graft.functions.LongHashes.splitmix64]] — a bijection, so
    * distinct keys map 1:1 to distinct hashes). Returns a struct:
    * `n_kept` (kept set size), `kth` (largest kept hash, signed-bits
    * long; null while n_kept < k), `est` (estimated distinct count —
    * exact `n_kept` while the buffer isn't full). */
  def kmvDistinct(hash: Column, k: Int): Column =
    GraftColumnBridge.column(
      KmvDistinct(GraftColumnBridge.expression(hash), k)
        .toAggregateExpression())
}

/** TypedImperativeAggregate holding the k smallest distinct unsigned
  * 64-bit hash values. */
case class KmvDistinct(hash: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {
  require(k >= 2, s"KMV needs k >= 2, got $k") // estimator divides by k-1

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long hash input, got ${hash.dataType.simpleString}; " +
        "hash keys first (e.g. graft_splitmix64)")

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_kept", IntegerType, nullable = false),
    StructField("kth", LongType, nullable = true),
    StructField("est", LongType, nullable = false)))

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val h = hash.eval(input)
    if (h != null) buf.offer(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    other.foreach(buf.offer)
    buf
  }

  override def eval(buf: KmvBuffer): Any = {
    val n = buf.size
    if (n < k) InternalRow(n, null, n.toLong)
    else InternalRow(n, buf.kth, KmvDistinct.estimate(k, buf.kth))
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(hash = newChildren(0))
  override def prettyName: String = "graft_kmv_distinct"
}

object KmvDistinct {
  /** floor((k-1) * 2^64 / unsigned(kth)), clamped to Long.MaxValue —
    * pure integer arithmetic so both engines agree bit-for-bit. */
  def estimate(k: Int, kth: Long): Long = {
    val q = BigInteger.valueOf(k - 1L).shiftLeft(64)
      .divide(new BigInteger(java.lang.Long.toUnsignedString(kth)))
    if (q.bitLength > 63) Long.MaxValue else q.longValueExact()
  }
}

/** Bounded sorted set of the k smallest distinct longs under UNSIGNED
  * order (the hash space is uniform over [0, 2^64)). O(log k) offer,
  * O(k) memory. */
final class KmvBuffer(k: Int) {
  private val set = new java.util.TreeSet[java.lang.Long](
    (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b))

  def offer(h: Long): Unit = {
    if (set.size < k) { set.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, set.last) < 0) {
      if (set.add(h)) set.pollLast()
      ()
    }
  }

  def size: Int = set.size
  /** Largest kept hash (unsigned order) — the k-th minimum when full. */
  def kth: Long = set.last
  def foreach(f: Long => Unit): Unit = set.forEach(h => f(h))

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + set.size * 8)
    bb.putInt(set.size)
    set.forEach(h => { bb.putLong(h); () })
    bb.array()
  }
}

object KmvBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.offer(bb.getLong); i += 1 }
    buf
  }
}
