package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Hot-path vector/signature kernels as single-pass custom Catalyst
  * expressions with `doGenCode`.
  *
  * WHY these exist: Spark's higher-order functions (`transform`,
  * `aggregate`, `zip_with`) are INTERPRETED — each lambda invocation
  * walks an expression tree per element, and any expression captured by
  * the lambda (e.g. a regexp over the whole document) is re-evaluated
  * per element. A MinHash signature phrased that way costs
  * O(slots x shingles x |text|) with boxed allocation; phrased as one
  * codegen'd kernel it is O(slots x |text|) over raw bytes with zero
  * allocation. Same story for cosine over embeddings. At 100 TB this is
  * the difference between a narrow cheap scan and a cluster-melting one.
  */
object VectorHashes {

  /** MinHash signature of a string: `numHashes` slot minima over k-byte
    * shingle hashes, one pass. Normalization (lower/space-squash) is the
    * caller's job. */
  def minhash_sig(c: Column, k: Int, numHashes: Int, seed: Long): Column =
    GraftColumnBridge.column(
      MinHashSig(GraftColumnBridge.expression(c), k, numHashes, seed))

  /** Cosine similarity of two float/double array columns, computed like
    * `dot/(sqrt(dot_aa)*sqrt(dot_bb))` with sequential double
    * accumulation (bit-identical to the zip_with+aggregate phrasing and
    * to the DuckDB oracle's explicit fold). Null/zero-norm/length
    * mismatch -> null. */
  def cosine_sim(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSim(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** k-byte-shingle Jaccard similarity of two strings, one pass per
    * string (shingle sets as sorted 64-bit hashes; collision probability
    * ~n^2/2^64 is negligible). Normalization is the caller's job. */
  def ngram_jaccard(a: Column, b: Column, k: Int): Column =
    GraftColumnBridge.column(NgramJaccard(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), k))

  /** Fraction of agreeing slots between two MinHash signatures
    * (array<long>) — the estimated Jaccard. Single pass, codegen'd; the
    * zip_with+aggregate phrasing is interpreted per slot. */
  def sig_agreement(a: Column, b: Column): Column =
    GraftColumnBridge.column(SigAgreement(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Distinct k-byte-shingle count of a string — the SAME set sizes
    * [[ngram_jaccard]] uses (shared `windowHashes`), so
    * `J(a,b) >= t  ==>  min(count_a,count_b) >= t * max(count_a,count_b)`
    * holds exactly and the counts can prefilter candidate pairs before
    * any text join without ever dropping a true pair. */
  def ngram_count(c: Column, k: Int): Column =
    GraftColumnBridge.column(NgramCount(GraftColumnBridge.expression(c), k))

  /** Sorted distinct k-byte-shingle hashes of a string as array<long> —
    * the EXACT set [[ngram_jaccard]] intersects internally, materialized
    * so a doc's shingle pass runs ONCE instead of once per candidate
    * pair; confirm pairs with [[hash_jaccard]] over two such arrays. */
  def ngram_hashes(c: Column, k: Int): Column =
    GraftColumnBridge.column(NgramHashes(GraftColumnBridge.expression(c), k))

  /** Jaccard of two SORTED-DISTINCT long arrays (merge-walk, O(n+m)):
    * `hash_jaccard(ngram_hashes(a,k), ngram_hashes(b,k)) ==
    * ngram_jaccard(a,b,k)` bit-for-bit (same intersection counts, same
    * final division) — pinned by a scalacheck model in KernelProperties. */
  def hash_jaccard(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedHashJaccard(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** k-byte-window repetition ratio of a string (one pass, codegen'd):
    * `1 - distinct_windows / total_windows`. */
  def repetition_ratio(c: Column, k: Int): Column =
    GraftColumnBridge.column(RepetitionRatio(
      GraftColumnBridge.expression(c), k))

  /** binary -> array<double>: L2-normalized `bins`-bin byte-value
    * histogram (bin = byte mod bins). A deterministic content feature
    * for opaque media payloads — the stand-in where a real pipeline
    * plugs a learned encoder; downstream ANN plumbing is identical. */
  def byte_histogram(c: Column, bins: Int): Column =
    GraftColumnBridge.column(ByteHistogram(
      GraftColumnBridge.expression(c), bins))

  /** Random-hyperplane LSH bucket of a vector: bit j of the result is
    * set iff `vec . planes(j) > 0`. All planes in ONE codegen'd pass; the
    * plane matrix rides along as a codegen reference object, NOT as plan
    * literals (a per-plane `cosine > 0` phrasing recomputes both norms
    * per plane — pure waste, the sign only needs the dot — and embeds
    * dim x planes literal doubles in the plan, which at production dims
    * like 1536 re-analyzes tens of thousands of literals per query). */
  def plane_signs(vec: Column, planes: Array[Array[Double]]): Column =
    GraftColumnBridge.column(PlaneSigns(
      GraftColumnBridge.expression(vec), planes.map(_.toSeq).toSeq))

  // ------------------------------------------------------ static kernels

  private final val GOLDEN = 0x9E3779B97F4A7C15L

  /** splitmix64 finalizer — the per-slot hash family mixer. */
  private def mix(x0: Long): Long = {
    var z = x0 + GOLDEN
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def minhashSig(s: UTF8String, k: Int, numHashes: Int, seed: Long): ArrayData = {
    val bytes = s.getBytes
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = bytes.length
    val windows = if (n <= k) 1 else n - k + 1
    val wlen = math.min(k, n)
    var i = 0
    while (i < windows) {
      // FNV-1a over the k-byte window (duplicate windows can't change a min)
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < wlen) {
        h ^= (bytes(i + j) & 0xffL)
        h *= 0x100000001b3L
        j += 1
      }
      var slot = 0
      while (slot < numHashes) {
        val hj = mix(h ^ (seed + slot * GOLDEN))
        if (hj < mins(slot)) mins(slot) = hj
        slot += 1
      }
      i += 1
    }
    if (n == 0) java.util.Arrays.fill(mins, 0L) // empty text: defined, stable
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Fraction of repeated k-byte windows: `1 - distinct/total` (0.0 for
    * texts shorter than k — a single window is trivially distinct).
    * High values flag boilerplate/looping generations (Gopher-style
    * repetition quality rule). */
  def repetitionRatio(s: UTF8String, k: Int): Double = {
    val bytes = s.getBytes
    val n = bytes.length
    val windows = if (n <= k) 1 else n - k + 1
    val distinct = windowHashes(s, k).length
    1.0 - distinct.toDouble / windows.toDouble
  }

  /** Distinct sorted FNV-1a hashes of the k-byte windows of `s`. */
  private def windowHashes(s: UTF8String, k: Int): Array[Long] = {
    val bytes = s.getBytes
    val n = bytes.length
    val windows = if (n <= k) 1 else n - k + 1
    val wlen = math.min(k, n)
    val hs = new Array[Long](windows)
    var i = 0
    while (i < windows) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < wlen) {
        h ^= (bytes(i + j) & 0xffL)
        h *= 0x100000001b3L
        j += 1
      }
      hs(i) = h
      i += 1
    }
    java.util.Arrays.sort(hs)
    // dedupe in place
    var w = 0
    i = 0
    while (i < windows) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(hs, w)
  }

  /** Distinct k-byte-window hash count — `|windowHashes(s, k)|`. */
  def ngramCount(s: UTF8String, k: Int): Int = windowHashes(s, k).length

  /** Sorted distinct k-byte-window hashes — `windowHashes` materialized
    * for callers that confirm many pairs per doc ([[sortedHashJaccard]]). */
  def ngramHashes(s: UTF8String, k: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(windowHashes(s, k))

  /** Jaccard over two sorted-distinct long arrays: the merge-walk and
    * final `inter/union` division are verbatim [[ngramJaccard]]'s, so
    * feeding it `ngramHashes` output reproduces that kernel exactly
    * while paying the per-doc shingle pass once, not once per pair. */
  def sortedHashJaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  def ngramJaccard(a: UTF8String, b: UTF8String, k: Int): Double = {
    val ha = windowHashes(a, k)
    val hb = windowHashes(b, k)
    var i = 0; var j = 0; var inter = 0
    while (i < ha.length && j < hb.length) {
      if (ha(i) == hb(j)) { inter += 1; i += 1; j += 1 }
      else if (ha(i) < hb(j)) i += 1
      else j += 1
    }
    val union = ha.length + hb.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** Agreeing-slot fraction of two long-array signatures; denominator is
    * the LEFT length (mirrors `.../size(sigA)`), extra right slots can't
    * agree. Empty left -> 0.0 (defined, never NaN). */
  def sigAgreement(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n == 0) return 0.0
    val m = math.min(n, b.numElements())
    var i = 0; var agree = 0
    while (i < m) {
      if (a.getLong(i) == b.getLong(i)) agree += 1
      i += 1
    }
    agree.toDouble / n
  }

  /** L2-normalized byte-histogram; integer counts and an exact
    * double-accumulated sum of squares (every addend < 2^53, so the sum
    * equals the exact integer sum — reproducible in any engine). */
  def byteHistogram(bytes: Array[Byte], bins: Int): ArrayData = {
    val counts = new Array[Int](bins)
    var i = 0
    while (i < bytes.length) { counts((bytes(i) & 0xff) % bins) += 1; i += 1 }
    var ss = 0.0
    var j = 0
    while (j < bins) { ss += counts(j).toDouble * counts(j).toDouble; j += 1 }
    val norm = math.sqrt(ss)
    val out = new Array[Double](bins)
    if (norm > 0.0) {
      j = 0
      while (j < bins) { out(j) = counts(j) / norm; j += 1 }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Sign bits of `v . planes(j)` for all planes, one pass over the
    * vector per plane, double accumulation (same products/order as the
    * cast-to-double cosine phrasing, so signs are bit-identical to it). */
  def planeSigns(v: ArrayData, planes: Array[Array[Double]], floatIn: Boolean): Long = {
    val n = v.numElements()
    var bits = 0L
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      val m = math.min(n, p.length)
      var dot = 0.0
      var i = 0
      if (floatIn) {
        while (i < m) { dot += v.getFloat(i).toDouble * p(i); i += 1 }
      } else {
        while (i < m) { dot += v.getDouble(i) * p(i); i += 1 }
      }
      if (dot > 0.0) bits |= (1L << j)
      j += 1
    }
    bits
  }

  /** Sequential-fold cosine; returns null (boxed) on zero norm or
    * length mismatch. `floatIn` selects element accessor. */
  def cosine(a: ArrayData, b: ArrayData, floatIn: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    if (floatIn) {
      while (i < n) {
        val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
    } else {
      while (i < n) {
        val x = a.getDouble(i); val y = b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom > 0.0) dot / denom else null
  }
}

/** string -> array<long> MinHash signature (one pass, codegen'd). */
case class MinHashSig(child: Expression, k: Int, numHashes: Int, seed: Long)
  extends UnaryExpression {
  require(k > 0 && numHashes > 0)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    VectorHashes.minhashSig(v.asInstanceOf[UTF8String], k, numHashes, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorHashes.minhashSig($c, $k, $numHashes, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash_sig"
}

/** (string, string) -> double k-shingle Jaccard (one pass, codegen'd). */
case class NgramJaccard(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {
  require(k > 0)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string inputs, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorHashes.ngramJaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorHashes.ngramJaccard($a, $b, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramJaccard =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_ngram_jaccard"
}

/** binary -> array<double> normalized byte histogram (codegen'd). */
case class ByteHistogram(child: Expression, bins: Int)
  extends UnaryExpression {
  require(bins > 0 && bins <= 256)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    VectorHashes.byteHistogram(v.asInstanceOf[Array[Byte]], bins)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorHashes.byteHistogram($c, $bins)")
  override protected def withNewChildInternal(newChild: Expression): ByteHistogram =
    copy(child = newChild)
  override def prettyName: String = "graft_byte_histogram"
}

/** string -> double k-window repetition ratio (codegen'd). */
case class RepetitionRatio(child: Expression, k: Int)
  extends UnaryExpression {
  require(k > 0)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${child.dataType}")
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    VectorHashes.repetitionRatio(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorHashes.repetitionRatio($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): RepetitionRatio =
    copy(child = newChild)
  override def prettyName: String = "graft_repetition_ratio"
}

/** array<float|double> -> long LSH bucket bits (one codegen'd pass over
  * all hyperplanes; the plane matrix is a reference object, not plan
  * literals). `planes` is Seq-shaped for case-class equality; the kernel
  * sees a primitive double[][]. */
case class PlaneSigns(child: Expression, planes: Seq[Seq[Double]])
  extends UnaryExpression {
  require(planes.nonEmpty && planes.size <= 64,
    s"need 1..64 planes, got ${planes.size}")
  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray
  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> input, got ${child.dataType}")
  private def floatIn: Boolean = elemType.contains(FloatType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    VectorHashes.planeSigns(v.asInstanceOf[ArrayData], planeArr, floatIn)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planeArr, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorHashes.planeSigns($c, $ref, $floatIn)")
  }
  override protected def withNewChildInternal(newChild: Expression): PlaneSigns =
    copy(child = newChild)
  override def prettyName: String = "graft_plane_signs"
}

/** string -> int distinct k-shingle count (one pass, codegen'd; shares
  * the window-hash machinery with [[NgramJaccard]] so counts and Jaccard
  * set sizes can never disagree). */
case class NgramCount(child: Expression, k: Int)
  extends UnaryExpression {
  require(k > 0)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${child.dataType}")
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any): Any =
    VectorHashes.ngramCount(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorHashes.ngramCount($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): NgramCount =
    copy(child = newChild)
  override def prettyName: String = "graft_ngram_count"
}

/** string -> array<long> sorted distinct k-shingle hashes (one pass,
  * codegen'd; shares `windowHashes` with [[NgramJaccard]]/[[NgramCount]]
  * so the materialized sets can never disagree with either). */
case class NgramHashes(child: Expression, k: Int)
  extends UnaryExpression {
  require(k > 0)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    VectorHashes.ngramHashes(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorHashes.ngramHashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
  override def prettyName: String = "graft_ngram_hashes"
}

/** (array<long>, array<long>) -> double Jaccard of two sorted-distinct
  * hash arrays (merge-walk, codegen'd) — [[NgramJaccard]] minus the
  * per-pair shingle passes. */
case class SortedHashJaccard(left: Expression, right: Expression)
  extends BinaryExpression {
  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left) && isLongArray(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<long> inputs, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorHashes.sortedHashJaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorHashes.sortedHashJaccard($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedHashJaccard =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_sorted_hash_jaccard"
}

/** (array<long>, array<long>) -> double agreeing-slot fraction
  * (estimated Jaccard of two MinHash signatures; one pass, codegen'd). */
case class SigAgreement(left: Expression, right: Expression)
  extends BinaryExpression {
  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left) && isLongArray(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<long> inputs, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorHashes.sigAgreement(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorHashes.sigAgreement($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgreement =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_sig_agreement"
}

/** (array<float|double>, array<float|double>) -> double cosine
  * similarity (one pass, codegen'd); null on zero norm / length
  * mismatch / null input. Both sides must share the element type. */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {
  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> or two array<double> inputs, " +
          s"got ${left.dataType} and ${right.dataType}")
    }
  private def floatIn: Boolean = elemType(left).contains(FloatType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorHashes.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], floatIn)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("cos")
      s"""
         |java.lang.Double $boxed = graft.functions.VectorHashes.cosine($a, $b, $floatIn);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_cosine_sim"
}
