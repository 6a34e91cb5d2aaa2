package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Document-fingerprint hash expressions for the dedup/text-analysis
  * pipeline (LLM-data extension; the reference has no such surface —
  * SURVEY §2.3). Both are single-pass custom Catalyst expressions whose
  * `doGenCode` delegates to the static helpers below, so they stay inside
  * the surrounding whole-stage-codegen span (no CodegenFallback, no UDF
  * serialization).
  */
object TextHashes {

  /** 64-bit SimHash over a token array: bit i of the result is set iff
    * the sum over tokens of (bit i of xxhash64-style token hash ? +1 : -1)
    * is positive. Near-duplicate docs land at small Hamming distance. */
  def simhash64(tokens: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(tokens)))

  /** Polynomial rolling hash (Rabin–Karp, base 1000003, mod 2^64) of a
    * string — an order-sensitive content fingerprint (`md5`-class use,
    * long-sized, codegen'd). */
  def rolling_hash64(c: Column): Column =
    GraftColumnBridge.column(RollingHash64(GraftColumnBridge.expression(c)))

  /** Winnowing fingerprints (the MOSS algorithm, Schleimer/Wilkerson/
    * Aiken 2003): hash every `k`-codepoint gram, slide a `w`-gram
    * window, keep each window's MINIMUM hash; the distinct selected
    * values, sorted, are the document's signature. GUARANTEE: two
    * documents sharing any substring of at least `k + w - 1` codepoints
    * share at least one fingerprint — a substring-overlap detector with
    * a hard detection floor, unlike MinHash (which estimates WHOLE-doc
    * Jaccard and can miss a long verbatim quote inside otherwise
    * different docs). Hashes are FNV-1a over codepoints, truncated to
    * 63 bits so signed and unsigned comparisons agree everywhere
    * (JVM long, parquet, DuckDB BIGINT). */
  def winnow(c: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(Winnow(GraftColumnBridge.expression(c), k, w))

  // ------------------------------------------------------ static helpers
  // (public + JVM-static so generated code can call them)

  /** FNV-1a 64-bit over UTF-8 bytes — a cheap, stable per-token hash.
    * (Deliberately not Spark's xxhash64 so the fingerprint is defined by
    * THIS library, independent of Spark internals.) */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def simhashOf(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h = fnv1a64(arr.getUTF8String(t))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def rollingHashOf(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * 1000003L + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))

  /** [[winnow]]'s evaluator. Codepoint-based (NOT bytes) so the same
    * definition replays in the DuckDB oracle via `unicode(substr(...))`;
    * `>>> 1` keeps every value in the non-negative signed range. A
    * shorter-than-`k` text is one gram (whole text, the shingle-family
    * convention); fewer than `w` grams are one window. O(grams x w)
    * window scan — w is small and bounded, no deque needed. */
  def winnowOf(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    val cps = new Array[Int](str.codePointCount(0, len))
    var ci = 0
    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      cps(ci) = cp; ci += 1; i += Character.charCount(cp)
    }
    val g = math.max(cps.length - k + 1, 1)
    val grams = new Array[Long](g)
    var j = 0
    while (j < g) {
      var h = 0xcbf29ce484222325L
      var t = j
      val end = math.min(j + k, cps.length)
      while (t < end) { h ^= cps(t).toLong; h *= 0x100000001b3L; t += 1 }
      grams(j) = h >>> 1
      j += 1
    }
    val nw = math.max(g - w + 1, 1)
    val selected = new java.util.TreeSet[java.lang.Long]()
    var x = 0
    while (x < nw) {
      var m = java.lang.Long.MAX_VALUE
      var y = x
      val wend = math.min(x + w, g)
      while (y < wend) { if (grams(y) < m) m = grams(y); y += 1 }
      selected.add(m)
      x += 1
    }
    val out = new Array[Long](selected.size)
    var o = 0
    val it = selected.iterator()
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** array<string> -> long SimHash (single pass, codegen'd). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextHashes.simhashOf(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.simhashOf($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash64"
}

/** string -> long polynomial rolling hash (codegen'd). */
case class RollingHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${child.dataType}")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextHashes.rollingHashOf(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.rollingHashOf($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
  override def prettyName: String = "graft_rolling_hash64"
}

/** string -> sorted distinct array<long> winnowing signature
  * (codegen'd; see [[TextHashes.winnow]]). */
case class Winnow(child: Expression, k: Int, w: Int)
  extends UnaryExpression {
  require(k > 0 && w > 0, s"winnow needs k > 0 and w > 0, got k=$k w=$w")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    TextHashes.winnowOf(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.winnowOf($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
  override def prettyName: String = "graft_winnow"
}
