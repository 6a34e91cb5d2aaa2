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
