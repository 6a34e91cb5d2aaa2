package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-merge-table BPE application as ONE codegen'd kernel.
  *
  * [[graft.ops.Tokenizer.applyMerge]] applies one merge rule as three
  * array-HOF projections; folding it over the table puts THREE
  * PROJECTIONS PER RULE into the plan, which caps a servable tokenizer
  * at ~256 rules (plan depth / codegen size) while production merge
  * tables hold 30k+ rules. This kernel applies the ENTIRE table inside
  * one expression: the table ships as a codegen reference object (the
  * [[Centroids]] codebook precedent), plan depth is O(1) in the rule
  * count, and per-row work is O(len^2) pair-rank lookups — independent
  * of table size, bounded by [[graft.ops.Tokenizer.MaxWordLen]].
  *
  * EXACT fold parity (the contract, spec-pinned byte-for-byte vs the
  * fold at <= 256 rules): the fold visits rules in round order, each
  * rule doing one left-to-right non-overlapping fuse pass over the
  * sequence AS IT STANDS at that rule's turn; rules whose pair is
  * absent are no-ops. Equivalently: repeatedly find the SMALLEST rule
  * rank strictly greater than the last applied rank whose (l, r) pair
  * is adjacent somewhere in the current sequence, apply that rule's
  * full LTR pass, repeat. The sequence only changes when a rule fires,
  * so skipping the in-between ranks is sound — their pairs are absent
  * at their turn by construction. Each firing shortens the sequence by
  * at least one symbol, so the loop runs at most len-1 times; with the
  * rank scan at O(len) map probes per iteration the word costs
  * O(len^2) probes total. This differs from the classic lowest-rank-
  * first tokenizer serve loop (SentencePiece/tiktoken), which may
  * re-apply an EARLIER rule after a later one creates its pair; the
  * fold never revisits, and parity with [[graft.ops.Tokenizer]]'s
  * training/oracle semantics is the contract here.
  *
  * Symbols are interned to int ids once on the driver; input symbols
  * not in the table (characters the training corpus never saw) map to
  * id -1 — they can never match a rule side (rule ids are >= 0), and
  * their original strings pass through untouched. Duplicate (l, r)
  * pairs at different ranks (impossible in a cleanly trained table,
  * possible in a hand-built one) are kept as per-pair rank chains so
  * "smallest rank > last" stays exact.
  */
object Bpe {

  /** array<string> (symbol sequence) -> array<string>: the sequence
    * after applying every `merges` rule in order, each as one LTR
    * non-overlapping fuse pass — byte-identical to folding
    * [[graft.ops.Tokenizer.applyMerge]] over the table. */
  def bpe_apply(syms: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(
      BpeApply(GraftColumnBridge.expression(syms), merges))

  /** Kernel body (also the codegen call target). */
  def applyTable(in: ArrayData, t: BpeTable): ArrayData = {
    var n = in.numElements()
    if (n <= 1) return in.copy()
    val ids = new Array[Int](n)
    val strs = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val s = in.getUTF8String(i)
      ids(i) = t.symbolId(s)
      strs(i) = s
      i += 1
    }
    var last = -1
    var done = false
    while (!done && n > 1) {
      // smallest rule rank > last whose pair is adjacent right now
      var best = Int.MaxValue
      i = 0
      while (i < n - 1) {
        if (ids(i) >= 0 && ids(i + 1) >= 0) {
          val rk = t.rankAfter(ids(i), ids(i + 1), last)
          if (rk >= 0 && rk < best) best = rk
        }
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val l = t.lIds(best)
        val r = t.rIds(best)
        val m = t.mIds(best)
        val ms = t.symUtf8(m)
        var w = 0
        i = 0
        while (i < n) {
          if (i + 1 < n && ids(i) == l && ids(i + 1) == r) {
            ids(w) = m; strs(w) = ms; i += 2
          } else {
            ids(w) = ids(i); strs(w) = strs(i); i += 1
          }
          w += 1
        }
        n = w
        last = best
      }
    }
    new GenericArrayData(java.util.Arrays.copyOfRange(
      strs.asInstanceOf[Array[AnyRef]], 0, n))
  }
}

/** Interned merge table: serializable plain arrays; lookup structures
  * rebuilt lazily per JVM. `ranks` chains per-pair rule ranks through
  * an open-addressed long(lId<<32|rId) -> head-index probe table. */
case class BpeTable(syms: Array[String], lIds: Array[Int],
    rIds: Array[Int], mIds: Array[Int]) extends Serializable {

  @transient private lazy val symIdx: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](syms.length * 2)
    var i = 0
    while (i < syms.length) { m.put(UTF8String.fromString(syms(i)), i); i += 1 }
    m
  }

  @transient private lazy val symU: Array[UTF8String] =
    syms.map(UTF8String.fromString)

  // open-addressed pair -> rank-chain-head map (power-of-2 probe table)
  @transient private lazy val probe: (Array[Long], Array[Int], Array[Int], Array[Int]) = {
    val nR = lIds.length
    var cap = 16
    while (cap < nR * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val head = new Array[Int](cap)
    java.util.Arrays.fill(head, -1)
    val chainRank = new Array[Int](nR)
    val chainNext = new Array[Int](nR)
    var rk = 0
    while (rk < nR) {
      val k = (lIds(rk).toLong << 32) | (rIds(rk).toLong & 0xffffffffL)
      var s = (java.lang.Long.hashCode(k) & (cap - 1))
      while (head(s) >= 0 && keys(s) != k) s = (s + 1) & (cap - 1)
      keys(s) = k
      chainRank(rk) = rk
      chainNext(rk) = head(s) // prepend; lookup walks the whole chain
      head(s) = rk
      rk += 1
    }
    (keys, head, chainRank, chainNext)
  }

  def symbolId(s: UTF8String): Int = {
    val v = symIdx.get(s)
    if (v eq null) -1 else v.intValue()
  }

  def symUtf8(id: Int): UTF8String = symU(id)

  /** Smallest rule rank > `last` whose pair is (l, r); -1 if none. */
  def rankAfter(l: Int, r: Int, last: Int): Int = {
    val (keys, head, chainRank, chainNext) = probe
    val cap = keys.length
    val k = (l.toLong << 32) | (r.toLong & 0xffffffffL)
    var s = (java.lang.Long.hashCode(k) & (cap - 1))
    while (head(s) >= 0 && keys(s) != k) s = (s + 1) & (cap - 1)
    var c = head(s)
    if (c < 0 || keys(s) != k) return -1
    var best = -1
    while (c >= 0) {
      val rk = chainRank(c)
      if (rk > last && (best < 0 || rk < best)) best = rk
      c = chainNext(c)
    }
    best
  }
}

object BpeTable {
  /** Intern every distinct string among l, r, l+r; one pass. */
  def build(merges: Seq[(String, String)]): BpeTable = {
    val idx = new java.util.HashMap[String, Integer]()
    val strs = scala.collection.mutable.ArrayBuffer.empty[String]
    def intern(s: String): Int = {
      val v = idx.get(s)
      if (v ne null) v.intValue()
      else { val id = strs.length; idx.put(s, id); strs += s; id }
    }
    val n = merges.length
    val l = new Array[Int](n); val r = new Array[Int](n); val m = new Array[Int](n)
    var i = 0
    merges.foreach { case (a, b) =>
      l(i) = intern(a); r(i) = intern(b); m(i) = intern(a + b); i += 1
    }
    BpeTable(strs.toArray, l, r, m)
  }
}

/** array<string> -> array<string>: whole-table BPE application,
  * codegen'd with the interned table as a reference object. */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  @transient private lazy val table: BpeTable = BpeTable.build(merges)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got $t")
  }
  override def dataType: DataType = child.dataType

  override protected def nullSafeEval(v: Any): Any =
    Bpe.applyTable(v.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.applyTable($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApply =
    copy(child = newChild)
  override def prettyName: String = "graft_bpe_apply"
}
