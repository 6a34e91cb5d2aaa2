package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Single-pass document-statistics kernel.
  *
  * The expression-library phrasing of these features
  * (split/filter/aggregate/regexp_extract_all/regexp_replace) costs ~6
  * interpreted higher-order-function or regex passes per document, with
  * several re-tokenizations. This kernel computes the whole feature
  * struct in two scans (one over the original text, one over the
  * lowercased text) with no regex engine and no per-token allocation
  * beyond the stopword probe.
  *
  * Semantics are pinned to the Java-regex phrasing it replaces (and to
  * the DuckDB oracle that phrasing was validated against):
  *  - whitespace = Java `\s` = ASCII {space, \t, \n, \x0B, \f, \r};
  *  - word-token characters = `\p{L}` (Unicode letter) and `\p{N}`
  *    (Unicode number: Nd, Nl, No);
  *  - subword tokens = `[A-Za-z]+ | [0-9] | [^A-Za-z0-9\s]` scanned
  *    leftmost, code-point-wise;
  *  - lowercasing is NOT done here: the caller passes `lower(text)` so
  *    Spark's own lowercase semantics (1:N mappings included) apply.
  */
object TextStatsKernel {

  /** `(text, lower(text)) -> struct` of the standard quality features. */
  def text_stats(text: Column, lowered: Column): Column =
    GraftColumnBridge.column(TextStats(
      GraftColumnBridge.expression(text), GraftColumnBridge.expression(lowered)))

  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens_ws", LongType, nullable = false),
    StructField("n_tokens_subword", LongType, nullable = false),
    StructField("mean_token_len", DoubleType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("quality", DoubleType, nullable = false)))

  /** Canonical English stopword probe — the SINGLE list shared with
    * [[graft.ops.TextAnalysis]] (which must stay bit-identical to this
    * kernel); edit here, never fork a copy. */
  val StopwordList: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "on", "for", "with", "as", "at", "by")

  private val stopwords: java.util.Set[String] = {
    val s = new java.util.HashSet[String]()
    StopwordList.foreach(s.add)
    s
  }
  // token-length fast path bound derives from the list, so growing it
  // with a longer word can never silently disable the probe for that word
  private val maxStopwordLen = StopwordList.map(_.length).max

  @inline private def isAsciiWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  @inline private def isWordCp(cp: Int): Boolean = {
    if (Character.isLetter(cp)) true
    else {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
        t == Character.OTHER_NUMBER
    }
  }

  def textStats(text: UTF8String, lowered: UTF8String): InternalRow = {
    val s = text.toString
    // ---- pass 1: original text (counts, whitespace/subword tokens, punct)
    var nChars = 0L
    var nWs = 0L
    var nSub = 0L
    var punct = 0L
    var inWsToken = false
    var inLetterRun = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      nChars += 1
      val ws = isAsciiWs(cp)
      if (!ws && !inWsToken) nWs += 1
      inWsToken = !ws
      val asciiLetter = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')
      if (asciiLetter) {
        if (!inLetterRun) nSub += 1
        inLetterRun = true
      } else {
        inLetterRun = false
        if (!ws) nSub += 1 // digit or other non-space symbol: one token each
      }
      if (cp == '.' || cp == ',' || cp == ';' || cp == ':' || cp == '!' || cp == '?')
        punct += 1
      i += Character.charCount(cp)
    }
    // ---- pass 2: lowered text (word tokens: count, total len, stopwords)
    val lt = lowered.toString
    var nTok = 0L
    var tokLenSum = 0L
    var stopHits = 0L
    var tokStart = -1
    var tokLen = 0L
    i = 0
    def endToken(endIdx: Int): Unit = {
      if (tokStart >= 0) {
        nTok += 1
        tokLenSum += tokLen
        if (endIdx - tokStart <= maxStopwordLen &&
            stopwords.contains(lt.substring(tokStart, endIdx)))
          stopHits += 1
        tokStart = -1
        tokLen = 0L
      }
    }
    while (i < lt.length) {
      val cp = lt.codePointAt(i)
      if (isWordCp(cp)) {
        if (tokStart < 0) tokStart = i
        tokLen += 1
      } else endToken(i)
      i += Character.charCount(cp)
    }
    endToken(lt.length)

    val meanTokenLen = if (nTok > 0) tokLenSum.toDouble / nTok.toDouble else 0.0
    val punctRatio = if (nChars > 0) punct.toDouble / nChars.toDouble else 0.0
    val stopRatio = if (nTok > 0) stopHits.toDouble / nTok.toDouble else 0.0
    // quality formula — identical op order to the Column phrasing:
    // (min(len/200,1) + (1 - min(punct*5,1)) + min(stop*4,1)) / 3
    val lenScore = math.min(nChars.toDouble / 200.0, 1.0)
    val punctScore = 1.0 - math.min(punctRatio * 5.0, 1.0)
    val stopScore = math.min(stopRatio * 4.0, 1.0)
    val quality = (lenScore + punctScore + stopScore) / 3.0

    new GenericInternalRow(Array[Any](
      nChars, nWs, nSub, meanTokenLen, punctRatio, stopRatio, quality))
  }
}

/** Single-pass character-diversity kernel: per-codepoint counts folded
  * into the Simpson index (collision probability) — the integer-exact
  * repetitiveness metric. `simpson = sum(c_i^2) / n^2` is the
  * probability two uniformly drawn characters match; boilerplate and
  * degenerate text (padding runs, template spam) score high, natural
  * prose low. Unlike Shannon entropy there is NO transcendental call:
  * the struct carries the exact integer numerator `sum_sq` and `n_cp`,
  * and the double is one division of exactly-representable operands —
  * so a DuckDB oracle that counts the same codepoints reproduces every
  * bit, and estimates can be compared across engines/runs safely.
  *
  * One pass over the string's code points; ASCII counts live in a flat
  * 128-slot array (the common case allocates nothing else), the
  * supplementary tail in a map. Long counters: a 2^31-char document of
  * one repeated codepoint gives c^2 = 2^62, still in range.
  */
object CharDiversityKernel {

  /** `text -> struct(n_cp, n_distinct, sum_sq, simpson)`. */
  def char_diversity(text: Column): Column =
    GraftColumnBridge.column(CharDiversity(GraftColumnBridge.expression(text)))

  val schema: StructType = StructType(Seq(
    StructField("n_cp", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("simpson", DoubleType, nullable = false)))

  def diversity(text: UTF8String): InternalRow = {
    val s = text.toString
    val ascii = new Array[Long](128)
    var other: java.util.HashMap[Integer, Array[Long]] = null
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      n += 1
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Array[Long]]()
        val cell = other.computeIfAbsent(cp, _ => new Array[Long](1))
        cell(0) += 1
      }
      i += Character.charCount(cp)
    }
    var sumSq = 0L
    var distinct = 0L
    var j = 0
    while (j < 128) {
      val c = ascii(j)
      if (c > 0) { sumSq += c * c; distinct += 1 }
      j += 1
    }
    if (other != null) {
      distinct += other.size
      val it = other.values().iterator()
      while (it.hasNext) { val c = it.next()(0); sumSq += c * c }
    }
    // one division of two exactly-converted longs — the oracle's
    // CAST(sum_sq AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
    // performs the identical IEEE ops, so the double matches bit-for-bit
    val simpson =
      if (n == 0L) 0.0 else sumSq.toDouble / (n.toDouble * n.toDouble)
    new GenericInternalRow(Array[Any](n, distinct, sumSq, simpson))
  }
}

/** string -> struct(n_cp, n_distinct, sum_sq, simpson) — fused
  * character-diversity pass (codegen'd). */
case class CharDiversity(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")
  override def dataType: DataType = CharDiversityKernel.schema
  override protected def nullSafeEval(t: Any): Any =
    CharDiversityKernel.diversity(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.CharDiversityKernel.diversity($t)")
  override protected def withNewChildInternal(newChild: Expression): CharDiversity =
    copy(child = newChild)
  override def prettyName: String = "graft_char_diversity"
}

/** (string, string) -> struct of document quality features (one fused
  * pass per side, codegen'd). Second child MUST be `lower(first)` — kept
  * outside the kernel so Spark's lowercase semantics apply verbatim. */
case class TextStats(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string inputs, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = TextStatsKernel.schema
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextStatsKernel.textStats(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextStatsKernel.textStats($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TextStats =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_text_stats"
}
