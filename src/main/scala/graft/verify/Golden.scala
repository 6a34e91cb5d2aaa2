package graft.verify

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.pipeline.Pipeline

/** The reference's deployment-time verification harness: a test script
  * declares golden inputs and expected outputs (`pb.forInputs` /
  * `pb.expectOutputs`, reference: StreamProcessOperations.scala:33-52),
  * and the engine runs them through the REAL pipeline before streaming
  * starts, refusing to start on any mismatch
  * (StreamProcessOperations.scala:154-165; Plumber.scala:41-50).
  * `--dry-run` = verify and exit (Plumber.scala:53-55,121-123).
  *
  * Spark-first: batch/streaming unification means the same compiled plan
  * runs on a batch DataFrame of the golden inputs — no hand-rolled
  * re-implementation of the fold (which is what the reference does).
  *
  * Semantics preserved: ORDERED sequence equality — output count must
  * match and pairs compare structurally in input order
  * (StreamProcessOperations.scala:156-163). Ordering in a distributed
  * engine is pinned by threading a monotonic `__seq` column through the
  * pipeline (passthrough) and sorting on it after collection (SURVEY
  * §7.4 item 3). The reference's `deepEq` bug — its type-mismatch check
  * result is discarded (StreamProcessOperations.scala:118-120) — is NOT
  * replicated: we compare typed Rows, so types matter.
  */
final case class GoldenMismatch(msg: String) extends RuntimeException(msg)

object Golden {
  private val SEQ = "__seq"

  /** Run `pipeline` over the golden `inputs` (rows with columns key,
    * value) and compare to `expected` in order. Throws [[GoldenMismatch]]
    * on the first difference; returns the actual outputs on success. */
  def verify(spark: SparkSession, pipeline: Pipeline,
      inputs: Seq[Row], inputSchema: StructType,
      expected: Seq[Row]): Seq[Row] = {
    val withSeq = inputs.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i.toLong) }
    val schema = StructType(inputSchema.fields :+
      org.apache.spark.sql.types.StructField(SEQ, org.apache.spark.sql.types.LongType, false))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(withSeq).asJava),
      schema)
    val out = pipeline.compile(df, passthrough = Seq(SEQ))
      .orderBy(col(SEQ)).drop(SEQ)
    val actual = out.collect().toSeq
    if (actual.size != expected.size)
      throw GoldenMismatch(
        s"expected ${expected.size} output records, got ${actual.size}:\n" +
          actual.mkString("\n"))
    actual.zip(expected).zipWithIndex.foreach { case ((a, e), i) =>
      if (!rowEq(a, e)) throw GoldenMismatch(s"record $i mismatch:\n  actual:   $a\n  expected: $e")
    }
    actual
  }

  /** Structural equality over Rows/Seqs/primitives (the deepEq analogue,
    * StreamProcessOperations.scala:117-132, with the type check FIXED).
    * Numeric equality is VALUE-based and EXACT: widths widen (int 5 ==
    * long 5, float == its exact double, long 5 == double 5.0 — the
    * reference's luaj semantics, deepEq coerces 1 == 1.0) via a
    * BigDecimal canonical form, so >2^53 Long-vs-Double coincidences
    * are rejected (see [[widen]]). Same policy as
    * [[graft.runtime.GoldenFile]]'s canonical compare, so the two
    * harnesses can never disagree. */
  def rowEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Row, y: Row) =>
      x.length == y.length && (0 until x.length).forall(i => rowEq(x.get(i), y.get(i)))
    case (x: scala.collection.Seq[_], y: scala.collection.Seq[_]) =>
      x.length == y.length && x.zip(y).forall { case (xe, ye) => rowEq(xe, ye) }
    case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
    case (x, y) => widen(x) == widen(y)
  }

  /** The ONE numeric-widening definition both golden harnesses use
    * ([[rowEq]] here, [[graft.runtime.GoldenFile]]'s canonical form) —
    * shared so the promised cross-harness agreement is structural, not
    * maintained by hand.
    *
    * All finite numerics canonicalize to [[scala.math.BigDecimal]],
    * whose equality is numeric-EXACT: int 5 == long 5 == double 5.0
    * still hold (luaj's deepEq coercion), but Long-vs-Double no longer
    * routes through Scala cooperative equality's lossy Long→Double
    * conversion, which above 2^53 made DISTINCT values compare equal
    * (Long.MaxValue == 9.223372036854776e18) — a silent false-match
    * window for 64-bit fingerprint goldens. NaN/Infinity cannot be
    * BigDecimals and stay on the double path (NaN != NaN, Inf == Inf,
    * as before). */
  private[graft] def widen(v: Any): Any = v match {
    case b: java.lang.Byte => BigDecimal(b.longValue)
    case s: java.lang.Short => BigDecimal(s.longValue)
    case i: java.lang.Integer => BigDecimal(i.longValue)
    case l: java.lang.Long => BigDecimal(l.longValue)
    case f: java.lang.Float if !f.isNaN && !f.isInfinite => BigDecimal(f.doubleValue)
    case d: java.lang.Double if !d.isNaN && !d.isInfinite => BigDecimal(d.doubleValue)
    case f: java.lang.Float => f.doubleValue
    case other => other
  }

  /** Dry-run entry: verify and report, never start the stream
    * (Plumber.scala:53-55 semantics). */
  def dryRun(spark: SparkSession, pipeline: Pipeline,
      inputs: Seq[Row], inputSchema: StructType, expected: Seq[Row]): Boolean =
    try { verify(spark, pipeline, inputs, inputSchema, expected); true }
    catch { case GoldenMismatch(_) => false }
}
