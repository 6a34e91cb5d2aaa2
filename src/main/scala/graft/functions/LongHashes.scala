package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Integer-key hash expressions (sketch building blocks). Codegen'd like
  * the [[TextHashes]] kernels: `doGenCode` delegates to the static
  * helper so the expression stays inside the surrounding whole-stage
  * span. */
object LongHashes {

  /** SplitMix64 finalizer (Steele/Lea/Flood's SplittableRandom mix,
    * Vigna's public reference constants) — a 64-bit bijection with
    * avalanche, mapping any long key to a uniform pseudo-random long.
    * Bijectivity matters for the KMV sketch: distinct keys stay
    * distinct after hashing, so sketching hashes is sketching keys. */
  def splitmix64(c: Column): Column =
    GraftColumnBridge.column(SplitMix64(GraftColumnBridge.expression(c)))

  def splitmix64Of(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}

/** long -> long SplitMix64 mix (codegen'd). */
case class SplitMix64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    LongHashes.splitmix64Of(v match {
      case b: Byte => b.toLong
      case s: Short => s.toLong
      case i: Int => i.toLong
      case l: Long => l
    })
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LongHashes.splitmix64Of((long) $c)")
  override protected def withNewChildInternal(newChild: Expression): SplitMix64 =
    copy(child = newChild)
  override def prettyName: String = "graft_splitmix64"
}
