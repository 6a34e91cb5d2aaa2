package graft.ops

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, Cast, Expression, Literal, ShiftLeft}
import org.apache.spark.sql.types.LongType

/** Multi-dimensional data layout: Z-order (Morton) interleaving.
  *
  * A parquet/ORC scan prunes row groups by per-column min/max, which a
  * plain `ORDER BY a` layout only makes selective for `a`. Writing the
  * table sorted by the bit-interleaved `zValue(a, b)` instead clusters
  * rows so that ANY contiguous z-range bounds BOTH dimensions (a
  * z-bucket `z >> 2k` fixes all but the low k bits of each dim), so
  * point/range predicates on either column skip most row groups. This
  * is the standard lakehouse multi-dimensional clustering recipe; at
  * 100 TB it is a write-once `repartitionByRange(zValue).
  * sortWithinPartitions(zValue)` whose cost is one range shuffle —
  * the same bill as a single-column sort — while accelerating two
  * predicate columns instead of one.
  *
  * The interleave is PURE integer bit arithmetic (five shift-or-mask
  * spread steps per dimension — the classic 32-bit "spread bits"
  * construction), built from Spark's own codegen'd bitwise expressions;
  * no UDF, no custom kernel needed, and the DuckDB oracle replays the
  * identical formula in BIGINT.
  *
  * (LLM-data-pipeline / lakehouse extension; the reference has no
  * storage layout surface at all — SURVEY §2.3 "Scans".)
  */
object Layout {

  // Spread steps: after all five, input bit i sits at output bit 2i.
  // Masks are the standard Morton constants.
  private val steps = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Expression tree spreading the low 32 bits of `e` onto even bit
    * positions: bit i -> bit 2i. Codegen'd end-to-end (composed from
    * built-in ShiftLeft/BitwiseOr/BitwiseAnd). */
  def spreadBitsExpr(e: Expression): Expression =
    steps.foldLeft(e) { case (acc, (s, m)) =>
      BitwiseAnd(BitwiseOr(acc, ShiftLeft(acc, Literal(s))), Literal(m))
    }

  /** 2-D Morton key: x's bits on even positions, y's on odd. Both
    * inputs MUST be in [0, 2^31) — y's bit 31 would land on the sign
    * bit — which callers establish by construction (ids, day/hour
    * indexes) or by pre-masking. Result is a non-negative long usable
    * directly in `repartitionByRange`/`sortWithinPartitions`. */
  def zValueExpr(x: Expression, y: Expression): Expression =
    BitwiseOr(
      spreadBitsExpr(Cast(x, LongType)),
      ShiftLeft(spreadBitsExpr(Cast(y, LongType)), Literal(1)))

  /** Column surface of [[zValueExpr]]. */
  def zValue(x: Column, y: Column): Column =
    GraftColumnBridge.column(zValueExpr(
      GraftColumnBridge.expression(x), GraftColumnBridge.expression(y)))
}
