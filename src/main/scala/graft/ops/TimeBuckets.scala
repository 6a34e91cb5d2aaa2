package graft.ops

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.functions._

/** Shared exact floor-division for time-bucketing operators
  * ([[AsOfJoin.bucketedAsOf]], [[RangeJoin.intervalJoin]]): pure long
  * arithmetic, overflow-free for the full long range. A double `/`
  * corrupts buckets past 2^53 (nanosecond timestamps); the
  * `ts - pmod(ts, w)` phrasing underflows within `w` of Long.MinValue.
  * Here: truncate with IntegralDivide, then repair toward floor when
  * the remainder is negative — `q*w` and `ts - q*w` stay within
  * `[min(ts,0), max(ts,0)]`. */
private[ops] object TimeBuckets {
  def floorDiv(ts: Column, width: Long): Column = {
    require(width > 0, s"bucket width must be positive, got $width")
    val q = GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        GraftColumnBridge.expression(ts),
        GraftColumnBridge.expression(lit(width))))
    val r = ts - q * lit(width)
    when(r < 0, q - 1).otherwise(q)
  }
}
