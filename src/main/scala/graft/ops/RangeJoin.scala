package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Interval (range) join: pairs of same-key rows with
  * `rightTs in [leftTs + lower, leftTs + upper]` — "events within the
  * preceding hour", sensor alignment windows, attribution lookbacks.
  *
  * A naive phrasing joins on the key alone and filters the range,
  * which squares inside hot keys. This implementation BINS time into
  * buckets of the window width: each right row lands in one bucket,
  * each left row explodes to the 2-3 buckets its window can touch, the
  * join runs on (key, bucket) and the exact range predicate filters
  * the bucket neighbors out. Hot keys spread over time buckets, join
  * key cardinality grows with the time span, and each qualifying pair
  * is produced exactly once (the right row has ONE bucket).
  *
  * Timestamps and bounds share one unit (e.g. microseconds); bounds
  * may be negative (lookback). Right payload columns are emitted as
  * `right_<name>`.
  */
object RangeJoin {

  // exact, overflow-free floor division (see TimeBuckets: a double `/`
  // corrupts buckets past 2^53, i.e. nanosecond timestamps)
  private def floorDiv(a: Column, w: Long): Column = TimeBuckets.floorDiv(a, w)

  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, lower: Long, upper: Long): DataFrame = {
    require(upper >= lower, s"upper ($upper) < lower ($lower)")
    val w = math.max(upper - lower, 1L)

    val rPayload = right.columns.filterNot(_ == keyCol)
    // Same guards as AsOfJoin: a left frame already carrying __bucket or a
    // right_<x> name would yield ambiguous columns or a wrong drop.
    val reserved = "__bucket" +: rPayload.map(c => s"right_$c")
    val clashes = left.columns.toSet.intersect(reserved.toSet)
    require(clashes.isEmpty,
      s"left side already has column(s) ${clashes.mkString(", ")} — rename them")

    val l = left.withColumn("__bucket",
      explode(sequence(floorDiv(col(tsCol) + lower, w),
        floorDiv(col(tsCol) + upper, w))))
    val r = right.select(
      (col(keyCol) +: rPayload.map(c => col(c).as(s"right_$c")).toIndexedSeq): _*)
      .withColumn("__bucket", floorDiv(col(s"right_$tsCol"), w))

    l.join(r, Seq(keyCol, "__bucket"))
      .where(col(s"right_$tsCol") >= col(tsCol) + lower &&
        col(s"right_$tsCol") <= col(tsCol) + upper)
      .drop("__bucket")
  }
}
