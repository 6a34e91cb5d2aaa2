package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single right row with the
  * greatest timestamp <= the left timestamp, per key — the canonical
  * "latest state as of this event" operator (trade/quote alignment,
  * feature lookup at example time). Spark has no native ASOF; a naive
  * phrasing is a per-key theta join that squares inside hot keys.
  *
  * Implementation is the scalable union trick: tag both sides, union
  * into one frame, ONE shuffle+sort on (key, ts, side) — right rows
  * sort BEFORE left rows at equal ts so same-instant state is visible —
  * then `last(right_payload, ignoreNulls)` over the running window
  * carries the latest right row forward; keep the left rows. Cost is
  * one sort-shuffle of |L|+|R| slim rows and no per-key quadratics.
  * Skew caveat: AQE splits skewed partitions only for sort-merge
  * JOINS, not for window operators, so a single hot key still
  * serializes its |L|+|R| rows into one window task; if hot keys are
  * expected, pre-bucket them (e.g. range-partition the key's time
  * axis and as-of within buckets, seeding each bucket with the
  * previous bucket's last right row) before calling this.
  *
  * The right side must be UNIQUE per (key, ts) — pre-aggregate it
  * otherwise (an as-of against duplicate instants is ill-defined; both
  * this and e.g. DuckDB's native ASOF would pick arbitrarily).
  *
  * `tolerance` (same unit as the ts column) optionally voids matches
  * older than `leftTs - tolerance`: the as-of match is the NEWEST
  * candidate, so if it is outside the tolerance window every candidate
  * is, and nulling it is exact — no re-search needed.
  *
  * Right payload columns are emitted as `right_<name>` (like
  * [[RangeJoin]]), so they can never silently overwrite a left column.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      tolerance: Option[Long] = None): DataFrame = {
    val rightPayloadCols = right.columns.filterNot(c => c == keyCol || c == tsCol)
    require(rightPayloadCols.nonEmpty, "right side needs payload columns")
    val reserved = Seq("__side", "__right") ++
      (s"right_$tsCol" +: rightPayloadCols.map(c => s"right_$c"))
    val clashes = left.columns.toSet.intersect(reserved.toSet)
    require(clashes.isEmpty,
      s"left side already has column(s) ${clashes.mkString(", ")} — rename them")
    val payload = struct(
      (col(tsCol).as(s"__asof_$tsCol") +:
        rightPayloadCols.map(c => col(c)).toIndexedSeq): _*)

    val leftTagged = left.withColumn("__side", lit(1))
      .withColumn("__right", lit(null).cast(
        right.select(payload).schema.head.dataType))
    val rightTagged = right
      .select(col(keyCol), col(tsCol), payload.as("__right"))
      .withColumn("__side", lit(0))

    val unioned = leftTagged.select(
        (Seq(col(keyCol), col(tsCol), col("__side"), col("__right")) ++
          left.columns.filterNot(c => c == keyCol || c == tsCol)
            .map(c => col(c))): _*)
      .unionByName(rightTagged, allowMissingColumns = true)

    // right (side 0) sorts before left (side 1) at equal ts
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__match", last(col("__right"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .drop("__side", "__right")

    val guarded = tolerance match {
      case Some(tol) => matched.withColumn("__match",
        when(col(s"__match.__asof_$tsCol") >= col(tsCol) - tol, col("__match")))
      case None => matched
    }
    val out = guarded
      .withColumn(s"right_$tsCol", col(s"__match.__asof_$tsCol"))
    rightPayloadCols.foldLeft(out)((df, c) =>
      df.withColumn(s"right_$c", col(s"__match.$c"))).drop("__match")
  }
}
