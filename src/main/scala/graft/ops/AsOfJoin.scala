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
  * Skew caveat: AQE splits skewed partitions only for sort-merge and
  * shuffled-hash JOINS, not for window operators, so a single hot key
  * still serializes its |L|+|R| rows into one window task under
  * [[AsOfJoin.asOf]]; when hot keys are expected, use
  * [[AsOfJoin.bucketedAsOf]], which range-buckets each key's time axis
  * so a hot key parallelizes across its time buckets (identical
  * output, proven by AsOfJoinSpec).
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
      tolerance: Option[Long] = None): DataFrame =
    asOfImpl(left, right, Seq(keyCol), tsCol, tolerance)

  /** Hot-key-safe as-of: identical output to [[asOf]], but each key's
    * time axis is split into fixed-width buckets
    * (`bucket = floorDiv(ts, bucketWidth)`) and the running window
    * partitions on (key, bucket) — a key with 10M rows over 100 buckets
    * becomes 100 parallel window partitions instead of one serialized
    * task, which is the mitigation AQE cannot provide for window
    * operators.
    *
    * Exactness: a left row in bucket B matches either a right row of
    * its own bucket (visible in the bucket's window) or, if none
    * precedes it there, the LAST right row before the bucket start.
    * That "last before" row is computed per (key, bucket) by a cheap
    * carry-forward pass over per-bucket maxima — one row per (key,
    * bucket), bounded by the time range / bucketWidth, NOT by the hot
    * key's row count — and injected into bucket B as a seed row with
    * its ORIGINAL timestamp (strictly below every left ts in B, so it
    * sorts first and never shadows an in-bucket match).
    *
    * `bucketWidth` is in ts units. Pick it so a hot key's densest
    * bucket fits a window task comfortably; ordinary keys land in one
    * bucket each and pay one extra int through the shuffle. */
  def bucketedAsOf(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, bucketWidth: Long,
      tolerance: Option[Long] = None): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val bucketCol = "__asof_bucket"
    require(!left.columns.contains(bucketCol) && !right.columns.contains(bucketCol),
      s"column name $bucketCol is reserved")
    // exact, overflow-free floor division (shared with RangeJoin; a
    // double `/` would corrupt buckets past 2^53, i.e. nanosecond
    // timestamps — see TimeBuckets)
    def bucketOf(ts: Column): Column = TimeBuckets.floorDiv(ts, bucketWidth)

    val rightPayloadCols = right.columns.filterNot(c => c == keyCol || c == tsCol)
    require(rightPayloadCols.nonEmpty, "right side needs payload columns")

    val leftB = left.withColumn(bucketCol, bucketOf(col(tsCol)))
    val rightB = right.withColumn(bucketCol, bucketOf(col(tsCol)))

    // One row per (key, bucket) on each side: the buckets needing a
    // seed, and each bucket's latest right row (unique ts per contract).
    val leftBuckets = leftB.select(col(keyCol), col(bucketCol)).distinct()
    val lastStruct = struct((col(tsCol) +: rightPayloadCols.map(col)): _*)
    val rightLast = rightB.groupBy(col(keyCol), col(bucketCol))
      .agg(max_by(lastStruct, col(tsCol)).as("__last"))

    // Carry the latest right row forward across the bucket axis. Left
    // bucket-rows order BEFORE right bucket-rows at the same bucket, so
    // a bucket's seed sees only rights from STRICTLY EARLIER buckets
    // (its own rights are already inside the bucket's window).
    val unionBk = leftBuckets
      .select(col(keyCol), col(bucketCol), lit(1).as("__s"),
        lit(null).cast(rightB.select(lastStruct).schema.head.dataType).as("__seed"))
      .unionByName(rightLast.select(col(keyCol), col(bucketCol),
        lit(2).as("__s"), col("__last").as("__seed")))
    val wb = Window.partitionBy(col(keyCol))
      .orderBy(col(bucketCol), col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seeds = unionBk
      .withColumn("__carry", last(col("__seed"), ignoreNulls = true).over(wb))
      .where(col("__s") === 1 && col("__carry").isNotNull)
      .select((Seq(col(keyCol), col(bucketCol),
        col(s"__carry.$tsCol").as(tsCol)) ++
        rightPayloadCols.map(c => col(s"__carry.$c").as(c))): _*)

    // Seed rows adopt the TARGET bucket (their ts stays original, and is
    // < bucket start <= every left ts in the bucket, so they sort first).
    val rightAug = rightB
      .select((Seq(col(keyCol), col(bucketCol), col(tsCol)) ++
        rightPayloadCols.map(col)): _*)
      .unionByName(seeds)

    asOfImpl(leftB, rightAug, Seq(keyCol, bucketCol), tsCol, tolerance)
      .drop(bucketCol)
  }

  private def asOfImpl(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      tolerance: Option[Long]): DataFrame = {
    val rightPayloadCols =
      right.columns.filterNot(c => keyCols.contains(c) || c == tsCol)
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
      .select((keyCols.map(col) :+ col(tsCol)) :+ payload.as("__right"): _*)
      .withColumn("__side", lit(0))

    val unioned = leftTagged.select(
        (keyCols.map(col) ++ Seq(col(tsCol), col("__side"), col("__right")) ++
          left.columns.filterNot(c => keyCols.contains(c) || c == tsCol)
            .map(c => col(c))): _*)
      .unionByName(rightTagged, allowMissingColumns = true)

    // right (side 0) sorts before left (side 1) at equal ts
    val w = Window.partitionBy(keyCols.map(col): _*)
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
