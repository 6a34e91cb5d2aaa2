package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Skew-resilient equi-join via key salting.
  *
  * AQE's skew-join handling splits oversized partitions at runtime, but
  * only for sort-merge joins and only per-shuffle-block granularity;
  * when one key is hot enough (a boilerplate document hash, a null-ish
  * default id) the canonical fix is salting: spread the hot key over
  * `saltFactor` reducers by appending a salt to the join key on the
  * large side and replicating the small side once per salt value.
  *
  * The salt is row-content hash PLUS the row's position
  * (`monotonically_increasing_id`, a pure function of partition id and
  * row index). Position matters: a hot key consisting of byte-identical
  * duplicate rows (boilerplate before dedup — the motivating case)
  * would hash to ONE salt and defeat the spreading if content alone
  * decided it. Determinism caveat: position is stable across task
  * retries ONLY while the upstream lineage recomputes partitions
  * deterministically (a file scan, a sorted shuffle). After a
  * round-robin `repartition()` or other order-non-deterministic
  * shuffle, a retried task can re-derive different salts for the same
  * row — the classic rand()-in-shuffle retry hazard. For such inputs,
  * `localCheckpoint()` (or checkpoint) the frame first to cut the
  * lineage, or salt on a stable unique column instead of position.
  *
  * Cost model: small side shuffles `saltFactor` copies — use for a
  * large-but-not-broadcastable right side and a hot-keyed left side.
  * Supported join types: inner / left / left_semi / left_anti (right
  * rows are replicated, so right/full outer would duplicate unmatched
  * right rows).
  */
object SkewJoin {

  private val SaltCol = "__graft_salt"

  /** The deterministic left-side salt: content hash + row position. */
  private[ops] def saltOf(df: DataFrame, saltFactor: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*) +
      monotonically_increasing_id(), lit(saltFactor)).cast(IntegerType)

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    require(allowed(joinType.toLowerCase),
      s"saltedJoin supports $allowed, got $joinType (replicating the " +
        "right side breaks right/full outer semantics)")
    require(!left.columns.contains(SaltCol) && !right.columns.contains(SaltCol),
      s"column $SaltCol already exists")

    // Deterministic per-row salt on the (large, skewed) left side:
    // content hash + row position, so identical duplicate rows spread.
    val saltedLeft = left.withColumn(SaltCol, saltOf(left, saltFactor))
    // Replicate the right side once per salt value.
    val saltedRight = right.withColumn(SaltCol,
      explode(sequence(lit(0), lit(saltFactor - 1))))

    saltedLeft.join(saltedRight,
        saltedLeft(key) === saltedRight(key) &&
          saltedLeft(SaltCol) === saltedRight(SaltCol),
        joinType)
      .drop(saltedRight(key))
      .drop(saltedLeft(SaltCol)).drop(saltedRight(SaltCol))
  }
}
