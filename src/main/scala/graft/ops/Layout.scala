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

  // 3-D spread (stride 3): after all five steps, input bit i sits at
  // output bit 3i. Standard Morton3D constants; 21 input bits -> 63
  // output bits, so inputs must be in [0, 2^21).
  private val steps3 = Seq(
    32 -> 0x001F00000000FFFFL,
    16 -> 0x001F0000FF0000FFL,
    8 -> 0x100F00F00F00F00FL,
    4 -> 0x10C30C30C30C30C3L,
    2 -> 0x1249249249249249L)

  /** Expression tree spreading the low 21 bits of `e` with stride 3:
    * bit i -> bit 3i. */
  def spreadBits3Expr(e: Expression): Expression =
    steps3.foldLeft(e) { case (acc, (s, m)) =>
      BitwiseAnd(BitwiseOr(acc, ShiftLeft(acc, Literal(s))), Literal(m))
    }

  /** 3-D Morton key: x on bit positions 3i, y on 3i+1, z on 3i+2. All
    * inputs MUST be in [0, 2^21) (21 bits x 3 dims = 63 bits, sign bit
    * clear) — mask or bucket wider dims first. Three clustered dims is
    * the practical lakehouse ceiling: each added dim divides the
    * per-dim selectivity a z-range bucket can offer. */
  def zValue3Expr(x: Expression, y: Expression, z: Expression): Expression =
    BitwiseOr(
      spreadBits3Expr(Cast(x, LongType)),
      BitwiseOr(
        ShiftLeft(spreadBits3Expr(Cast(y, LongType)), Literal(1)),
        ShiftLeft(spreadBits3Expr(Cast(z, LongType)), Literal(2))))

  /** Column surface of [[zValue3Expr]]. */
  def zValue3(x: Column, y: Column, z: Column): Column =
    GraftColumnBridge.column(zValue3Expr(
      GraftColumnBridge.expression(x), GraftColumnBridge.expression(y),
      GraftColumnBridge.expression(z)))

  /** 2-D Hilbert index (the published xy2d bit algorithm, `order`
    * rounds): the space-filling curve WITHOUT Morton's long diagonal
    * jumps — consecutive Hilbert indexes are always grid-adjacent, so
    * equal-width index buckets bound both dimensions at least as
    * tightly as z-buckets and never split a bucket across the plane's
    * diagonal seam. Same write-once layout bill as [[zValue]]
    * (`repartitionByRange(h).sortWithinPartitions(h)`); pick Hilbert
    * when range predicates dominate, Morton when the cheap spread
    * arithmetic matters in the write path.
    *
    * Unlike the Morton spreads, each round's outputs cross-reference
    * BOTH current coordinates (reflect + swap), so a single Column
    * tree would re-inline the state exponentially; instead each round
    * is one chained projection over named state columns — the plan
    * stays linear in `order` and every operator is a built-in
    * codegen'd expression (no UDF, no kernel). The DuckDB oracle
    * replays the same rounds as a CTE chain.
    *
    * Inputs MUST lie in [0, 2^order); `order` <= 31 keeps d = x*y
    * interleavings within the positive long range. State columns are
    * prefixed `_h` and dropped on exit.
    *
    * Planning-cost note: the chained projections keep the PLAN linear,
    * but Catalyst's collapse of the 31 rounds still produces a large
    * single expression tree — a real one-time planning/codegen cost at
    * order 31 (measured as q_hilbert's cold-vs-warm gap). Layout keys
    * don't need full coordinate precision: prefer order <= 16 (a 2^16
    * x 2^16 grid outnumbers any realistic partition count by orders of
    * magnitude), where planning cost is negligible. */
  def hilbertIndex(df: org.apache.spark.sql.DataFrame, xCol: String,
      yCol: String, order: Int, outCol: String = "hilbert")
      : org.apache.spark.sql.DataFrame = {
    require(order >= 1 && order <= 31, "order must be in [1, 31]")
    import org.apache.spark.sql.functions._
    val n = 1L << order
    var cur = df
      .withColumn("_hx", col(xCol).cast(LongType))
      .withColumn("_hy", col(yCol).cast(LongType))
      .withColumn("_hd", lit(0L))
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = when(col("_hx").bitwiseAND(lit(s)) > 0, lit(1L))
        .otherwise(lit(0L))
      val ry = when(col("_hy").bitwiseAND(lit(s)) > 0, lit(1L))
        .otherwise(lit(0L))
      cur = cur.withColumns(Map(
        "_hd" -> (col("_hd") +
          lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry)),
        // rot: if ry==0 reflect (about the FULL n-1 — the xy2d
        // published form) when rx==1, then swap x and y
        "_hx" -> when(ry === 0,
          when(rx === 1, lit(n - 1) - col("_hy")).otherwise(col("_hy")))
          .otherwise(col("_hx")),
        "_hy" -> when(ry === 0,
          when(rx === 1, lit(n - 1) - col("_hx")).otherwise(col("_hx")))
          .otherwise(col("_hy"))))
      s >>= 1
    }
    cur.withColumnRenamed("_hd", outCol).drop("_hx", "_hy")
  }

  /** DETERMINISTIC balanced range bucketing — the single-column
    * sorted-layout primitive next to the multi-dim curves above:
    * assign each row a `bucket` in 0..nBuckets-1 such that buckets
    * partition the VALUE ORDER (every value in bucket b <= every value
    * in bucket b+1) and each holds ~1/nBuckets of the rows, with
    * boundaries from the [[Sketches.quantileSketch]] of
    * `splitmix64(idCol)` via [[Sketches.sketchEdges]].
    *
    * Why not `repartitionByRange`: Spark's RangePartitioner draws its
    * boundaries from a nondeterministic reservoir sample, so the same
    * write job produces different file boundaries run to run —
    * unreproducible layout, unreplayable downstream pruning stats.
    * These boundaries are a pure function of the row set: retry-, AQE-,
    * and engine-stable (the oracle replays every bucket id). Write
    * with `.repartition(col("bucket")).sortWithinPartitions(valueCol)`
    * for the clustered layout; the sketch is one bounded aggregate
    * (16k bytes per partition), the assignment a broadcast of
    * `nBuckets-1` longs onto a narrow scan — no sampling job, no
    * second pass.
    *
    * `valueCol` must be integral (fixed-point doubles first — the
    * house pattern); heavy ties at a boundary all land in one bucket
    * (buckets stay order-correct, balance degrades with skew —
    * exactly like any range partitioning). Rows with NULL `valueCol`
    * get a NULL bucket (they carry no position in the value order —
    * [[Sketches.edgeBucket]] refuses to mingle them with bucket 0);
    * filter or route them to an explicit bucket before writing. */
  def rangeBucketByQuantiles(df: org.apache.spark.sql.DataFrame,
      idCol: String, valueCol: String, nBuckets: Int,
      k: Int = 1024): org.apache.spark.sql.DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    require(k >= nBuckets, s"sketch k ($k) must be >= nBuckets ($nBuckets)")
    require(!df.columns.contains("bucket"),
      "column name `bucket` is reserved — rename it")
    import org.apache.spark.sql.functions._
    val edges = df.where(col(valueCol).isNotNull)
      .agg(Sketches.quantileSketch(
        graft.functions.LongHashes.splitmix64(col(idCol)),
        col(valueCol), k).as("qs"))
      .select(Sketches.sketchEdges(col("qs"), nBuckets).as("__edges"))
    df.crossJoin(broadcast(edges))
      .withColumn("bucket",
        Sketches.edgeBucket(col("__edges"), col(valueCol))
          .cast(org.apache.spark.sql.types.IntegerType))
      .drop("__edges")
  }

  /** ZONE-MAP statistics — the per-file min/max index every columnar
    * reader consults before touching a file (parquet row-group stats,
    * Iceberg/Delta file stats): one row per `fileCol` unit with its
    * row count and the [lo, hi] envelope of `valueCol`. Feed it a
    * simulated layout (a [[rangeBucketByQuantiles]] / [[zValue]]
    * bucket standing in for the write unit) or a real file id. ONE
    * map-side-partial aggregate; the output is #files rows, driver-
    * safe at any corpus size. */
  def zonemapStats(df: org.apache.spark.sql.DataFrame, fileCol: String,
      valueCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    df.groupBy(col(fileCol).as("file"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
  }

  /** PRUNING AUDIT over [[zonemapStats]] output for a closed band
    * predicate `valueCol BETWEEN lo AND hi`: ONE summary row —
    * `n_files`, `files_read` (files whose [lo, hi] envelope intersects
    * the band — exactly the files a zone-map-aware scan cannot skip),
    * and `rows_scanned` (their row mass). The number that justifies
    * the layout family: the same predicate against a value-clustered
    * layout reads a band-sized slice of files where an ingestion-order
    * layout reads ALL of them — scan amplification made measurable
    * BEFORE paying for a 100 TB rewrite. Pure arithmetic over the
    * #files-row stats frame; nothing big moves. */
  def pruneAudit(stats: org.apache.spark.sql.DataFrame, lo: Long,
      hi: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(lo <= hi, s"band must be ordered, got [$lo, $hi]")
    val overlaps = col("hi") >= lo && col("lo") <= hi
    stats.agg(
      count(lit(1)).as("n_files"),
      sum(when(overlaps, 1L).otherwise(0L)).as("files_read"),
      sum(when(overlaps, col("n_rows")).otherwise(0L)).as("rows_scanned"))
  }

  /** Generic artifact compaction: range-partition by `keyCols` and
    * sort within partitions — the one recipe behind every *Compact op
    * in the incremental-artifact family ([[graft.ops.Dedup
    * .winnowIndexCompact]], [[graft.ops.Similarity.ivfPqIndexCompact]]
    * and the round-19 members). N nightly merge/append folds each
    * union another snapshot's files, scattering any probe key's rows
    * across every fold's output; this rewrite co-locates them so a
    * serve join touches one partition's files per key instead of all
    * of history's. PURE LAYOUT: the row set (multiset) is untouched —
    * `compactByKey(fold(...)) == fold(...)` exactly, schema metadata
    * (artifact stamps) included, so a compacted artifact slots
    * anywhere the uncompacted one does. Cost: one range exchange, the
    * bill of a single-column sort. */
  def compactByKey(df: org.apache.spark.sql.DataFrame,
      keyCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    require(keyCols.nonEmpty, "compactByKey: need at least one key col")
    val missing = keyCols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"compactByKey: key column(s) ${missing.mkString(", ")} absent " +
        s"(columns: ${df.columns.mkString(", ")})")
    df.repartitionByRange(keyCols.map(col): _*)
      .sortWithinPartitions(keyCols.map(col): _*)
  }
}
