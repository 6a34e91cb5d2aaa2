package graft.ops

import java.math.BigInteger
import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable sketch aggregates for cardinality at 100 TB scale.
  *
  * KMV ("k minimum values", Bar-Yossef et al. 2002): keep the k smallest
  * DISTINCT hash values seen; if the stream held n distinct keys, the
  * k-th smallest hash sits near `k/n` of the unsigned hash space, so
  * `(k-1) * 2^64 / kth` estimates n (the classic unbiased form). The
  * buffer is O(k) regardless of input size, partial aggregation happens
  * map-side, and merge is a bounded set-union — exactly the shape an
  * exact `count(DISTINCT x)` lacks: exact distinct must shuffle every
  * distinct key (Spark's Expand doubles the scan for the multi-distinct
  * case), while the sketch ships `16 * k` bytes per partition, a
  * constant, whatever the key cardinality. At 100 TB the sketch is the
  * only viable per-group distinct count; the estimator's relative error
  * is ~`1/sqrt(k-2)` (~6% at k=256).
  *
  * Determinism contract (what makes the DuckDB oracle replayable): the
  * kept set is a pure function of the input VALUE SET — no RNG, no
  * insertion-order sensitivity — and the estimate is pure integer
  * arithmetic (floor((k-1) * 2^64 / kth), no doubles), so partitioning
  * cannot change a single output bit.
  *
  * Quantiles: the CLASSIC quantile sketches (t-digest, KLL, GK) are
  * deliberately absent — their compaction decisions depend on arrival
  * order, so two runs over different partitionings return different
  * (both "valid") summaries: unverifiable against an oracle and
  * unstable across retries, the same reason Misra-Gries heavy-hitter
  * summaries were rejected (see [[heavyHitters]]). The quantile member
  * of this family is instead [[quantileSketch]]: a bounded bottom-k-
  * by-row-hash VALUE sample, where every retention decision is
  * hash-derived (the repo's standing determinism recipe) — mergeable
  * (bottom-k of a union == union of bottom-k's), O(k) like its
  * siblings, and a pure function of the input row set, so the DuckDB
  * oracle replays the sketch itself, not just its contract. The
  * deterministic alternatives remain for other operating points:
  * exact percentiles where a sorted pass is affordable (q_len_stats),
  * fixed-RATE hash sampling (q_quantile_sample, size grows with the
  * data), and fixed-width-bin histograms (q_histogram).
  *
  * (LLM-data-pipeline extension; the reference is a stateless
  * record-at-a-time transformer with no aggregate surface — SURVEY
  * §2.3.)
  */
object Sketches {

  /** KMV distinct-count sketch over a pre-hashed column (pair with
    * [[graft.functions.LongHashes.splitmix64]] — a bijection, so
    * distinct keys map 1:1 to distinct hashes). Returns a struct:
    * `n_kept` (kept set size), `kth` (largest kept hash, signed-bits
    * long; null while n_kept < k), `est` (estimated distinct count —
    * exact `n_kept` while the buffer isn't full). */
  def kmvDistinct(hash: Column, k: Int): Column =
    GraftColumnBridge.column(
      KmvDistinct(GraftColumnBridge.expression(hash), k)
        .toAggregateExpression())

  /** [[hllDistinct]]'s stamped estimator constant `alpha_m * m^2` —
    * ONE definition shared by the op and the oracle builder so the
    * literal cannot drift. */
  private[graft] def hllAlphaM2(p: Int): Double = {
    val m = 1 << p
    (0.7213 / (1.0 + 1.079 / m)) * m * m
  }

  /** HYPERLOGLOG distinct estimate (Flajolet, Fusy, Gandouet &
    * Meunier 2007) over a pre-hashed 64-bit column — the
    * industry-standard bounded-state distinct sketch beside
    * [[kmvDistinct]]: `m = 2^p` one-byte registers per group vs KMV's
    * k 8-byte hashes, mergeable by elementwise max (KMV union keeps
    * sets). RAW estimator ONLY, documented: the paper's small-range
    * (linear counting) and large-range corrections both need libm
    * `log`, which the determinism contract bans — so expect the
    * documented raw-estimator bias when `n < 2.5m` (reads high); the
    * q_hll artifact carries the exact count next to the estimate so
    * the bias is measured, not hidden.
    *
    * Determinism: bucket = the hash's low p bits; rank rho = 1 +
    * trailing zeros of the remaining bits (same Geometric(1/2)
    * statistic as the paper's leading-zero rank, chosen because the
    * bit tests replay in SQL as integer div/mod on the unsigned
    * HUGEINT — no unsigned-shift gymnastics); registers are per-bucket
    * MAX (order-free); the harmonic sum folds `2^-rho` — each an EXACT
    * power-of-two double from a shared literal table — over present
    * buckets in ascending-bucket order (0.0-seeded), then adds the
    * empty-bucket mass `(m - hit) * 1.0` and closes with one stamped
    * division ([[hllAlphaM2]]).
    *
    * Scale: one (group, bucket) max aggregate with map-side partials —
    * state is <= m rows per group regardless of corpus size; the
    * per-group fold runs over <= m collected elements (bounded, the
    * dsir array contract). */
  def hllDistinct(df: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String], hashCol: String, p: Int = 8)
      : org.apache.spark.sql.DataFrame = {
    require(p >= 4 && p <= 14, s"hllDistinct: p must be in [4, 14], got $p")
    require(groupCols.nonEmpty, "hllDistinct: need at least one group col")
    hllEstimate(hllRegisters(df, groupCols, hashCol, p), groupCols, p)
  }

  /** The `(group..., b, rho)` register table of [[hllDistinct]] — the
    * STORED mergeable sketch artifact, and the one definition of the
    * bucket/rank arithmetic (shared with [[hllSetOps]]). This is the
    * table a 100 TB incremental workflow persists per corpus snapshot
    * (<= 2^p slim rows per group, written like any parquet table):
    * tonight's registers [[hllMergeRegisters]]-fold into yesterday's
    * WITHOUT rescanning yesterday's corpus, and
    * merge(registers(A), registers(B)) == registers(A ∪ B)
    * BIT-FOR-BIT (per-bucket max is associative/commutative/
    * idempotent — q_hll_incremental proves it register by register).
    * Estimate any stored/merged table with [[hllEstimate]]. All three
    * functions must share one `p`. */
  def hllRegisters(df: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String], hashCol: String, p: Int)
      : org.apache.spark.sql.DataFrame = {
    val m = 1 << p
    val maxRho = 64 - p + 1
    val h = col(hashCol).cast(LongType)
    val v = shiftrightunsigned(h, p)
    val rho = (1 until maxRho).foldLeft(when(lit(false), lit(0))) {
      case (acc, i) =>
        acc.when(shiftrightunsigned(v, i - 1)
          .bitwiseAND(lit(1L)) === lit(1L), lit(i))
    }.otherwise(lit(maxRho))
    ArtifactStamp.stamp(
      df.select(groupCols.map(col) :+
          h.bitwiseAND(lit((m - 1).toLong)).cast(IntegerType).as("b") :+
          rho.as("r"): _*)
        .groupBy(groupCols.map(col) :+ col("b"): _*)
        .agg(max(col("r")).as("rho")),
      "rho", "hll", "p" -> p.toLong)
  }

  /** Merge register tables ([[hllRegisters]] output or prior merges)
    * by per-bucket MAX — the lossless HLL state fold: the result is
    * exactly the register table of the concatenated inputs. ONE
    * map-side-partial aggregate over the (small) register rows; the
    * corpora behind the sketches are never touched. */
  def hllMergeRegisters(regs: Seq[org.apache.spark.sql.DataFrame],
      groupCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(regs.nonEmpty, "hllMergeRegisters: need at least one table")
    // plan-time provenance: this signature never carried p, so a
    // cross-p merge used to be caller-contract only — stamps must now
    // be identical across inputs
    val common = ArtifactStamp.requireSameStamp(regs, "rho", "hll",
      "hllMergeRegisters")
    ArtifactStamp.restamp(
      regs.map(_.select(groupCols.map(col) :+ col("b") :+ col("rho"): _*))
        .reduce(_ unionAll _)
        .groupBy(groupCols.map(col) :+ col("b"): _*)
        .agg(max(col("rho")).as("rho")),
      "rho", common)
  }

  /** The raw HLL estimate over a STORED register table (built with the
    * same `p`): `(group..., n_buckets_hit, hll_est)` — the closing
    * stage of [[hllDistinct]], callable on merged/persisted state.
    * Registers outside `p`'s domain (a wrong-`p` table) RAISE rather
    * than skew the (m − hit) term silently. */
  def hllEstimate(regs: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String], p: Int): org.apache.spark.sql.DataFrame = {
    require(p >= 4 && p <= 14, s"hllEstimate: p must be in [4, 14], got $p")
    ArtifactStamp.check(regs, "rho", "hll", "hllEstimate", "p" -> p.toLong)
    val m = 1 << p
    val maxRho = 64 - p + 1
    val guarded = regs.where(assert_true(
      col("b") >= 0 && col("b") < m &&
        col("rho") >= 1 && col("rho") <= maxRho,
      concat(lit(s"hllEstimate: register outside p=$p domain (b="),
        col("b"), lit(", rho="), col("rho"),
        lit(") — table built with a different p?"))).isNull)
    guarded
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_buckets_hit"),
        hllPresentSum(p).as("s_present"))
      .select(groupCols.map(col) :+ col("n_buckets_hit") :+
        hllEst(p, col("s_present"), col("n_buckets_hit")).as("hll_est"): _*)
  }

  /** Pinned-order harmonic mass of the PRESENT registers: fold
    * `2^-rho` (exact power-of-two doubles) over ascending buckets,
    * 0.0-seeded — used inside an `.agg(...)` over a register frame. */
  private def hllPresentSum(p: Int): Column = {
    val maxRho = 64 - p + 1
    val powArr = array((1 to maxRho).map(i => lit(1.0 / (1L << i))): _*)
    aggregate(array_sort(collect_list(struct(col("b"), col("rho")))),
      lit(0.0), (acc, x) => acc + element_at(powArr, x.getField("rho")))
  }

  /** The stamped raw estimator closing division. */
  private def hllEst(p: Int, sPresent: Column, nHit: Column): Column =
    lit(hllAlphaM2(p)) / (sPresent +
      (lit((1L << p)) - nHit).cast(DoubleType))

  /** HLL SET ALGEBRA over the groups of one sketch build — the sketch
    * a 100 TB source-overlap matrix actually ships: HLL registers
    * merge by elementwise MAX, so the UNION estimate of two groups is
    * the raw estimator over their max-merged registers (exactly the
    * estimate HLL would give the concatenated input — merge is
    * lossless), and the INTERSECTION estimate is inclusion-exclusion
    * `est_a + est_b − est_union` (the standard HLL recipe; no sketch
    * supports direct intersection, and the estimate can go <= 0 for
    * tiny overlaps — published as-is, the q_kmv_setops honesty
    * precedent, with `jaccard_est = est_inter / est_union` alongside).
    * All at 1-byte-per-register cost vs KMV's k 8-byte hashes
    * ([[kmvDistinct]] keeps exact resemblance; HLL wins on state).
    *
    * Determinism: register build and folds are [[hllDistinct]]'s
    * (order-free max/count, pinned ascending-bucket fold); the
    * union merge is a per-bucket MAX over the pair's registers;
    * inclusion-exclusion is the fixed operand order
    * `(est_a + est_b) − est_union`.
    *
    * Scale shape: registers are <= m rows per group; the pair frame
    * is |groups|² rows and the union merge touches <= 2m register
    * rows per pair — nothing corpus-sized after the one register
    * aggregate. Returns one row per unordered group pair (a < b):
    * `(group_a, group_b, est_a, est_b, est_union, est_inter,
    * jaccard_est)`. */
  def hllSetOps(df: org.apache.spark.sql.DataFrame,
      groupCol: String, hashCol: String, p: Int = 8)
      : org.apache.spark.sql.DataFrame = {
    require(p >= 4 && p <= 14, s"hllSetOps: p must be in [4, 14], got $p")
    val regs = hllRegisters(df, Seq(groupCol), hashCol, p)
    val ests = regs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("nh"), hllPresentSum(p).as("sp"))
      .select(col(groupCol), hllEst(p, col("sp"), col("nh")).as("est"))
    val groups = regs.select(col(groupCol)).distinct()
    val pairs = groups.select(col(groupCol).as("group_a"))
      .join(groups.select(col(groupCol).as("group_b")),
        col("group_a") < col("group_b"))
    // union registers: per-bucket max over the pair's two register
    // sets. Two equi-joins unioned, NOT one OR-predicate join — the OR
    // form only executes as a broadcast nested-loop scanning every
    // group's registers per pair, which breaks the '<= 2m register
    // rows per pair' claim as the group count grows; the equi-joins
    // stay hash joins at any |groups|
    val pairRegs = Seq("group_a", "group_b").map { side =>
      pairs.join(regs, col(groupCol) === col(side))
        .select(col("group_a"), col("group_b"), col("b"), col("rho"))
    }.reduce(_ unionAll _)
    val uni = pairRegs
      .groupBy(col("group_a"), col("group_b"), col("b"))
      .agg(max(col("rho")).as("rho"))
      .groupBy(col("group_a"), col("group_b"))
      .agg(count(lit(1)).as("nh"), hllPresentSum(p).as("sp"))
      .select(col("group_a"), col("group_b"),
        hllEst(p, col("sp"), col("nh")).as("est_union"))
    uni
      .join(ests.select(col(groupCol).as("group_a"), col("est").as("est_a")),
        Seq("group_a"))
      .join(ests.select(col(groupCol).as("group_b"), col("est").as("est_b")),
        Seq("group_b"))
      .select(col("group_a"), col("group_b"), col("est_a"), col("est_b"),
        col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("est_inter"),
        ((col("est_a") + col("est_b") - col("est_union")) /
          col("est_union")).as("jaccard_est"))
  }

  /** Count-Min frequency sketch (Cormode/Muthukrishnan 2005) over a
    * long key column: a `depth x width` grid of counters where row `i`
    * increments cell `splitmix64(key XOR i) & (width-1)`. Counters are
    * PURE SUMS — merge is elementwise addition, so the grid is
    * insertion-order- and partition-independent (unlike Misra-Gries
    * class sketches, whose evictions are order-sensitive and would not
    * oracle-replay). Returns the grid as `array<long>` of length
    * `depth * width`, row-major. `width` must be a power of two (the
    * bucket is a mask, not a modulo). Point estimates via
    * [[cmsEstimate]]: min over rows of the key's cell — an upper bound
    * on the true count that overcounts only on bucket collisions.
    * Memory/shuffle is the constant `8 * depth * width` bytes per
    * partition at any input cardinality. */
  def countMin(key: Column, depth: Int, width: Int): Column =
    GraftColumnBridge.column(
      CountMinSketch(GraftColumnBridge.expression(key), depth, width)
        .toAggregateExpression())

  /** Bloom filter over a long key column as an `array<long>` of
    * `bits / 64` words (`bits` a power of two); `numHashes` bit
    * positions per key via the same SplitMix64-with-row-seed scheme as
    * [[countMin]]. Merge is bitwise OR — order- and partition-
    * independent. Use with [[bloomMightContain]] as a SEMI-JOIN
    * REDUCTION: broadcast the filter of the selective side's keys and
    * prune the big side BEFORE its join shuffle. No false negatives
    * (every inserted key passes), so prefilter + exact join ==
    * plain join; false positives only cost shuffle bytes. The win at
    * 100 TB: a bloom of n keys is ~10 bits/key where a broadcast hash
    * relation is >100 bytes/key — sides far too big to broadcast-join
    * still fit a broadcast bloom. */
  def bloomFilter(key: Column, bits: Int, numHashes: Int): Column =
    GraftColumnBridge.column(
      BloomSketch(GraftColumnBridge.expression(key), bits, numHashes)
        .toAggregateExpression())

  /** Membership probe against a [[bloomFilter]] words array: true iff
    * all `numHashes` bit positions for `key` are set. Pure codegen'd
    * Column arithmetic (splitmix64 kernel + shifts/masks). */
  def bloomMightContain(words: Column, key: Column, bits: Int,
      numHashes: Int): Column = {
    (0 until numHashes).map { i =>
      val bit = graft.functions.LongHashes
        .splitmix64(key.cast(LongType).bitwiseXOR(lit(i.toLong)))
        .bitwiseAND(lit((bits - 1).toLong))
      val word = element_at(words,
        (call_function("shiftright", bit, lit(6)) + lit(1L)).cast(IntegerType))
      word.bitwiseAND(call_function("shiftleft", lit(1L),
        bit.bitwiseAND(lit(63L)).cast(IntegerType))) =!= 0L
    }.reduce(_ && _)
  }

  /** Per-group [[countMin]] grids as a STORED artifact — the CMS
    * member of the mergeable-sketch persistence family
    * ([[hllRegisters]] precedent): `(group..., cms_grid)` with one
    * `depth * width` long array per group, written like any parquet
    * table. Tonight's grids [[cmsMergeGrids]]-fold into yesterday's
    * WITHOUT rescanning yesterday's corpus, and because counters are
    * pure sums, merge(grid(A), grid(B)) == grid(A ∪ B) CELL FOR CELL
    * (q_cms_incr proves it). Point-estimate any stored/merged grid
    * with [[cmsEstimate]]. All callers must share one
    * `(depth, width)`. */
  def cmsGrids(df: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
      keyCol: String, depth: Int, width: Int)
      : org.apache.spark.sql.DataFrame = {
    require(groupCols.nonEmpty, "cmsGrids: need at least one group col")
    ArtifactStamp.stamp(
      df.groupBy(groupCols.map(col): _*)
        .agg(countMin(col(keyCol), depth, width).as("cms_grid")),
      "cms_grid", "cms", "depth" -> depth.toLong, "width" -> width.toLong)
  }

  /** Driver-side schema validation of a stored sketch-state table: the
    * state column must exist and be `array<long>` BEFORE any union —
    * catches type drift (e.g. an `array<int>` table from a foreign
    * writer) at plan time even for tables with zero surviving rows,
    * which the row-level length guards below cannot see. Lengths stay
    * row-guarded: array length is data, not schema, so an EMPTY table
    * built with the wrong shape merges as a (harmless) no-op — the
    * docstrings state that limit explicitly. */
  private def requireLongArrayCol(df: org.apache.spark.sql.DataFrame,
      colName: String, op: String): Unit = {
    val f = df.schema.fields.find(_.name == colName).getOrElse(
      throw new IllegalArgumentException(
        s"$op: table has no '$colName' column (columns: " +
          s"${df.columns.mkString(", ")}) — not a stored sketch-state " +
          "table"))
    f.dataType match {
      case ArrayType(LongType, _) => ()
      case other => throw new IllegalArgumentException(
        s"$op: '$colName' must be array<bigint>, got ${other.sql} — " +
          "table written by an incompatible builder")
    }
  }

  /** Merge stored [[cmsGrids]] tables by CELL-WISE SUM — the lossless
    * CMS state fold (counters are pure sums, order-free). The corpora
    * behind the grids are never touched; work is |groups| × cells slim
    * rows. Grids of the wrong length (a table built with a different
    * `(depth, width)`) RAISE rather than fold garbage — same-product
    * shapes (4×1024 vs 8×512) are indistinguishable from data, so the
    * shared-shape contract still rests on the caller. The column TYPE
    * is validated at plan time (driver-side schema check); the length
    * guard is per-row, so a wrong-shape table with zero surviving rows
    * merges as a no-op rather than raising — shapes are data, not
    * schema. */
  def cmsMergeGrids(grids: Seq[org.apache.spark.sql.DataFrame],
      groupCols: Seq[String], depth: Int, width: Int)
      : org.apache.spark.sql.DataFrame = {
    require(grids.nonEmpty, "cmsMergeGrids: need at least one table")
    grids.foreach(requireLongArrayCol(_, "cms_grid", "cmsMergeGrids"))
    // plan-time provenance: the same-(depth, width) contract no longer
    // rests on the caller — a 4x1024 table folded into an 8x512 call
    // raises HERE, before any job runs (the row-level size guard below
    // stays as defense for total-cell-count drift)
    grids.foreach(ArtifactStamp.check(_, "cms_grid", "cms",
      "cmsMergeGrids", "depth" -> depth.toLong, "width" -> width.toLong))
    val cells = depth * width
    val merged = grids.map(_.select(groupCols.map(col) :+ col("cms_grid"): _*))
      .reduce(_ unionAll _)
      .where(assert_true(size(col("cms_grid")) === cells,
        concat(lit(s"cmsMergeGrids: grid has "), size(col("cms_grid")),
          lit(s" cells, expected depth*width=$cells — table built with" +
            " a different (depth, width)?"))).isNull)
      .select(groupCols.map(col) :+
        posexplode(col("cms_grid")).as(Seq("pos", "c")): _*)
      .groupBy(groupCols.map(col) :+ col("pos"): _*)
      .agg(sum(col("c")).as("c"))
      .groupBy(groupCols.map(col): _*)
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        e => e.getField("c")).as("cms_grid"))
    ArtifactStamp.stamp(merged, "cms_grid", "cms",
      "depth" -> depth.toLong, "width" -> width.toLong)
  }

  /** Per-group [[bloomFilter]] word arrays as a STORED artifact —
    * `(group..., bloom_words)`, `bits / 64` longs per group. Fold
    * snapshots with [[bloomMergeWords]] (bitwise OR is the lossless
    * Bloom state merge: merge(words(A), words(B)) == words(A ∪ B) bit
    * for bit — q_bloom_incr proves it), probe with
    * [[bloomMightContain]]. All callers must share `(bits,
    * numHashes)`. */
  def bloomWords(df: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String], keyCol: String, bits: Int, numHashes: Int)
      : org.apache.spark.sql.DataFrame = {
    require(groupCols.nonEmpty, "bloomWords: need at least one group col")
    ArtifactStamp.stamp(
      df.groupBy(groupCols.map(col): _*)
        .agg(bloomFilter(col(keyCol), bits, numHashes).as("bloom_words")),
      "bloom_words", "bloom",
      "bits" -> bits.toLong, "num_hashes" -> numHashes.toLong)
  }

  /** Merge stored [[bloomWords]] tables by WORD-WISE OR. Wrong-length
    * word arrays (a different `bits`) RAISE; a same-`bits`
    * different-`numHashes` table is indistinguishable from data — the
    * shared-parameter contract rests on the caller. Column type is
    * validated driver-side at plan time; the length guard is per-row
    * ([[cmsMergeGrids]]'s documented empty-table limit). */
  def bloomMergeWords(words: Seq[org.apache.spark.sql.DataFrame],
      groupCols: Seq[String], bits: Int)
      : org.apache.spark.sql.DataFrame = {
    require(words.nonEmpty, "bloomMergeWords: need at least one table")
    words.foreach(requireLongArrayCol(_, "bloom_words", "bloomMergeWords"))
    // plan-time provenance CLOSES the docstring's admitted gap: a
    // same-bits different-numHashes table was indistinguishable from
    // data — the stamps must now be IDENTICAL across inputs (numHashes
    // included, though this signature never carried it) and match bits
    val common = ArtifactStamp.requireSameStamp(words, "bloom_words",
      "bloom", "bloomMergeWords")
    ArtifactStamp.check(words.head, "bloom_words", "bloom",
      "bloomMergeWords", "bits" -> bits.toLong)
    val n = bits / 64
    val merged = words.map(_.select(groupCols.map(col) :+ col("bloom_words"): _*))
      .reduce(_ unionAll _)
      .where(assert_true(size(col("bloom_words")) === n,
        concat(lit(s"bloomMergeWords: "), size(col("bloom_words")),
          lit(s" words, expected bits/64=$n — table built with a" +
            " different bits?"))).isNull)
      .select(groupCols.map(col) :+
        posexplode(col("bloom_words")).as(Seq("pos", "w")): _*)
      .groupBy(groupCols.map(col) :+ col("pos"): _*)
      .agg(bit_or(col("w")).as("w"))
      .groupBy(groupCols.map(col): _*)
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("w")))),
        e => e.getField("w")).as("bloom_words"))
    ArtifactStamp.restamp(merged, "bloom_words", common)
  }

  // --------------------------------------- retraction (deletion folds)
  //
  // The nightly-fold family above is append-only; real pipelines also
  // RETRACT (takedowns, opt-outs, license changes). The math splits the
  // family in two: CMS counters are pure sums, so they subtract exactly
  // (grid(A) − grid(B) == grid(A \ B) cell for cell whenever B's rows
  // are a sub-multiset of A's); Bloom's OR and HLL's max are IDEMPOTENT
  // folds that destroy multiplicity, so no per-key subtraction exists —
  // those retractions are loud raises pointing at the rebuild-window
  // policy, never silent no-ops.

  /** Subtract a [[cmsGrids]] delta from a stored base CELL-WISE — the
    * CMS retraction fold: `base − delta == cmsGrids(surviving rows)`
    * cell for cell, because counters are pure sums (q_cms_retract
    * proves it against an independent single-pass build on the
    * survivors). The corpora are never rescanned; nightly retraction
    * cost is |groups| × cells slim rows, the [[cmsMergeGrids]] shape.
    *
    * CONTRACT: `delta` must be the grid of a sub-multiset of the rows
    * behind `base` (same `(depth, width)`, same group keys). A
    * violation is detected, not absorbed: any resulting NEGATIVE cell
    * raises with the offending group's position (rows were retracted
    * that were never inserted — including a delta group the base never
    * saw, whose cells all go negative). Base groups the delta doesn't
    * touch pass through unchanged. */
  def cmsSubtractGrids(base: org.apache.spark.sql.DataFrame,
      delta: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
      depth: Int, width: Int): org.apache.spark.sql.DataFrame = {
    Seq(base, delta).foreach(
      requireLongArrayCol(_, "cms_grid", "cmsSubtractGrids"))
    Seq(base, delta).foreach(ArtifactStamp.check(_, "cms_grid", "cms",
      "cmsSubtractGrids", "depth" -> depth.toLong,
      "width" -> width.toLong))
    val cells = depth * width
    val signed = Seq(base -> 1L, delta -> -1L).map { case (df, sgn) =>
      df.select(groupCols.map(col) :+ col("cms_grid") :+
        lit(sgn).as("__sgn"): _*)
    }.reduce(_ unionAll _)
    val subtracted = signed
      .where(assert_true(size(col("cms_grid")) === cells,
        concat(lit(s"cmsSubtractGrids: grid has "), size(col("cms_grid")),
          lit(s" cells, expected depth*width=$cells — table built with" +
            " a different (depth, width)?"))).isNull)
      .select(groupCols.map(col) :+
        posexplode(col("cms_grid")).as(Seq("pos", "c")) :+
        col("__sgn"): _*)
      .groupBy(groupCols.map(col) :+ col("pos"): _*)
      .agg(sum(col("c") * col("__sgn")).as("c"))
      .where(assert_true(col("c") >= 0L,
        concat(lit("cmsSubtractGrids: cell "), col("pos"),
          lit(" went negative ("), col("c"),
          lit(") — the delta is not a sub-multiset of the base " +
            "(rows retracted that were never inserted, or a delta " +
            "group the base never saw)"))).isNull)
      .groupBy(groupCols.map(col): _*)
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        e => e.getField("c")).as("cms_grid"))
    ArtifactStamp.stamp(subtracted, "cms_grid", "cms",
      "depth" -> depth.toLong, "width" -> width.toLong)
  }

  /** Bloom filters CANNOT retract — this raises, loudly and always.
    * A set bit may be owed to any number of keys (OR is idempotent:
    * the filter holds membership, not multiplicity), so clearing a
    * retracted key's bits would also evict every surviving key that
    * shares them, and counting variants trade 8–16× the memory for
    * the same wrong answer under duplicate inserts. POLICY: partition
    * the stored [[bloomWords]] artifact by ingest window (the
    * per-snapshot rows this family already prescribes), DROP the
    * windows containing retracted keys, and [[bloomMergeWords]] the
    * surviving windows — cost proportional to the dropped windows'
    * corpora, never the history. This method exists so the natural
    * call site fails with that remedy instead of silently no-op'ing
    * or silently corrupting (SketchesSpec pins the raise). */
  def bloomRetractWords(base: org.apache.spark.sql.DataFrame,
      delta: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
      bits: Int): Nothing =
    throw new UnsupportedOperationException(
      "bloomRetractWords: a Bloom filter cannot delete — OR'd bits are " +
        "shared by every key that maps to them, so subtraction would " +
        "evict surviving keys. Rebuild-window policy: store bloomWords " +
        "per ingest window, drop the windows holding retracted keys, " +
        "bloomMergeWords the survivors (cost = the dropped windows' " +
        "corpora, not history).")

  /** HLL register tables CANNOT retract — this raises, loudly and
    * always. A register holds the MAX rank ever seen in its bucket
    * (idempotent like Bloom's OR): the retracted key may or may not
    * own that max, and the runner-up rank was never stored. POLICY:
    * the [[bloomRetractWords]] rebuild window — per-window
    * [[hllRegisters]] snapshots, drop the offending windows,
    * [[hllMergeRegisters]] the survivors. (SketchesSpec pins the
    * raise.) */
  def hllRetractRegisters(base: org.apache.spark.sql.DataFrame,
      delta: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
      p: Int): Nothing =
    throw new UnsupportedOperationException(
      "hllRetractRegisters: HLL cannot delete — a register is the max " +
        "rank ever observed in its bucket and the runner-up was never " +
        "stored. Rebuild-window policy: store hllRegisters per ingest " +
        "window, drop the windows holding retracted keys, " +
        "hllMergeRegisters the survivors (cost = the dropped windows' " +
        "corpora, not history).")

  /** EXACT heavy hitters (keys with count >= `threshold`) WITHOUT a
    * full-cardinality shuffle — the 100 TB answer to "which keys occur
    * at least N times" when the key space is huge and the hitters are
    * few.
    *
    * Two passes over the input, zero large shuffles:
    *  1. build a [[countMin]] grid (constant `8*depth*width` bytes per
    *     partition, map-side merged);
    *  2. re-scan with the broadcast grid as a MAP-SIDE prefilter —
    *     only rows whose [[cmsEstimate]] reaches the threshold enter
    *     the exact groupBy — then confirm with an exact count.
    *
    * The result is EXACT, not approximate: CMS overcounts only (est >=
    * true always), so the prefilter has no false negatives, and the
    * exact confirm discards the collision-induced false positives.
    * Collisions only cost shuffle bytes; size `width` so that
    * `n_rows / width << threshold` keeps them rare. Contrast with the
    * naive `groupBy.having`: that shuffles EVERY distinct key;
    * this shuffles only rows of candidate keys. Misra-Gries-style
    * one-pass summaries were rejected for the same reason they don't
    * oracle-replay: eviction order makes the summary partition-order-
    * sensitive; CMS is pure sums.
    *
    * Returns (keyCol, n) for keys with exact count >= threshold. */
  def heavyHitters(df: org.apache.spark.sql.DataFrame, keyCol: String,
      threshold: Long, depth: Int = 4, width: Int = 1024)
      : org.apache.spark.sql.DataFrame = {
    require(threshold >= 1, "threshold must be >= 1")
    val keys = df.select(col(keyCol))
    val grid = keys.agg(countMin(col(keyCol), depth, width).as("grid"))
    keys.crossJoin(broadcast(grid))
      .where(cmsEstimate(col("grid"), col(keyCol), depth, width)
        >= lit(threshold))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= threshold)
  }

  /** JOIN-SIZE estimate from two [[countMin]] grids (AMS/CMS inner
    * product, Cormode/Muthukrishnan 2005 §4.2): `|A ⋈ B|` on the
    * sketched key — ordered pairs, so a self-join estimate counts n²
    * per key — as `min over rows d of Σ_j gridA[d][j] * gridB[d][j]`.
    * The pre-flight every pair-generating stage wants: estimate the
    * candidate-pair blowup of a blocking/join key from two
    * constant-size sketches BEFORE paying the shuffle, and re-key or
    * salt if the number comes back hot. Like the point estimate it
    * can only OVERcount (collision terms are non-negative), expected
    * additive bias `|A|·|B| / width` — size `width` so that is small
    * against the true join size. Pure sums of exact longs: both the
    * grids and this fold are order/partition-independent and the
    * oracle replays them exactly. */
  def cmsInnerProduct(gridA: Column, gridB: Column, depth: Int,
      width: Int): Column = {
    val rows = (0 until depth).map { d =>
      aggregate(
        zip_with(slice(gridA, d * width + 1, width),
          slice(gridB, d * width + 1, width), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x)
    }
    least(rows: _*)
  }

  /** Point-frequency estimate from a [[countMin]] grid: min over rows
    * of `grid[i * width + bucket_i(key)]`, with `bucket_i` the same
    * codegen'd SplitMix64 path the aggregate used. */
  def cmsEstimate(grid: Column, key: Column, depth: Int, width: Int): Column = {
    val cells = (0 until depth).map { i =>
      val bucket = graft.functions.LongHashes
        .splitmix64(key.cast(LongType).bitwiseXOR(lit(i.toLong)))
        .bitwiseAND(lit((width - 1).toLong))
      element_at(grid, (lit(i.toLong * width + 1L) + bucket).cast(IntegerType))
    }
    least(cells: _*)
  }

  /** KMV KEEP SET: the k smallest distinct hashes per group, as a
    * sorted `array<long>` — [[kmvDistinct]]'s buffer surfaced for set
    * operations. Values are the raw hashes with the sign bit flipped
    * (`XOR Long.MinValue`, an order-preserving bijection from unsigned
    * to signed order), so plain `array_sort`/`array_union` arithmetic
    * downstream runs in the correct unsigned order with built-in
    * signed comparisons. Rides [[graft.ops.Sampling.BottomKByHash]]
    * with the hash as its own id — the duplicate-hash collapse gives
    * distinctness for free. Map-side partials, `8k` bytes per (group,
    * partition), order/partition independent. */
  def kmvKeepSet(hash: Column, k: Int): Column =
    transform(
      graft.ops.Sampling.bottomKByHash(hash, hash, k),
      s => s.getField("skey").bitwiseXOR(lit(Long.MinValue)))

  /** Mergeable QUANTILE sketch: the values of the k rows whose
    * `hash` is smallest in unsigned order, surfaced as a VALUE-sorted
    * `array<long>` — a bounded uniform row sample whose every
    * retention decision is hash-derived, so unlike KLL/GK/t-digest
    * (order-sensitive compactions) the kept set is a pure function of
    * the input row set: partition-, retry-, and engine-independent,
    * and the DuckDB oracle replays it verbatim (rank the rows by the
    * HUGEINT hash chain, keep rn <= k). Read quantiles off it with
    * [[sketchQuantile]]; the estimate's rank error is the uniform-
    * sample bound ~1.25/sqrt(k) at the median (k=1024 ≈ 4% rank
    * error) — measured est-vs-exact in the q_quantile_sketch artifact.
    *
    * `hash` must be a bijective hash of a UNIQUE row id (e.g.
    * [[graft.functions.LongHashes.splitmix64]] of the key column), NOT
    * of the value: duplicate hashes collapse to one buffer slot, which
    * would silently under-weight repeated values. NULL values don't
    * consume a slot. Values ride as longs — quantize doubles to fixed
    * point first (the [[Similarity.trainCentroids]] house pattern).
    *
    * Scale shape: rides [[graft.ops.Sampling.BottomKByHash]] (ONE
    * offer/evict/serde implementation across the family) — map-side
    * partial bottom-k, `16k` bytes per (group, partition) on the one
    * aggregate exchange, no sort, no Expand. At 100 TB this replaces
    * the exact-percentile full sorted pass (q_len_stats) with a
    * constant-size summary per group. */
  def quantileSketch(hash: Column, value: Column, k: Int): Column =
    array_sort(transform(
      graft.ops.Sampling.bottomKByHash(hash, value, k),
      s => s.getField("id")))

  /** Linear-interpolation quantile over a [[quantileSketch]] array
    * (the `percentile`/`quantile_cont` convention, but written as ONE
    * explicit fixed-order IEEE formula so any engine replays it
    * bit-for-bit instead of trusting two implementations to agree):
    * `r = q*(n-1); lo = floor(r); v[lo] + (v[lo+1] - v[lo])*(r - lo)`
    * over the sorted 1-based array, upper index clamped to n. NULL on
    * an empty sketch. */
  def sketchQuantile(sketch: Column, q: Double): Column = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0, 1], got $q")
    val n = size(sketch)
    val r = lit(q) * (n - 1).cast(DoubleType)
    val lo = floor(r).cast(IntegerType)
    val frac = r - lo.cast(DoubleType)
    val vlo = element_at(sketch, lo + 1).cast(DoubleType)
    val vhi = element_at(sketch, least(lo + lit(2), n)).cast(DoubleType)
    when(n === 0, lit(null).cast(DoubleType))
      .otherwise(vlo + (vhi - vlo) * frac)
  }

  /** DISTINCT COUNT OF A UNION from two [[kmvKeepSet]] sketches alone
    * — the set-algebra rollup at 100 TB: per-group (or per-day /
    * per-partition) sketches answer "how many distinct keys across
    * these groups" from `8k` bytes per side, no re-scan, no
    * co-located exact union. The merged keep set (bottom-k of the
    * sketch union) IS the union's KMV sketch — that closure under
    * merge is the KMV property — so the estimate is [[kmvDistinct]]'s
    * estimator on its k-th minimum: exact (`|merged|`) while the
    * union fits under k, `floor((k-1)*2^64 / kth)` beyond. Same
    * SAME-K CONTRACT and loud oversized-sketch guard as
    * [[kmvResemblance]]; pair with it for intersection cardinality
    * (`|A∩B| ~= J_est * U_est`, inclusion-exclusion on estimates —
    * q_kmv_setops measures both errors). Deterministic given the
    * hash, so an external engine replays it exactly. */
  def kmvUnionDistinct(sketchA: Column, sketchB: Column, k: Int): Column = {
    val merged = slice(array_sort(array_union(sketchA, sketchB)), 1, k)
    // keep-set values are sign-flipped (unsigned order as signed
    // longs); flip back to raw hash bits for the estimator
    val kthBits = element_at(merged, size(merged))
      .bitwiseXOR(lit(Long.MinValue))
    val est = GraftColumnBridge.column(
      KmvEstimateFromKth(GraftColumnBridge.expression(kthBits), k))
    when(size(sketchA) > k || size(sketchB) > k,
      raise_error(lit(s"kmvUnionDistinct: sketch holds more than k=$k " +
        "entries — it was built with a larger k (same-k contract)")))
      .otherwise(when(size(merged) < k, size(merged).cast(LongType))
        .otherwise(est))
  }

  /** [[kmvUnionDistinct]] generalized to an ARRAY of keep sets — the
    * sketch ROLLUP-TABLE read path: per-partition/per-day sketches
    * stored as rows fold into any window/group union's distinct count
    * without touching raw data (bottom-k of a union of keep sets IS
    * the union's keep set, so folding `array_union` then re-slicing k
    * is exact sketch algebra; the fold's intermediate order is
    * irrelevant — sets union commutatively and the final sort
    * canonicalizes). Same SAME-K CONTRACT, same loud oversized-sketch
    * guard; exact (`|merged|`) while the union fits under k. */
  def kmvUnionDistinctAll(sketches: Column, k: Int): Column = {
    val merged = slice(array_sort(aggregate(sketches,
      array().cast(ArrayType(LongType, containsNull = false)),
      (acc, x) => array_union(acc, x))), 1, k)
    val kthBits = element_at(merged, size(merged))
      .bitwiseXOR(lit(Long.MinValue))
    val est = GraftColumnBridge.column(
      KmvEstimateFromKth(GraftColumnBridge.expression(kthBits), k))
    when(exists(sketches, s => size(s) > k),
      raise_error(lit(s"kmvUnionDistinctAll: a sketch holds more than " +
        s"k=$k entries — it was built with a larger k (same-k contract)")))
      .otherwise(when(size(merged) < k, size(merged).cast(LongType))
        .otherwise(est))
  }

  /** MERGEABLE form of [[quantileSketch]]: the bottom-k rows by
    * unsigned `hash`, kept as `(fkey, v)` structs with the hash
    * SIGN-FLIPPED (the [[kmvKeepSet]] trick — signed struct sorts then
    * reproduce unsigned hash order) and the value payload riding
    * along. [[quantileSketch]] drops the hashes, which reads fine but
    * cannot merge; THIS form is what a rollup table stores — per-day /
    * per-partition rows that any window or group union folds without
    * re-touching raw data ([[quantilePairsUnionAll]]). Same hash
    * contract as quantileSketch (bijective hash of a UNIQUE row id,
    * never of the value). */
  def quantilePairs(hash: Column, value: Column, k: Int): Column =
    transform(graft.ops.Sampling.bottomKByHash(hash, value, k),
      s => struct(
        s.getField("skey").bitwiseXOR(lit(Long.MinValue)).as("fkey"),
        s.getField("id").as("v")))

  /** Union of [[quantilePairs]] sketches -> the union's VALUE-sorted
    * quantile sketch, ready for [[sketchQuantile]]: bottom-k of a
    * union of bottom-k keep sets IS the union's bottom-k (the KMV
    * closure argument, with values riding the keys), so a trailing
    * window's quantiles read off `w` sketch ROWS — at 100 TB the
    * rolling-percentile alternative re-sorts raw history per window.
    * Exact sketch algebra, deterministic given the hash: fold order
    * is irrelevant (flatten + one canonical sort). Same SAME-K
    * CONTRACT and loud oversized-sketch guard as
    * [[kmvUnionDistinctAll]]. */
  def quantilePairsUnionAll(sketches: Column, k: Int): Column = {
    val merged = slice(array_sort(flatten(sketches)), 1, k)
    when(exists(sketches, s => size(s) > k),
      raise_error(lit(s"quantilePairsUnionAll: a sketch holds more " +
        s"than k=$k entries — it was built with a larger k (same-k " +
        "contract)")))
      .otherwise(array_sort(transform(merged, s => s.getField("v"))))
  }

  /** [[quantilePairsUnionAll]] keeping the PAIRS — bottom-k of the
    * union of keep sets, still in the stored `(fkey, v)` form, so the
    * result is itself a mergeable sketch (the union's quantilePairs
    * exactly, by the KMV closure argument) and can fold into FURTHER
    * snapshots — what [[quantileMergeSummaries]] writes back. Hashes
    * are bijective over unique row ids (the quantilePairs contract),
    * so struct order has no ties and the merged set is a pure function
    * of the input row set: deterministic, engine-replayable. Same
    * SAME-K CONTRACT and loud oversized-sketch guard. */
  def quantilePairsMergeAll(sketches: Column, k: Int): Column = {
    val merged = slice(array_sort(flatten(sketches)), 1, k)
    when(exists(sketches, s => size(s) > k),
      raise_error(lit(s"quantilePairsMergeAll: a sketch holds more " +
        s"than k=$k entries — it was built with a larger k (same-k " +
        "contract)")))
      .otherwise(merged)
  }

  /** Per-group [[quantilePairs]] sketches as a STORED artifact — the
    * QUANTILE member of the mergeable-sketch persistence family
    * ([[hllRegisters]] / [[cmsGrids]] / [[bloomWords]] precedent):
    * `(group..., qsketch)` with one bounded `(fkey, v)` pair array per
    * group, written like any parquet table. Tonight's summaries
    * [[quantileMergeSummaries]]-fold into yesterday's WITHOUT
    * rescanning yesterday's corpus, and because bottom-k-by-hash is
    * closed under union, merge(sketch(A), sketch(B)) == sketch(A ∪ B)
    * PAIR FOR PAIR (q_quantile_incr proves it) — unlike KLL/GK/
    * t-digest, whose order-sensitive compactions make merged and
    * single-pass summaries legitimately differ. Serve quantiles off
    * any stored/merged row with [[summaryQuantile]]; rank error is the
    * uniform-sample bound ~1.25/sqrt(k) at the median. Same hash
    * contract as [[quantileSketch]] (bijective hash of a UNIQUE row
    * id, never of the value); all callers must share one `k`. */
  def quantileSummaries(df: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String], hashCol: String, valueCol: String, k: Int)
      : org.apache.spark.sql.DataFrame = {
    require(groupCols.nonEmpty, "quantileSummaries: need a group col")
    ArtifactStamp.stamp(
      df.groupBy(groupCols.map(col): _*)
        .agg(quantilePairs(col(hashCol), col(valueCol), k).as("qsketch")),
      "qsketch", "quantile", "k" -> k.toLong)
  }

  /** Merge stored [[quantileSummaries]] tables per group — bottom-k of
    * the concatenated keep sets, which IS the from-scratch summary of
    * the concatenated snapshots (exact sketch algebra; fold order is
    * irrelevant — one flatten, one canonical sort). The corpora behind
    * the summaries are never touched; work is |groups| × k slim
    * structs. Output is the same stored form, so merges CHAIN across
    * any number of nights. */
  def quantileMergeSummaries(parts: Seq[org.apache.spark.sql.DataFrame],
      groupCols: Seq[String], k: Int): org.apache.spark.sql.DataFrame = {
    require(parts.nonEmpty, "quantileMergeSummaries: need >= 1 table")
    parts.foreach(ArtifactStamp.check(_, "qsketch", "quantile",
      "quantileMergeSummaries", "k" -> k.toLong))
    ArtifactStamp.stamp(
      parts.map(_.select(groupCols.map(col) :+ col("qsketch"): _*))
        .reduce(_ unionAll _)
        .groupBy(groupCols.map(col): _*)
        .agg(quantilePairsMergeAll(collect_list(col("qsketch")), k)
          .as("qsketch")),
      "qsketch", "quantile", "k" -> k.toLong)
  }

  /** Read a quantile off a stored/merged [[quantileSummaries]] row:
    * [[sketchQuantile]]'s fixed-order interpolation over the pairs'
    * value-sorted payload. */
  def summaryQuantile(qsketch: Column, q: Double): Column =
    sketchQuantile(array_sort(transform(qsketch, s => s.getField("v"))), q)

  /** RETRACT rows from a stored [[quantilePairs]] sketch given the
    * removed rows' raw HASHES (the same splitmix values the sketch was
    * built over) — the bottom-k member of the deletion taxonomy: sums
    * subtract exactly ([[cmsSubtractGrids]]), idempotent folds raise
    * ([[bloomRetractWords]]), and bottom-k DEGRADES GRACEFULLY.
    * Dropping the removed pairs leaves exactly the smallest `m` hashes
    * of the surviving row set (a removal can never promote a survivor
    * past the old k-th minimum), so the result is a VALID bottom-m
    * quantile sketch of the survivors — at reduced resolution
    * `m = k − |removed ∩ kept|`, rank error ~1.25/sqrt(m) (the evicted
    * replacements were never stored; only a rebuild restores full k).
    * Removed rows whose hashes were never retained cost nothing.
    * Serve with [[summaryQuantile]]; the caller reads `size(...)` to
    * decide when m has degraded enough to warrant the rebuild.
    * MUST NOT feed the size-semantics distinct estimators
    * ([[kmvUnionDistinct]] reads size < k as "complete set" — a
    * retracted sketch would lie); quantile reads only. */
  def quantilePairsRetract(sketch: Column,
      removedHashes: Column): Column = {
    // stored fkeys are sign-flipped (unsigned order as signed longs)
    val flipped = transform(removedHashes,
      h => h.bitwiseXOR(lit(Long.MinValue)))
    filter(sketch, p => !array_contains(flipped, p.getField("fkey")))
  }

  /** NEAREST-RANK equi-depth edges off a [[quantileSketch]] array: the
    * `nBins - 1` interior quantile values `sketch[ceil(j*n/nBins)]`
    * (1-based, exact integer rank arithmetic, no interpolation — edges
    * are actual sample values, so downstream comparisons stay
    * long-vs-long). Shared by the equi-depth drift monitor
    * ([[Stats.histogramDriftEqDepth]]) and the range-bucket layout
    * ([[Layout.rangeBucketByQuantiles]]) — one edge definition, not
    * two drifting copies. Empty-sketch input is a caller error (the
    * rank clamps to 1 but element_at(1) on an empty array raises). */
  def sketchEdges(sketch: Column, nBins: Int): Column = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    transform(sequence(lit(1), lit(nBins - 1)), j =>
      element_at(sketch, greatest(
        ((j * size(sketch) + lit(nBins - 1)) / lit(nBins))
          .cast(IntegerType),
        lit(1))))
  }

  /** Bucket index of `value` against a [[sketchEdges]] array:
    * `|{j : value >= edge_j}|` in 0..nBins-1 — values equal to an edge
    * go RIGHT, one fixed replayable convention, monotone in the value
    * by construction. NULL in, NULL out: a null value must not be
    * silently mingled with the smallest values in bucket 0 (the
    * `value >= e` lambda evaluates null-as-false); callers
    * ([[Stats.histogramDriftEqDepth]], [[Layout.rangeBucketByQuantiles]])
    * decide whether to filter nulls upstream or surface a null bucket. */
  def edgeBucket(edges: Column, value: Column): Column =
    when(value.isNotNull, size(filter(edges, e => value >= e)))

  /** Bottom-k resemblance (Broder 1997): estimate the Jaccard
    * similarity of two SETS from their [[kmvKeepSet]] sketches alone —
    * `|X ∩ A ∩ B| / |X|` where X is the k smallest of the sketch
    * union, an unbiased estimate with ~1/sqrt(k) standard error. The
    * corpus-overlap triage tool at 100 TB: the exact pairwise Jaccard
    * of two billion-token sets needs their full sets in one place;
    * this needs `8k` bytes per side and pure array arithmetic —
    * deterministic given the hash, so the oracle replays it exactly
    * (the ESTIMATE is deterministic even though it approximates).
    *
    * SAME-K CONTRACT: `k` must equal the k the sketches were built
    * with ([[kmvKeepSet]]'s argument). The union slice and divisor
    * assume each sketch is either its set's complete hash list
    * (size < k) or its true bottom-k (size == k); a sketch built with
    * a SMALLER k than this argument makes the slice reach beyond the
    * range the sketches cover and silently biases the estimate. The
    * detectable violation — a sketch LARGER than k, i.e. built with a
    * bigger k — raises instead of mis-estimating; the size-ambiguous
    * direction (built-k smaller, sketch full) is indistinguishable
    * from a complete small set by size alone, hence the contract. */
  def kmvResemblance(sketchA: Column, sketchB: Column, k: Int): Column = {
    val x = slice(array_sort(array_union(sketchA, sketchB)), 1, k)
    val est = size(array_intersect(array_intersect(x, sketchA), sketchB))
      .cast(DoubleType) / size(x).cast(DoubleType)
    when(size(sketchA) > k || size(sketchB) > k,
      raise_error(lit(s"kmvResemblance: sketch holds more than k=$k " +
        "entries — it was built with a larger k (same-k contract)")))
      .otherwise(est)
  }
}

/** TypedImperativeAggregate holding a Bloom filter bit array (as long
  * words). Merge is bitwise OR. */
case class BloomSketch(key: Expression, bits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(bits >= 64 && (bits & (bits - 1)) == 0,
    s"bloom bits must be a power of two >= 64, got $bits")
  require(numHashes >= 1, s"bloom needs numHashes >= 1, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long key input, got ${key.dataType.simpleString}")

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](bits / 64)

  override def update(words: Array[Long], input: InternalRow): Array[Long] = {
    val k = key.eval(input)
    if (k != null) {
      val x = k.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val bit = (graft.functions.LongHashes.splitmix64Of(x ^ i) &
          (bits - 1)).toInt
        words(bit >>> 6) |= 1L << (bit & 63)
        i += 1
      }
    }
    words
  }

  override def merge(words: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words.length) { words(i) |= other(i); i += 1 }
    words
  }

  override def eval(words: Array[Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(words)

  override def serialize(words: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(words.length * 8)
    words.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bits / 64)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomSketch =
    copy(key = newChildren(0))
  override def prettyName: String = "graft_bloom"
}

/** TypedImperativeAggregate holding a Count-Min counter grid. */
case class CountMinSketch(key: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(depth >= 1, s"CMS needs depth >= 1, got $depth")
  require(width >= 2 && (width & (width - 1)) == 0,
    s"CMS width must be a power of two >= 2, got $width")

  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long key input, got ${key.dataType.simpleString}")

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(grid: Array[Long], input: InternalRow): Array[Long] = {
    val k = key.eval(input)
    if (k != null) {
      val x = k.asInstanceOf[Long]
      var i = 0
      while (i < depth) {
        val bucket = (graft.functions.LongHashes.splitmix64Of(x ^ i) &
          (width - 1)).toInt
        grid(i * width + bucket) += 1
        i += 1
      }
    }
    grid
  }

  override def merge(grid: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < grid.length) { grid(i) += other(i); i += 1 }
    grid
  }

  override def eval(grid: Array[Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(grid)

  override def serialize(grid: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(grid.length * 8)
    grid.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinSketch =
    copy(key = newChildren(0))
  override def prettyName: String = "graft_count_min"
}

/** TypedImperativeAggregate holding the k smallest distinct unsigned
  * 64-bit hash values. */
case class KmvDistinct(hash: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {
  require(k >= 2, s"KMV needs k >= 2, got $k") // estimator divides by k-1

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long hash input, got ${hash.dataType.simpleString}; " +
        "hash keys first (e.g. graft_splitmix64)")

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_kept", IntegerType, nullable = false),
    StructField("kth", LongType, nullable = true),
    StructField("est", LongType, nullable = false)))

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val h = hash.eval(input)
    if (h != null) buf.offer(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    other.foreach(buf.offer)
    buf
  }

  override def eval(buf: KmvBuffer): Any = {
    val n = buf.size
    if (n < k) InternalRow(n, null, n.toLong)
    else InternalRow(n, buf.kth, KmvDistinct.estimate(k, buf.kth))
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(hash = newChildren(0))
  override def prettyName: String = "graft_kmv_distinct"
}

object KmvDistinct {
  /** floor((k-1) * 2^64 / unsigned(kth)), clamped to Long.MaxValue —
    * pure integer arithmetic so both engines agree bit-for-bit. */
  def estimate(k: Int, kth: Long): Long = {
    val q = BigInteger.valueOf(k - 1L).shiftLeft(64)
      .divide(new BigInteger(java.lang.Long.toUnsignedString(kth)))
    if (q.bitLength > 63) Long.MaxValue else q.longValueExact()
  }
}

/** Column surface of [[KmvDistinct.estimate]]: (signed-bits long of an
  * unsigned 64-bit k-th minimum hash) -> estimated distinct count.
  * Codegen'd static call — the exact BigInteger arithmetic, no
  * Column-side DECIMAL division whose scale rounding could break the
  * floor. */
case class KmvEstimateFromKth(child: Expression, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long kth input, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(kth: Any): Any =
    KmvDistinct.estimate(k, kth.asInstanceOf[Long])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.KmvDistinct.estimate($k, $c)")
  override protected def withNewChildInternal(
      newChild: Expression): KmvEstimateFromKth = copy(child = newChild)
  override def prettyName: String = "graft_kmv_estimate"
}

/** Bounded sorted set of the k smallest distinct longs under UNSIGNED
  * order (the hash space is uniform over [0, 2^64)): the payload-free
  * special case of [[graft.ops.BottomKBuffer]] — ONE implementation of
  * the offer/evict/serde skeleton, not two drifting copies. O(log k)
  * offer, O(k) memory; the wire format is the shared 16-byte-entry one
  * (transient shuffle bytes within a single execution, never
  * persisted). */
final class KmvBuffer private (k: Int, inner: BottomKBuffer) {
  def this(k: Int) = this(k, new BottomKBuffer(k))

  def offer(h: Long): Unit = inner.offer(h, 0L)
  def size: Int = inner.size
  /** Largest kept hash (unsigned order) — the k-th minimum when full. */
  def kth: Long = inner.lastKey
  def foreach(f: Long => Unit): Unit = inner.foreach((h, _) => f(h))
  def toBytes: Array[Byte] = inner.toBytes
}

object KmvBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): KmvBuffer =
    new KmvBuffer(k, BottomKBuffer.fromBytes(k, bytes))
}
