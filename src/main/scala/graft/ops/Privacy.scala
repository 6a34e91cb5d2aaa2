package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{LongHashes, TextHashes}

/** Differential-privacy release plumbing for per-group statistics.
  *
  * A 100 TB corpus is full of USER data — event streams, per-user
  * documents — and the aggregate boards published off it (counts per
  * cohort, usage per feature) leak membership unless noised. This
  * module implements the release pipeline the way a Spark-first
  * engine should: per-user pre-aggregation (one exchange), plan-time
  * contribution CLIPPING (the sensitivity bound), and seeded integer
  * noise — no RNG state, no driver loop, reproducible across runs,
  * partitionings, and engines.
  *
  * The mechanism is the DYADIC GEOMETRIC mechanism: two-sided
  * geometric noise `G1 - G2` with `G ~ Geometric(1/2)`, drawn as the
  * TRAILING-ONES count of a SplitMix64 word (each bit of the mixed
  * word is an independent fair coin, so `P(trailing ones = t) =
  * 2^-(t+1)` — the inverse-CDF is pure bit arithmetic:
  * `bit_count(z XOR (z+1)) - 1`). The noise pmf is `P(x) ∝ 2^-|x|`,
  * so a query with integer sensitivity Δ (here: the contribution cap
  * C) is released with `ε = Δ · ln 2` (the geometric mechanism of
  * Ghosh–Roughgarden–Sundararajan with α = 1/2). α is fixed at 1/2 ON
  * PURPOSE: it is the one parameter whose inverse-CDF needs no
  * transcendental function, so the draw is BIT-EXACT in any engine
  * and the DuckDB oracle replays the released values verbatim. A
  * production deployment wanting a finer ε swaps [[geometricNoise]]
  * for a secret-salted non-dyadic sampler — every other piece (the
  * clipping, the per-user pre-aggregation, the seeding discipline)
  * stays.
  *
  * TWO GUARANTEE CAVEATS, stated once here and assumed by every
  * release method (round-19 ADVICE):
  *
  *  - TRUNCATION: each geometric draw is truncated to [-62, 62] (the
  *    Long-arithmetic bound of the trailing-ones trick), so an output
  *    at the truncation edge has probability 0 under some neighbor —
  *    the mechanism is NOT pure ε-DP but (ε, δ)-DP with
  *    `δ <= 2·2^-62 ≈ 4.3e-19` (the two-sided tail mass past ±62),
  *    negligible against any physical population yet nonzero. Every
  *    ε below reads as "(ε, δ≈2^-62)".
  *
  *  - SCOPE: the stated ε is PER (group, statistic). Clipping bounds
  *    a user's contribution WITHIN one group; a user appearing in `g`
  *    groups shifts `g` released rows, so by sequential composition
  *    the full released DataFrame is `(g·ε, g·δ)`-DP with `g`
  *    unbounded unless the caller bounds it. For a RELEASE-LEVEL
  *    user guarantee, run [[boundGroupParticipation]] first — with
  *    participation capped at `G` groups the whole release is
  *    `(G·ε, G·δ)`-DP for every user.
  *
  * Determinism vs secrecy: the noise seed is a PUBLIC function of the
  * group key and a caller salt, which makes releases reproducible —
  * the right default for an oracle-gated engineering artifact, and
  * exactly one secret short of production (feed a secret salt and the
  * draw is as unpredictable as the salt; re-releasing the same group
  * under the same salt repeats the same noise, which is the correct
  * no-averaging-attack behavior, not a bug).
  */
object Privacy {

  /** Geometric(1/2) draw in 0..62 from a 64-bit word: the trailing-
    * ones count of the low 62 bits (masked so `z + 1` cannot overflow
    * a signed long under ANSI arithmetic; the 2^-62 truncation tail is
    * beyond any physical sample size). */
  private def trailingOnes(z: Column): Column = {
    val zm = z.bitwiseAND(lit((1L << 62) - 1))
    (bit_count(zm.bitwiseXOR(zm + lit(1L))) - lit(1)).cast(LongType)
  }

  /** Second-draw seed separation constant (the SplitMix64 golden
    * gamma) — XOR'd, never added, so ANSI overflow cannot fire. */
  private val GoldenGamma = 0x9e3779b97f4a7c15L

  /** Two-sided Geometric(1/2) noise (pmf ∝ 2^-|x|) from a seed
    * column: `G1 - G2` off two independently mixed words. Integer in
    * [-62, 62], mean 0, variance 4; a pure function of the seed. */
  def geometricNoise(seed: Column): Column =
    trailingOnes(LongHashes.splitmix64(seed)) -
      trailingOnes(LongHashes.splitmix64(seed.bitwiseXOR(lit(GoldenGamma))))

  /** Noisy per-group counting release with per-user contribution
    * clipping: each user's rows in a group count at most `cap` (so the
    * query's PER-GROUP sensitivity is exactly `cap`, and each released
    * row is `(ε, δ)`-DP with `ε = cap · ln 2`, `δ ≈ 2^-62`, under the
    * dyadic geometric mechanism — `cap = 1` is the textbook noisy
    * DISTINCT-USER count at ε = ln 2 ≈ 0.69). The guarantee scope and
    * the δ term are the module-level caveats: a user in `g` groups is
    * covered at `(g·ε, g·δ)` unless [[boundGroupParticipation]] ran
    * first. Null users carry no privacy unit and are excluded on both
    * sides of the oracle.
    *
    * Output: `(groupCol, n_users, n_capped, noise, n_noisy)` — the
    * true values ride along ON PURPOSE: this is the oracle-gated
    * engineering artifact proving the mechanism end to end; a
    * production release publishes ONLY `n_noisy` (drop the audit
    * columns) and feeds a secret `salt`.
    *
    * Scale shape: per-user pre-aggregation is one partial+final
    * exchange on (group, user); the group release is a second slim
    * aggregate over |users| rows; the noise is a per-group scalar
    * expression off the group key's rolling hash — no Window, no
    * join, no driver collect, no RNG state. At 100 TB the cost is the
    * two aggregates a plain per-group count already pays. */
  def noisyCount(df: DataFrame, groupCol: String, userCol: String,
      cap: Int, salt: Long): DataFrame = {
    require(cap >= 1, s"noisyCount: cap must be >= 1, got $cap")
    require(df.schema(groupCol).dataType == StringType,
      s"noisyCount: group column '$groupCol' must be STRING (the noise " +
        s"seed derives from the group key's content hash), got " +
        s"${df.schema(groupCol).dataType.simpleString}")
    val perUser = df.where(col(userCol).isNotNull)
      .groupBy(guardedGroup(groupCol, "noisyCount"), col(userCol))
      .agg(count(lit(1)).as("n_u"))
    val seed = TextHashes.rolling_hash64(col(groupCol))
      .bitwiseXOR(lit(salt))
    perUser.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_users"),
        sum(least(col("n_u"), lit(cap.toLong))).as("n_capped"))
      .select(col(groupCol), col("n_users"), col("n_capped"),
        geometricNoise(seed).as("noise"))
      .select(col(groupCol), col("n_users"), col("n_capped"),
        col("noise"), (col("n_capped") + col("noise")).as("n_noisy"))
  }

  /** Noisy per-group SUM release of a non-negative INTEGER value
    * column, under the quantized dyadic geometric mechanism: each
    * user's per-group total is CLIPPED to `[0, userCap]` (the
    * PER-GROUP L1 bound), then QUANTIZED to multiples of `unit`
    * (integer round-half-up), so the released statistic's per-group
    * sensitivity is exactly `ceil(userCap / unit)` UNITS and each
    * released row is `(ε, δ≈2^-62)`-DP with
    * `ε = ceil(userCap/unit) · ln 2` (module-level caveats: the δ is
    * the truncation tail; a user in `g` groups composes to `g·ε`
    * unless [[boundGroupParticipation]] ran first) — the caller dials
    * the
    * clip/unit pair to trade budget against resolution (finer units
    * mean more faithful sums and a larger ε; `unit = userCap` is the
    * ε = ln 2 "did this user contribute materially" release).
    * Quantization is a deterministic post-clip per-user transform, so
    * it costs utility (≤ unit/2 bias per user, surfaced in the audit
    * columns), never privacy. Values must be integral and >= 0 — a
    * negative value raises per-row (an unclipped lower bound would
    * silently break the sensitivity argument); nulls contribute
    * nothing.
    *
    * Output: `(groupCol, n_users, sum_capped, units_true, noise,
    * released)` with `released = (units_true + noise) * unit` — audit
    * columns ride along for the same reason as [[noisyCount]].
    * Same scale shape and seeding discipline as [[noisyCount]] (the
    * salt is XOR-folded with the unit so a count and a sum released
    * off the same groups under one salt draw independent noise). */
  def noisySum(df: DataFrame, groupCol: String, userCol: String,
      valueCol: String, userCap: Long, unit: Long, salt: Long): DataFrame = {
    // the half-up quantizer forms s_c * 2 + unit in long arithmetic,
    // which reaches 3·userCap when s_c and unit both sit at the cap —
    // bound the cap at MaxValue/3 so the sum can NEVER wrap (the
    // earlier MaxValue/2 bound left a silent-overflow window for caps
    // in (MaxValue/3, MaxValue/2] — round-19 ADVICE fix; a cap past
    // 2^61 is no real budget anyway)
    require(userCap >= 1 && userCap <= Long.MaxValue / 3,
      s"noisySum: userCap must be in [1, Long.MaxValue/3], got $userCap")
    require(unit >= 1 && unit <= userCap,
      s"noisySum: unit must be in [1, userCap], got $unit (cap $userCap)")
    require(df.schema(groupCol).dataType == StringType,
      s"noisySum: group column '$groupCol' must be STRING (the noise " +
        s"seed derives from the group key's content hash), got " +
        s"${df.schema(groupCol).dataType.simpleString}")
    df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"noisySum: value column '$valueCol' must be integral (quantize " +
          s"upstream — e.g. cents, tokens), got ${other.simpleString}")
    }
    val guarded = when(col(valueCol) < 0,
      raise_error(concat(lit("noisySum: negative value in '" + valueCol +
        "': "), col(valueCol).cast(StringType))))
      .otherwise(col(valueCol).cast(LongType))
    val perUser = df.where(col(userCol).isNotNull)
      .groupBy(guardedGroup(groupCol, "noisySum"), col(userCol))
      .agg(coalesce(sum(guarded), lit(0L)).as("s_u"))
      // integer round-half-up to units: (2x + unit) div (2 unit) —
      // `div` (not `/`) so the quotient is exact integral arithmetic
      .select(col(groupCol),
        least(col("s_u"), lit(userCap)).as("s_c"))
      .select(col(groupCol), col("s_c"),
        expr(s"(s_c * 2 + ${unit}L) div ${2 * unit}L").as("q_u"))
    val seed = TextHashes.rolling_hash64(col(groupCol))
      .bitwiseXOR(lit(salt)).bitwiseXOR(lit(unit))
    perUser.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_users"),
        sum(col("s_c")).as("sum_capped"),
        sum(col("q_u")).as("units_true"))
      .select(col(groupCol), col("n_users"), col("sum_capped"),
        col("units_true"), geometricNoise(seed).as("noise"))
      .select(col(groupCol), col("n_users"), col("sum_capped"),
        col("units_true"), col("noise"),
        ((col("units_true") + col("noise")) * lit(unit)).as("released"))
  }

  /** USER-LEVEL contribution bounding ACROSS groups — the missing
    * half of the clipping story (round-19 ADVICE): [[noisyCount]] /
    * [[noisySum]] clip within a group, but a user in `g` groups still
    * shifts `g` released rows. This op keeps each user's rows in at
    * most `maxGroups` groups, chosen DETERMINISTICALLY as the
    * `maxGroups` smallest [[LongHashes.splitmix64]] hashes of the
    * (user, group) pair — a pure function of the data (replayable,
    * partitioning-independent) with no "first seen" order dependence,
    * and unbiased across group identities (a lexicographic pick would
    * systematically favor low-sorting groups). After this op, a
    * release built per group at `(ε, δ)` is `(maxGroups·ε,
    * maxGroups·δ)`-DP FOR THE WHOLE DataFrame by sequential
    * composition — the release-level user guarantee the per-group
    * caveat points at.
    *
    * Scale shape: distinct (user, group) pairs (one slim exchange,
    * map-side partials), a BOUNDED per-user bottom-`maxGroups`
    * aggregate over those pairs ([[Sampling.BottomKByHash]] — at most
    * maxGroups entries per aggregation buffer, so a heavy-hitter user
    * in millions of groups costs O(maxGroups) memory, not O(its
    * fan-out); round-19 ADVICE: the previous collect_list phrasing
    * buffered ALL of a user's pairs before slicing), a join-back from
    * the kept hashes to their (user, group) pairs, then one semi-join
    * of the full frame against the kept pairs — broadcastable when
    * |kept pairs| is (as usual) dimension-sized; never a shuffle of
    * the raw frame beyond the join itself. */
  def boundGroupParticipation(df: DataFrame, groupCol: String,
      userCol: String, maxGroups: Int): DataFrame = {
    require(maxGroups >= 1,
      s"boundGroupParticipation: maxGroups must be >= 1, got $maxGroups")
    require(df.schema(groupCol).dataType == StringType,
      s"boundGroupParticipation: group column '$groupCol' must be " +
        s"STRING (the pick hashes the group key's content), got " +
        s"${df.schema(groupCol).dataType.simpleString}")
    df.schema(userCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"boundGroupParticipation: user column '$userCol' must be " +
          s"integral (the pick hash folds it as a long; map string " +
          s"users to ids upstream), got ${other.simpleString}")
    }
    val pairs = df.where(col(userCol).isNotNull)
      .select(guardedGroup(groupCol, "boundGroupParticipation"),
        col(userCol))
      .distinct()
      .select(col(userCol), col(groupCol),
        LongHashes.splitmix64(TextHashes.rolling_hash64(col(groupCol))
          .bitwiseXOR(col(userCol).cast(LongType))).as("__h"))
    // bounded pick, bit-identical to the reference slice(sort(all
    // pairs), maxGroups): the first maxGroups (h, group) pairs in
    // ascending order span at most maxGroups DISTINCT hashes, so
    // keeping the bottom-maxGroups distinct hashes (bounded buffer),
    // joining back to their pairs, and re-slicing that ≤maxGroups(+ε
    // under a 2^-64 same-user hash collision)-row sublist reproduces
    // the exact pick — the final collect_list buffers only the
    // already-bounded sublist, never the user's raw fan-out
    val keptHashes = pairs
      .groupBy(col(userCol))
      .agg(Sampling.bottomKByHash(col("__h"), col("__h"), maxGroups)
        .as("__ks"))
      .select(col(userCol),
        explode(transform(col("__ks"), s => s.getField("skey")))
          .as("__h"))
    val kept = pairs.join(keptHashes, Seq(userCol, "__h"))
      .groupBy(col(userCol))
      .agg(slice(array_sort(collect_list(struct(col("__h"),
        col(groupCol)))), 1, maxGroups).as("__k"))
      .select(col(userCol), explode(col("__k")).as("__k"))
      .select(col(userCol), col("__k").getField(groupCol).as(groupCol))
    df.join(kept, Seq(userCol, groupCol), "left_semi")
      .select(df.columns.map(col): _*)
  }

  /** Group key with the NULL raise folded in (used as the groupBy
    * key, so it evaluates per row): a NULL group key has no content
    * hash to seed from, and a silently-released NULL-noise row would
    * break both the loud-guard and the bit-exact-replay contracts —
    * the quotaSampleByGroup convention, enforced at runtime because
    * nullness is data, not schema. */
  private def guardedGroup(groupCol: String, op: String): Column =
    when(col(groupCol).isNull,
      raise_error(lit(s"$op: group column '$groupCol' contains NULL — " +
        "NULL has no seedable group key; filter or fill it upstream")))
      .otherwise(col(groupCol)).as(groupCol)
}
