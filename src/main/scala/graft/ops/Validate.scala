package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declarative data-quality validation (the Deequ-style constraint
  * suite, re-expressed as plain Catalyst aggregates): run a set of
  * rules against a frame in as few passes as the rule semantics allow
  * and get one row per rule — `(rule, col_name, violations, pass)` — the
  * gate you run over a 100 TB drop BEFORE it enters training.
  *
  * Pass structure (the scale design, not an accident):
  *  - ALL row-local rules (not-null, range, regex) fold into ONE
  *    aggregate over ONE narrow scan — each rule is a
  *    `sum(violated ? 1 : 0)` column, map-side partials, no shuffle of
  *    data rows, and the scan reads only the referenced columns;
  *  - each UNIQUE rule is its own single-distinct aggregate scan:
  *    Spark plans ONE distinct without an Expand, but fusing several
  *    `count(DISTINCT x)` into one aggregate multiplies every row by
  *    the distinct-count via Expand — the q_profile scale-killer this
  *    repo already adjudicated — so N unique rules deliberately cost N
  *    cheap scans instead of one catastrophic one;
  *  - each FOREIGN-KEY rule is a left-anti join against the projected
  *    key column of its dimension, un-hinted on purpose (AQE
  *    broadcasts small dims; a huge dim degrades to a shuffled anti
  *    join instead of OOMing the driver).
  *
  * Violation counts are exact BIGINTs and `pass` is `violations == 0`
  * — trivially oracle-replayable. NULL semantics: a NULL never
  * violates a range/regex rule (absence is [[NotNull]]'s job — one
  * fact per rule), and NULLs in a [[Unique]] column are ignored by
  * both `count(col)` and `count(DISTINCT col)`, matching SQL. */
object Validate {

  sealed trait Rule { def name: String; def column: String }
  /** `column IS NOT NULL`. */
  final case class NotNull(column: String) extends Rule {
    val name = "not_null"
  }
  /** `lo <= column <= hi` (inclusive both ends; NULLs don't violate). */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Rule {
    val name = "in_range"
  }
  /** Java-regex full/partial match via `rlike` (anchor the pattern for
    * a full match; NULLs don't violate). Keep patterns RE2-compatible
    * if an oracle replay matters — the repo's scrub rules document the
    * dialect trap. */
  final case class MatchesRegex(column: String, pattern: String)
      extends Rule {
    val name = "matches_regex"
  }
  /** No duplicate non-NULL values: `count(col) == count(DISTINCT col)`;
    * violations = the surplus row count. */
  final case class Unique(column: String) extends Rule {
    val name = "unique"
  }
  /** Every non-NULL value exists in `dim.dimKey` (referential
    * integrity); violations = dangling row count. */
  final case class ForeignKey(column: String, dim: DataFrame,
      dimKey: String) extends Rule {
    val name = "foreign_key"
  }
  /** k-anonymity audit: every combination of the quasi-identifier
    * `columns` must cover at least `k` rows; violations = the number
    * of ROWS sitting in a smaller group (the re-identifiable ones).
    * NULLs group together, standard GROUP BY semantics. One exchange
    * on the quasi-identifier key with map-side partial counts — the
    * privacy gate at any scale. */
  final case class MinGroupSize(columns: Seq[String], k: Long)
      extends Rule {
    require(columns.nonEmpty && k >= 1)
    val name = "min_group_size"
    val column: String = columns.mkString(",")
  }

  private def violatedExpr(r: Rule): Column = r match {
    case NotNull(c) => col(c).isNull
    case InRange(c, lo, hi) =>
      col(c).isNotNull && (col(c) < lo || col(c) > hi)
    case MatchesRegex(c, p) => col(c).isNotNull && !col(c).rlike(p)
    case other => throw new IllegalArgumentException(
      s"${other.name} is not row-local")
  }

  /** Run `rules` against `df`; returns `(rule, col_name, violations,
    * pass)`, one row per rule — call `.orderBy` for a stable output
    * order. */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "validate needs at least one rule")
    val rowLocal = rules.filter {
      case _: NotNull | _: InRange | _: MatchesRegex => true
      case _ => false
    }
    val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (rowLocal.nonEmpty) {
      // one fused aggregate: every row-local rule rides the same scan
      val agg = df.agg(
        sum(when(violatedExpr(rowLocal.head), 1L).otherwise(0L))
          .as("v0"),
        rowLocal.tail.zipWithIndex.map { case (r, i) =>
          sum(when(violatedExpr(r), 1L).otherwise(0L)).as(s"v${i + 1}")
        }: _*)
      // melt with TYPED columns (array-of-struct + explode), not a
      // string-built stack() selectExpr: a rule/column name holding a
      // quote or backslash must flow through as data, never be parsed
      // as expression text
      val melted = rowLocal.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("rule"), lit(r.column).as("col_name"),
          col(s"v$i").as("violations"))
      }
      frames += agg.select(explode(array(melted: _*)).as("m"))
        .select(col("m.rule").as("rule"), col("m.col_name").as("col_name"),
          col("m.violations").as("violations"))
    }
    rules.foreach {
      case Unique(c) =>
        frames += df.agg((count(col(c)) - countDistinct(col(c)))
            .as("violations"))
          .select(lit("unique").as("rule"), lit(c).as("col_name"),
            col("violations"))
      case ForeignKey(c, dim, dk) =>
        frames += df.select(col(c)).where(col(c).isNotNull)
          .join(dim.select(col(dk).as(c)), Seq(c), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit("foreign_key").as("rule"), lit(c).as("col_name"),
            col("violations"))
      case r @ MinGroupSize(cols, k) =>
        frames += df.groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("n"))
          .where(col("n") < k)
          .agg(coalesce(sum(col("n")), lit(0L)).as("violations"))
          .select(lit(r.name).as("rule"), lit(r.column).as("col_name"),
            col("violations"))
      case _ => () // row-local: already in the fused frame
    }
    frames.reduce(_ unionByName _)
      .withColumn("violations", col("violations").cast(LongType))
      .withColumn("pass", col("violations") === 0L)
  }

  /** Expected Benford share of first digit d: log10(1 + 1/d). Computed
    * ONCE on the driver and stamped into BOTH engines as the same
    * exact double literal (the hyperplane-literal recipe) — no
    * query-time libm, so no cross-engine log drift. */
  private[graft] val BenfordShares: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))

  /** BENFORD FIRST-DIGIT AUDIT — the fraud/corruption smoke test for
    * naturally-occurring magnitudes (prices, populations, file sizes):
    * organic multi-magnitude data leads with digit d at share
    * log10(1+1/d) (~30% ones, ~4.6% nines); fabricated or truncated
    * data doesn't. First digit extracted by STRING head of the
    * positive integer (cent-scale first) — no log10 at query time —
    * and compared per digit: `share = n_d / n` (one exact-operand
    * division) against the stamped constant, `dev = share − benford`.
    * Zero/negative/NULL values drop (Benford is defined on positive
    * magnitudes). Returns one row per digit 1-9 (absent digits n=0 —
    * their deviation is the signal, so they must not vanish).
    *
    * Scale shape: ONE map-side-partial count by digit (9 groups), a
    * 9-row literal frame join, total on a 1-row broadcast. */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val v = col(valueCol).cast(LongType)
    val counts = df.where(v.isNotNull && v > 0L)
      .select(substring(v.cast(StringType), 1, 1).cast(IntegerType)
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val expected = spark.createDataFrame(BenfordShares)
      .toDF("digit", "benford")
    val total = counts.agg(sum(col("n")).as("n_tot"))
    expected.join(counts, Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
        when(col("n_tot") > 0L, coalesce(col("n"), lit(0L))
          .cast(DoubleType) / col("n_tot").cast(DoubleType)).as("share"),
        col("benford"))
      .withColumn("dev", col("share") - col("benford"))
  }
}
