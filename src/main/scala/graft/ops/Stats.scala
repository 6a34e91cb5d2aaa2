package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact-moment bivariate statistics: per-key Pearson correlation and
  * ordinary-least-squares slope/intercept, from DECIMAL co-moments.
  *
  * Spark's built-in `corr`/`regr_slope` accumulate doubles in partition
  * order, so their low bits depend on the physical split — fine for a
  * dashboard, unusable under a value-level hash oracle and unstable
  * across retries/AQE re-plans. This takes the [[EventAnalytics
  * .zScoreOutliers]] recipe one column up: the five co-moment SUMS ride
  * DECIMAL (exact, order-independent, map-side partials still apply),
  * and only the FINAL formula is IEEE double with a fixed evaluation
  * order — bit-exact on any partitioning and replayable by the DuckDB
  * oracle verbatim.
  *
  * Scale shape: one aggregate exchange keyed on `keyCols`, partial
  * sums before it; the stats frame is one row per key. Constant x (or
  * y) makes the corresponding variance term zero — corr/slope go NULL
  * (not a divide-by-zero throw under ANSI mode), intercept degrades to
  * the y mean when only slope is defined. Rows with a NULL in either
  * column are excluded from ALL moments (pairwise deletion, the
  * standard `corr` contract). */
object Stats {

  def corrRegression(df: DataFrame, keyCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(keyCols.nonEmpty, "corrRegression needs at least one key column")
    val x = col(xCol)
    val y = col(yCol)
    val agg = df
      .where(x.isNotNull && y.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(x.cast(DecimalType(18, 6))).cast(DoubleType).as("sx"),
        sum(y.cast(DecimalType(18, 6))).cast(DoubleType).as("sy"),
        sum((x * x).cast(DecimalType(28, 10))).cast(DoubleType).as("sxx"),
        sum((y * y).cast(DecimalType(28, 10))).cast(DoubleType).as("syy"),
        sum((x * y).cast(DecimalType(28, 10))).cast(DoubleType).as("sxy"))
    val n = col("n").cast(DoubleType)
    // fixed-order IEEE arithmetic from here down — every op below is
    // restated verbatim in the oracle SQL
    val num = n * col("sxy") - col("sx") * col("sy")
    val denx = n * col("sxx") - col("sx") * col("sx")
    val deny = n * col("syy") - col("sy") * col("sy")
    val slope = when(denx > 0, num / denx)
    agg.select(keyCols.map(col) :+
      col("n") :+
      when(denx > 0 && deny > 0,
        num / (sqrt(denx) * sqrt(deny))).as("corr") :+
      slope.as("slope") :+
      when(denx > 0, col("sy") / n - slope * (col("sx") / n))
        .as("intercept"): _*)
  }
}
