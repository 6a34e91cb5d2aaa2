package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions.{col, expr}
import org.scalatest.matchers.should.Matchers

class StatsSpec extends SparkSpecBase with Matchers {
  import spark.implicits._

  test("corrRegression: hand-computed moments — perfect line, noisy " +
      "line, constant-x null guards, pairwise null deletion") {
    val df = Seq(
      // key a: y = 2x exactly -> corr 1, slope 2, intercept 0
      ("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 6.0),
      // key b: (1,1),(2,2),(3,4) -> corr 9/sqrt(84), slope 1.5,
      // intercept 7/3 - 1.5*2
      ("b", 1.0, 1.0), ("b", 2.0, 2.0), ("b", 3.0, 4.0),
      // key c: constant x -> denx = 0 -> corr/slope/intercept all null
      ("c", 5.0, 1.0), ("c", 5.0, 2.0),
      // key d: null in either column drops the PAIR, leaving y=2x rows
      ("d", 1.0, 2.0), ("d", 2.0, 4.0), ("d", 3.0, 6.0)
    ).toDF("k", "x", "y")
      .union(Seq(("d", Option.empty[Double], Option(9.0)),
        ("d", Option(9.0), Option.empty[Double]))
        .toDF("k", "x", "y"))
    val out = Stats.corrRegression(df, Seq("k"), "x", "y")
      .orderBy("k").collect()
    out.map(_.getString(0)).toSeq shouldBe Seq("a", "b", "c", "d")
    val a = out(0)
    a.getLong(1) shouldBe 3L
    a.getDouble(2) shouldBe 1.0 +- 1e-12
    a.getDouble(3) shouldBe 2.0 +- 1e-12
    a.getDouble(4) shouldBe 0.0 +- 1e-12
    val b = out(1)
    b.getDouble(2) shouldBe 9.0 / math.sqrt(84.0) +- 1e-12
    b.getDouble(3) shouldBe 1.5 +- 1e-12
    b.getDouble(4) shouldBe (7.0 / 3.0 - 1.5 * 2.0) +- 1e-12
    val c = out(2)
    c.isNullAt(2) shouldBe true
    c.isNullAt(3) shouldBe true
    c.isNullAt(4) shouldBe true
    val d = out(3)
    d.getLong(1) shouldBe 3L // null pairs excluded from every moment
    d.getDouble(3) shouldBe 2.0 +- 1e-12
  }

  test("histogramDrift: hand-computed bins, proportions, novel-region " +
      "rows, and the exact TVD fold") {
    val ref = Seq(0.5, 0.7, 1.5).toDF("v")   // bins 0:2, 1:1
    val cur = Seq(0.2, 3.5).toDF("v")        // bins 0:1, 3:1 (bin 3 novel)
    val out = Stats.histogramDrift(ref, cur, "v", binWidth = 1.0)
      .orderBy("bin")
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    val exp = Seq(
      (0L, 2L, 1L, 2.0 / 3.0, 0.5, math.abs(2.0 / 3.0 - 0.5)),
      (1L, 1L, 0L, 1.0 / 3.0, 0.0, 1.0 / 3.0),
      (3L, 0L, 1L, 0.0, 0.5, 0.5)) // the novel region
    out.map(r => (r._1, r._2, r._3)) shouldBe exp.map(e => (e._1, e._2, e._3))
    out.zip(exp).foreach { case (g, e) =>
      g._4 shouldBe e._4 +- 1e-15
      g._5 shouldBe e._5 +- 1e-15
      g._6 shouldBe e._6 +- 1e-15
    }
    val wantTvd = 0.5 * (exp(0)._6 + exp(1)._6 + exp(2)._6)
    all(out.map(_._7)) shouldBe wantTvd +- 1e-15
  }

  test("histogramDrift TVD is partition-order independent (ordered " +
      "fold, not a floating sum)") {
    val rng = new scala.util.Random(3)
    val a = Seq.fill(4000)(rng.nextDouble() * 100).toDF("v")
    val b = Seq.fill(4000)(rng.nextGaussian() * 20 + 60).toDF("v")
    def tvd(parts: Int): Double =
      Stats.histogramDrift(a.repartition(parts), b.repartition(parts + 3),
          "v", binWidth = 5.0)
        .select("tvd").as[Double].head()
    tvd(1) shouldBe tvd(11) // bit-for-bit
  }

  test("histogramDriftEqDepth catches a bulk shift that fixed-width " +
      "bins miss on a heavy-tailed column, and is partition-invariant") {
    // Heavy tail: 990 of 1000 ref values sit in [0, 100]; 10 outliers
    // reach 1_000_000, so any fixed width sized to cover the range
    // (e.g. 10_000) drops essentially ALL mass into bin 0. The current
    // snapshot shifts the bulk from ~uniform[0,100] to ~uniform[0,50]
    // — a drastic drift that never crosses a 10_000-wide bin edge.
    val ref = ((0 until 990).map(i => (i.toLong, (i % 100).toLong)) ++
      (0 until 10).map(i => (990L + i, 1000000L))).toDF("id", "v")
    val cur = ((0 until 990).map(i => (i.toLong, (i % 50).toLong)) ++
      (0 until 10).map(i => (990L + i, 1000000L))).toDF("id", "v")
    val fixedTvd = Stats.histogramDrift(ref.select("v"), cur.select("v"),
        "v", binWidth = 10000.0)
      .select("tvd").as[Double].head()
    fixedTvd should be < 0.01 // blind: all bulk mass shares bin 0
    def eqDepth(parts: Int): Double =
      Stats.histogramDriftEqDepth(ref.repartition(parts),
          cur.repartition(parts + 2), "id", "v", nBins = 8, k = 256)
        .select("tvd").as[Double].head()
    val caught = eqDepth(1)
    caught should be > 0.3 // the bulk shift moves mass across edges
    eqDepth(9) shouldBe caught // bit-for-bit partition invariance
  }

  test("robustZOutliers flags contamination that MASKS mean/std scoring " +
      "(the breakdown-point case), and nothing else") {
    // 90 inliers near 100, 10 outliers at 100000: the outliers inflate
    // the std to ~30k, putting their own z at ~3.0 — below the 3.5 cut,
    // self-masked. Median/MAD ignores them entirely.
    val rows = ((1L to 90L).map(i => (i, "g", 100L + i % 7)) ++
      (91L to 100L).map(i => (i, "g", 100000L))).toDF("id", "g", "v")
    val classic = EventAnalytics.zScoreOutliers(rows, "id", "g", "v", 3.5)
      .select("id").as[Long].collect()
    classic shouldBe empty // masked: nothing flagged at all
    val robust = Stats.robustZOutliers(rows, "id", "g", "v",
        threshold = 3.5, k = 256)
      .select("id").as[Long].collect().sorted.toSeq
    robust shouldBe (91L to 100L) // exactly the contamination
  }

  test("quantileNormalize: hand-computed within-key percentiles — the " +
      "same raw value calibrates differently per source") {
    // source A values 1..10, source B values 101..110: raw thresholds
    // are incomparable; pct makes them so. k=64 > group sizes, so the
    // sample is the full group and pct is the exact empirical CDF.
    val rows = (1L to 10L).map(i => (i, "A", i)) ++
      (1L to 10L).map(i => (100L + i, "B", 100L + i))
    val out = Stats.quantileNormalize(rows.toDF("id", "src", "v"),
        "id", "src", "v", k = 64)
      .select("id", "src", "pct")
      .as[(Long, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    out((3L, "A")) shouldBe 0.3  // 3 of 10 values <= 3
    out((10L, "A")) shouldBe 1.0
    out((103L, "B")) shouldBe 0.3 // same RANK, wildly different raw value
    // and the normalized cut selects per-source tails of equal size
    val top = out.collect { case (k2, p) if p > 0.8 => k2 }.toSeq
    top.count(_._2 == "A") shouldBe top.count(_._2 == "B")
  }

  test("corrRegression is partition-order independent (exact DECIMAL " +
      "moments): 1 partition == 7 partitions bit-for-bit") {
    val rng = new scala.util.Random(5)
    val rows = Seq.tabulate(500) { i =>
      ("g" + (i % 3), rng.nextDouble() * 100, rng.nextDouble() * 1000)
    }
    def run(parts: Int): Seq[(String, Long, Double, Double, Double)] =
      Stats.corrRegression(
          rows.toDF("k", "x", "y").repartition(parts), Seq("k"), "x", "y")
        .orderBy("k")
        .as[(String, Long, Double, Double, Double)].collect().toSeq
    run(1) shouldBe run(7)
  }

  test("winsorize: clamps into the sketch band, flags directions, " +
      "null value stays null (no silent q_hi rewrite)") {
    import org.apache.spark.sql.functions.{col, expr}
    // one key, 5 values + a null; k=256 >> n so the sketch holds all
    // rows: p25 -> rank 1.0 -> 10.0, p75 -> rank 3.0 -> 30.0
    val df = Seq((0L, Option(0L)), (1L, Option(10L)), (2L, Option(20L)),
        (3L, Option(30L)), (4L, Option(40L)), (5L, Option.empty[Long]))
      .map { case (id, v) => (id, "k", v) }.toDF("id", "g", "v")
    val out = Stats.winsorize(df, "id", "g", "v", pLo = 0.25, pHi = 0.75)
      .select("id", "v_winsor", "clipped_lo", "clipped_hi")
      .as[(Long, Option[Double], Option[Boolean], Option[Boolean])]
      .collect().sortBy(_._1).toSeq
    out shouldBe Seq(
      (0L, Some(10.0), Some(true), Some(false)),
      (1L, Some(10.0), Some(false), Some(false)),
      (2L, Some(20.0), Some(false), Some(false)),
      (3L, Some(30.0), Some(false), Some(false)),
      (4L, Some(30.0), Some(false), Some(true)),
      (5L, None, None, None))
  }

  test("winsorize: a key with no band (all values NULL, or a NULL key) " +
      "survives the left join with NULL outputs — no silent drop") {
    val df = Seq(
      (0L, Option("a"), Option(10L)),   // normal key, gets a band
      (1L, Option("a"), Option(20L)),
      (2L, Option("b"), Option.empty[Long]), // key b: every value NULL
      (3L, Option.empty[String], Option(99L))) // NULL key never matches
      .toDF("id", "g", "v")
    val out = Stats.winsorize(df, "id", "g", "v", pLo = 0.25, pHi = 0.75)
      .select("id", "v_winsor", "clipped_lo", "clipped_hi")
      .as[(Long, Option[Double], Option[Boolean], Option[Boolean])]
      .collect().sortBy(_._1).toSeq
    out.map(_._1) shouldBe Seq(0L, 1L, 2L, 3L) // all four rows survive
    out(2) shouldBe ((2L, None, None, None))
    out(3) shouldBe ((3L, None, None, None))
    out(0)._2 should not be empty // banded key still clamps
  }

  test("profileDrift: exact stats per side, null-rate delta both " +
      "directions, distinct estimate exact below k") {
    import org.apache.spark.sql.functions.{col, expr}
    val ref = Seq(Option(1L), Option(2L), Option(3L), Option(3L), None)
      .zipWithIndex.map { case (a, i) => (a, Option(i.toLong)) }
      .toDF("a", "b") // a: 1 null of 5, 3 distinct; b: none null, 5 distinct
    val cur = Seq(
      (Option(7L), Option(0L)), (Option(7L), Option.empty[Long]),
      (Option(8L), Option.empty[Long]), (Option(9L), Option(1L)))
      .toDF("a", "b") // a: 0 null of 4, 3 distinct; b: 2 null of 4
    val out = Stats.profileDrift(ref, cur,
        Seq(("a", col("a")), ("b", col("b"))))
      .select("col_name", "n_ref", "nulls_ref", "dist_ref", "min_ref",
        "max_ref", "n_cur", "nulls_cur", "dist_cur", "min_cur", "max_cur",
        "null_rate_delta")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long,
        Long, Double)]
      .collect().sortBy(_._1).toSeq
    out shouldBe Seq(
      // a: null rate 1/5 -> 0/4 (negative delta)
      ("a", 4L, 1L, 3L, 1L, 3L, 4L, 0L, 3L, 7L, 9L, 0.0 / 4 - 1.0 / 5),
      // b: null rate 0/5 -> 2/4 (positive delta)
      ("b", 5L, 0L, 5L, 0L, 4L, 2L, 2L, 2L, 0L, 1L, 2.0 / 4 - 0.0 / 5))
  }

  test("bootstrapCI: bit-matches an independent local model (same hash, " +
      "same CDF thresholds, same interpolation); weights average ~1; " +
      "id guard and spec validation are loud") {
    import graft.functions.LongHashes
    val b = 32
    val rows = (1L to 100L).map(i => ("g", i, i * 10L))
    val out = Stats.bootstrapCI(rows.toDF("g", "id", "v"), Seq("g"),
        "id", "v", b = b)
      .select("g", "n", "mean", "n_reps", "ci_lo", "ci_hi")
      .as[(String, Long, Double, Long, Double, Double)].head()
    // local model, written independently of the operator
    def weight(id: Long, i: Int): Long = {
      val u = (LongHashes.splitmix64Of(id * b + i) >>> 11).toDouble *
        1.1102230246251565e-16
      Stats.Poisson1Cdf.count(c => u >= c).toLong
    }
    val ms = (0 until b).flatMap { i =>
      val ws = (1L to 100L).map(id => id -> weight(id, i))
      val sw = ws.map(_._2).sum
      if (sw == 0) None
      else Some(ws.map { case (id, w) => w * id * 10L }.sum.toDouble / sw)
    }.sorted
    def interp(vs: Seq[Double], q: Double): Double = {
      val r = q * (vs.size - 1); val lo = math.floor(r).toInt
      vs(lo) + (vs(math.min(lo + 1, vs.size - 1)) - vs(lo)) * (r - lo)
    }
    out._2 shouldBe 100L
    out._3 shouldBe (1L to 100L).map(_ * 10L).sum.toDouble / 100
    out._4 shouldBe ms.size.toLong
    out._5 shouldBe interp(ms, 0.025)
    out._6 shouldBe interp(ms, 0.975)
    // the CI brackets the true mean and the weights are calibrated
    out._5 should be < out._3
    out._6 should be > out._3
    val allW = for (id <- 1L to 100L; i <- 0 until b) yield weight(id, i)
    (allW.sum.toDouble / allW.size) shouldBe 1.0 +- 0.05
    intercept[Exception] {
      Stats.bootstrapCI(Seq(("g", -1L, 5L)).toDF("g", "id", "v"),
        Seq("g"), "id", "v").collect()
    }.getMessage should include("id out of")
    intercept[IllegalArgumentException] {
      Stats.bootstrapCI(rows.toDF("g", "id", "v"), Seq("g"), "id", "v",
        b = 4)
    }.getMessage should include("b must be")
  }

  test("calibratedQualityGate: hand-computed interpolated thresholds on " +
      "a full-coverage sketch, band gates on one shared sketch, NULL " +
      "signal fails CLOSED, bad specs rejected") {
    // ids 1..10 with v = id; k=64 covers everything, so the sketch is
    // the full sorted set and thresholds are the explicit formula:
    // p25 over 1..10 -> r=2.25 -> 3 + .25 = 3.25; p75 -> 7.75
    val rows = (1L to 10L).map(i => (i, Some(i))) :+ (11L, None)
    val df = rows.toDF("id", "v")
    val out = Stats.calibratedQualityGate(df, "id",
        signals = Seq("v" -> col("v")),
        gates = Seq(
          ("v_lo", "v", 0.25, false),   // keep v >= p25
          ("v_hi", "v", 0.75, true)),   // keep v <= p75
        k = 64)
      .select("id", "v_lo_thr", "v_hi_thr", "v_lo_ok", "v_hi_ok", "keep")
      .as[(Long, Double, Double, Option[Boolean], Option[Boolean], Boolean)]
      .collect().sortBy(_._1).toSeq
    out.foreach { r =>
      r._2 shouldBe 3.25
      r._3 shouldBe 7.75
    }
    out.map(r => (r._1, r._4, r._5, r._6)) shouldBe
      ((1L to 10L).map(i => (i, Some(i >= 3.25), Some(i <= 7.75),
        i >= 3.25 && i <= 7.75)) :+
        ((11L, None, None, false))) // NULL signal: flags NULL, keep false
    intercept[IllegalArgumentException] {
      Stats.calibratedQualityGate(df, "id", Seq("v" -> col("v")),
        Seq(("g", "missing", 0.5, true)))
    }.getMessage should include("unknown signal")
    intercept[IllegalArgumentException] {
      Stats.calibratedQualityGate(df, "id", Seq("v" -> col("v")),
        Seq(("g", "v", 1.0, true)))
    }.getMessage should include("percentile")
  }

  test("twoProportionZ: hand-computed pooled-variance z with IEEE-order-" +
      "exact expectation, degenerate-pool NULL, empty-variant NULL, " +
      "null-row drop") {
    def zt(rows: Seq[(Boolean, Boolean)]) =
      Stats.twoProportionZ(rows.toDF("v", "y"), "v", "y")
        .as[(Long, Long, Long, Long, Option[Double], Option[Double],
          Option[Double], Option[Double])]
        .collect().head
    // treatment 2/4 vs control 1/4: expectation written with the op's
    // exact operation order
    val rows = Seq((true, true), (true, true), (true, false),
      (true, false), (false, true), (false, false), (false, false),
      (false, false))
    val (n1, x1, n2, x2, p1, p2, lift, z) = zt(rows)
    (n1, x1, n2, x2) shouldBe (4L, 2L, 4L, 1L)
    p1 shouldBe Some(0.5)
    p2 shouldBe Some(0.25)
    lift shouldBe Some(0.5 - 0.25)
    val pPool = 3.0 / 8.0
    z shouldBe Some((0.5 - 0.25) /
      math.sqrt(pPool * (1.0 - pPool) * (1.0 / 4.0 + 1.0 / 4.0)))
    // no successes anywhere, or all successes: zero pooled variance
    zt(Seq((true, false), (false, false)))._8 shouldBe None
    zt(Seq((true, true), (false, true)))._8 shouldBe None
    // an empty variant makes the test undefined
    zt(Seq((true, true), (true, false)))._8 shouldBe None
    // identical rates -> z exactly 0
    zt(Seq((true, true), (true, false), (false, true),
      (false, false)))._8 shouldBe Some(0.0)
    // null variant/outcome rows drop before counting
    val withNulls = Seq((Option(true), Option(true)),
      (Option(false), Option(false)), (Option.empty[Boolean], Option(true)),
      (Option(true), Option.empty[Boolean])).toDF("v", "y")
    Stats.twoProportionZ(withNulls, "v", "y")
      .as[(Long, Long, Long, Long, Double, Double, Double, Option[Double])]
      .collect().head._1 shouldBe 1L
  }

  test("ksTest: hand-computed sup of the ECDF gap, identical-sample " +
      "zero, empty-side NULL, null-value drop, brute-force agreement " +
      "on seeded samples") {
    def ks(r: Seq[Long], c: Seq[Long]) =
      Stats.ksTest(r.toDF("x"), c.toDF("x"), "x")
        .as[(Long, Long, Long, Option[Double], Option[Double])]
        .collect().head
    // ref [1,2,2], cur [2,3]: the gap peaks at v=2 where
    // F_ref=1, F_cur=1/2 -> d_num = |3*2 - 1*3| = 3, d = 3/6 = 0.5
    val (nr, nc, dn, d, stat) = ks(Seq(1L, 2L, 2L), Seq(2L, 3L))
    (nr, nc, dn, d) shouldBe (3L, 2L, 3L, Some(0.5))
    stat shouldBe Some(math.sqrt(6.0 / 5.0) * 0.5)
    // identical samples -> D = 0
    ks(Seq(5L, 7L, 9L), Seq(5L, 7L, 9L))._4 shouldBe Some(0.0)
    // disjoint supports -> D = 1
    ks(Seq(1L, 2L), Seq(10L, 11L))._4 shouldBe Some(1.0)
    // an empty side -> NULL d
    ks(Seq(1L, 2L), Seq.empty)._4 shouldBe None
    // nulls drop before counting
    Stats.ksTest(
      Seq(Option(1L), Option(2L), Option.empty[Long]).toDF("x"),
      Seq(Option(2L), Option(3L)).toDF("x"), "x")
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().head._1 shouldBe 2L
    // brute force on seeded random samples: D as a max over pooled
    // thresholds computed driver-side with exact rationals
    val rnd = new scala.util.Random(99L)
    val r = Seq.fill(200)(rnd.nextInt(30).toLong)
    val c = Seq.fill(150)(rnd.nextInt(30).toLong + 5)
    val pooled = (r ++ c).distinct.sorted
    val expectedNum = pooled.map(t =>
      math.abs(r.count(_ <= t).toLong * c.size - c.count(_ <= t).toLong * r.size)).max
    val got = ks(r, c)
    got._3 shouldBe expectedNum
    got._4 shouldBe Some(expectedNum.toDouble / (r.size.toLong * c.size).toDouble)
  }

  test("cohenKappa: hand-computed confusion — textbook agreement, " +
      "perfect/inverse raters, constant-rater NULL, null-row drop") {
    def kappa(rows: Seq[(Boolean, Boolean)]) =
      Stats.cohenKappa(rows.toDF("r1", "r2"), "r1", "r2")
        .as[(Long, Long, Long, Long, Long, Double, Double, Option[Double])]
        .collect().head
    // classic 2x2: a=20 b=5 c=10 d=15, n=50. po=35/50=0.7,
    // pe_num=25*30+25*20=1250, pe=0.5,
    // kappa=(50*35-1250)/(2500-1250)=500/1250=0.4
    val rows = Seq.fill(20)((true, true)) ++ Seq.fill(5)((true, false)) ++
      Seq.fill(10)((false, true)) ++ Seq.fill(15)((false, false))
    kappa(rows) shouldBe (50L, 20L, 5L, 10L, 15L, 0.7, 0.5, Some(0.4))
    // perfect agreement with both classes present -> kappa 1
    kappa(Seq((true, true), (false, false))) shouldBe
      (2L, 1L, 0L, 0L, 1L, 1.0, 0.5, Some(1.0))
    // perfect DISagreement -> kappa -1
    kappa(Seq((true, false), (false, true))) shouldBe
      (2L, 0L, 1L, 1L, 0L, 0.0, 0.5, Some(-1.0))
    // ONE constant rater still has pe < 1: kappa is exactly 0, not
    // NULL (agreement no better than chance)
    kappa(Seq((true, true), (false, true))) shouldBe
      (2L, 1L, 0L, 1L, 0L, 0.5, 0.5, Some(0.0))
    // BOTH raters constant: pe = 1, n^2 = pe_num -> kappa NULL
    kappa(Seq((true, true), (true, true))) shouldBe
      (2L, 2L, 0L, 0L, 0L, 1.0, 1.0, None)
    // null in either rater drops the row
    val withNulls = Seq((Option(true), Option(true)),
      (Option(false), Option(false)), (Option.empty[Boolean], Option(true)),
      (Option(true), Option.empty[Boolean])).toDF("r1", "r2")
    Stats.cohenKappa(withNulls, "r1", "r2")
      .as[(Long, Long, Long, Long, Long, Double, Double, Option[Double])]
      .collect().head shouldBe
      (2L, 1L, 0L, 0L, 1L, 1.0, 0.5, Some(1.0))
  }

  test("rocAuc: hand-computed rank sums — perfect separation, " +
      "anti-correlated, constant score, tie correction, null drop") {
    def auc(rows: Seq[(Long, Long)]): (Long, Long, Long, Double) =
      Stats.rocAuc(rows.toDF("s", "y"), "s", "y")
        .as[(Long, Long, Long, Double)].collect().head
    // positives strictly above negatives -> AUC 1
    auc(Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L))) shouldBe
      (2L, 2L, 8L, 1.0)
    // positives strictly below -> AUC 0
    auc(Seq((1L, 1L), (2L, 1L), (3L, 0L), (4L, 0L))) shouldBe
      (2L, 2L, 0L, 0.0)
    // all scores tied: one block n=4 np=2, r2 = 2*(0+4+1) = 10,
    // u2 = 10 - 2*3 = 4, auc = 4/8 = 0.5 — the tie correction is
    // what lands a constant score at exactly chance
    auc(Seq((7L, 1L), (7L, 0L), (7L, 1L), (7L, 0L))) shouldBe
      (2L, 2L, 4L, 0.5)
    // mixed ties: scores [1,1,2], labels [1,0,0]: block s=1 has
    // doubled avg rank 3 -> sum_r2 = 3, u2 = 3-2 = 1, auc = 1/4
    auc(Seq((1L, 1L), (1L, 0L), (2L, 0L))) shouldBe (1L, 2L, 1L, 0.25)
    // a NULL score or label drops the row before ranking
    val withNulls = Seq((Option(1L), Option(1L)), (Option(1L), Option(0L)),
      (Option(2L), Option(0L)), (Option.empty[Long], Option(1L)),
      (Option(9L), Option.empty[Long])).toDF("s", "y")
    Stats.rocAuc(withNulls, "s", "y")
      .as[(Long, Long, Long, Double)].collect().head shouldBe
      (1L, 2L, 1L, 0.25)
  }

  test("rocAuc is partition-order independent and matches a brute-force " +
      "pair count on a seeded random sample") {
    val rnd = new scala.util.Random(20260815L)
    val rows = Seq.fill(400)((rnd.nextInt(20).toLong,
      if (rnd.nextBoolean()) 1L else 0L))
    // brute force: AUC = (wins + ties/2) / (n_pos * n_neg)
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val wins2 = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    val expected = wins2.toDouble / (2L * pos.size * neg.size).toDouble
    def run(parts: Int): (Long, Long, Long, Double) =
      Stats.rocAuc(rows.toDF("s", "y").repartition(parts), "s", "y")
        .as[(Long, Long, Long, Double)].collect().head
    val (np, nn, u2, a) = run(1)
    np shouldBe pos.size.toLong
    nn shouldBe neg.size.toLong
    u2 shouldBe wins2
    a shouldBe expected
    run(7) shouldBe ((np, nn, u2, a))
  }

  test("cuped: hand-computed pooled theta, adjusted means, corr, and " +
      "variance reduction") {
    // pooled moments: x = [10,20,10,20], y = [20,30,25,35]
    // denx = 4*1000 - 60^2 = 400; num = 4*1750 - 60*110 = 400
    // -> theta = 1; deny = 4*3150 - 110^2 = 500
    val df = Seq(
      (true, 10L, 20L), (true, 20L, 30L),
      (false, 10L, 25L), (false, 20L, 35L)).toDF("v", "pre", "post")
    val corr = 400.0 / (math.sqrt(400.0) * math.sqrt(500.0))
    val byV = Stats.cuped(df, "v", "pre", "post")
      .as[(Boolean, Long, Double, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    byV(true)._3 shouldBe 25.0   // mean_post A
    byV(false)._3 shouldBe 30.0
    // both variants sit at the grand pre-mean, so adjustment is a
    // no-op for the MEANS while the per-unit variance still shrinks
    byV(true)._4 shouldBe 25.0
    byV(false)._4 shouldBe 30.0
    byV(true)._5 shouldBe 1.0    // theta
    byV(true)._6 shouldBe corr
    byV(true)._7 shouldBe corr * corr // 0.8: 80% variance reduction
  }

  test("cuped: constant pre-period covariate yields NULL theta/adj, " +
      "not a throw") {
    val df = Seq((true, 5L, 20L), (true, 5L, 30L), (false, 5L, 25L))
      .toDF("v", "pre", "post")
    val rows = Stats.cuped(df, "v", "pre", "post").collect()
    rows.foreach { r =>
      r.isNullAt(r.fieldIndex("theta")) shouldBe true
      r.isNullAt(r.fieldIndex("mean_adj")) shouldBe true
    }
  }

  test("calibrationBins: hand-computed bins, exact fixed-point means, " +
      "clamped top edge, ECE parts") {
    // scale 100, 5 bins (width 20 fp): scores 10,10 -> bin 0;
    // 50,55,59 -> bin 2; 95,100 -> bin 4 (100*5//100 = 5 clamps to 4)
    val df = Seq(
      (10L, 0L), (10L, 1L), (50L, 1L), (55L, 0L), (59L, 1L),
      (95L, 1L), (100L, 1L)).toDF("score_fp", "y")
    val out = Stats.calibrationBins(df, "score_fp", "y", bins = 5,
        scale = 100L)
      .as[(Int, Long, Long, Double, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    out.map(_._1) shouldBe Seq(0, 2, 4)
    val b0 = out(0)
    b0._2 shouldBe 2L
    b0._4 shouldBe 20.0 / 200.0 // mean_pred
    b0._5 shouldBe 0.5
    b0._6 shouldBe math.abs(0.5 - 20.0 / 200.0)
    b0._7 shouldBe (2.0 / 7.0) * math.abs(0.5 - 20.0 / 200.0)
    val b4 = out(2)
    b4._2 shouldBe 2L
    b4._4 shouldBe 195.0 / 200.0
    b4._5 shouldBe 1.0
    // total ECE (sum of parts) is small only if the model is honest
    out.map(_._7).sum should be > 0.0
  }

  test("ksTest integral guard raises on non-integral, NaN, and " +
      "infinite doubles instead of silently casting") {
    def run(vals: Seq[Double]) =
      Stats.ksTest(vals.toDF("x"), Seq(1.0, 2.0).toDF("x"), "x").collect()
    // integral-valued doubles pass
    noException should be thrownBy run(Seq(1.0, 2.0, 3.0))
    for (bad <- Seq(1.5, Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity))
      intercept[Exception] { run(Seq(1.0, bad)) }
        .getMessage should include("must be integral-valued")
  }

  test("ksTest/rocAuc domain guards: a high-cardinality value column " +
      "raises with the coarsening remedy before the single-task walk; " +
      "the coarsened column passes the same guard and equals the " +
      "unguarded op on the coarsened values") {
    val ref = (1L to 100L).map(Tuple1(_)).toDF("v")
    val cur = (51L to 150L).map(Tuple1(_)).toDF("v")
    intercept[Exception] {
      Stats.ksTest(ref, cur, "v", maxDomain = 16).collect()
    }.getMessage should include("coarsen the value")
    def tens(df: org.apache.spark.sql.DataFrame) =
      df.select(expr("v div 10").as("v")) // 16 pooled distinct values
    Stats.ksTest(tens(ref), tens(cur), "v", maxDomain = 16)
      .collect().toSeq shouldBe
      Stats.ksTest(tens(ref), tens(cur), "v").collect().toSeq
    val scored = (1L to 100L).map(i => (i, if (i > 50) 1L else 0L))
      .toDF("s", "y")
    intercept[Exception] {
      Stats.rocAuc(scored, "s", "y", maxDomain = 16).collect()
    }.getMessage should include("coarsen the score")
    def tensS(df: org.apache.spark.sql.DataFrame) =
      df.select(expr("s div 10").as("s"), col("y"))
    Stats.rocAuc(tensS(scored), "s", "y", maxDomain = 16)
      .collect().toSeq shouldBe
      Stats.rocAuc(tensS(scored), "s", "y").collect().toSeq
  }

  test("calibrationBins guards fire loudly") {
    an[IllegalArgumentException] should be thrownBy
      Stats.calibrationBins(Seq((1L, 1L)).toDF("score_fp", "y"),
        "score_fp", "y", bins = 1)
    intercept[Exception] {
      Stats.calibrationBins(Seq((101L, 1L)).toDF("score_fp", "y"),
        "score_fp", "y", bins = 5, scale = 100L).collect()
    }.getMessage should include("outside [0, 100]")
  }
}
