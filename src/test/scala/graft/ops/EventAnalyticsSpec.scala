package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpecBase

class EventAnalyticsSpec extends SparkSpecBase with Matchers {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // (user, ts, type) — deliberately out of insertion order to prove the
  // fold sorts; gap between stages is the funnel's 1-hour window.
  private lazy val funnelEvents = Seq(
    // u1: full clean funnel
    (1L, ts("2024-01-01 10:00:00"), "view"),
    (1L, ts("2024-01-01 10:30:00"), "click"),
    (1L, ts("2024-01-01 11:00:00"), "purchase"),
    // u2: click BEFORE the first view must not count; the later click
    // lands outside the 1h window -> depth 1
    (2L, ts("2024-01-01 09:00:00"), "click"),
    (2L, ts("2024-01-01 10:00:00"), "view"),
    (2L, ts("2024-01-01 11:30:00"), "click"),
    // u3: view then purchase with no click in between -> depth 1
    (3L, ts("2024-01-01 10:00:00"), "view"),
    (3L, ts("2024-01-01 10:10:00"), "purchase"),
    // u4: stage events but never the first stage -> not an entrant,
    // excluded from the output entirely
    (4L, ts("2024-01-01 10:00:00"), "click"),
    (4L, ts("2024-01-01 10:05:00"), "purchase"),
    // u5: two views; the SECOND view starts nothing new — first view
    // anchors, click within window of the FIRST view counts
    (5L, ts("2024-01-01 10:00:00"), "view"),
    (5L, ts("2024-01-01 10:40:00"), "view"),
    (5L, ts("2024-01-01 10:50:00"), "click"),
    // noise type is filtered before the shuffle
    (1L, ts("2024-01-01 10:15:00"), "error")
  ).toDF("user_id", "tt", "event_type")

  test("funnel: ordered stages, window cutoff, missing-stage semantics") {
    val out = EventAnalytics.funnel(funnelEvents, "user_id", "tt",
        "event_type", Seq("view", "click", "purchase"), maxGapSeconds = 3600)
      .orderBy("user_id")
      .select(col("user_id"), col("depth"),
        get(col("stage_ts"), lit(1)).as("t2"))
      .collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((1L, 3), (2L, 1), (3L, 1), (5L, 2)))
    // u5's click is anchored to the FIRST view (10:00), not the second
    assert(out.find(_.getLong(0) == 5L).get
      .getTimestamp(2) === ts("2024-01-01 10:50:00"))
  }

  test("funnel: boundary — exactly maxGap after the previous stage counts," +
      " same-instant does not") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"), // exactly +1h: inclusive
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:00:00"), "click")  // strictly-after fails
    ).toDF("user_id", "tt", "event_type")
    val out = EventAnalytics.funnel(ev, "user_id", "tt", "event_type",
        Seq("view", "click"), maxGapSeconds = 3600)
      .orderBy("user_id").select("depth").as[Int].collect()
    assert(out.toSeq === Seq(2, 1))
  }

  test("gapFillDaily: grid covers the span, carry-forward crosses gaps, " +
      "rolling mean divides by frame rows") {
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00"), 10.0),
      (1L, ts("2024-01-01 09:00:00"), 20.0),
      (1L, ts("2024-01-04 08:00:00"), 40.0)
    ).toDF("user_id", "tt", "value")
    val out = EventAnalytics.gapFillDaily(ev, "user_id", "tt", "value",
        windowDays = 2)
      .orderBy("day").collect()
    assert(out.map(_.getString(1)).toSeq ===
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
    assert(out.map(_.getLong(2)).toSeq === Seq(2L, 0L, 0L, 1L))
    // day_sum: 30, null, null, 40
    assert(out(0).getDouble(3) === 30.0 && out(1).isNullAt(3)
      && out(2).isNullAt(3) && out(3).getDouble(3) === 40.0)
    // carry: 30, 30, 30, 40
    assert(out.map(_.getDouble(4)).toSeq === Seq(30.0, 30.0, 30.0, 40.0))
    // roll2 (2-day trailing, gaps as 0): 30/1, 30/2, 0/2, 40/2
    assert(out.map(_.getDouble(5)).toSeq === Seq(30.0, 15.0, 0.0, 20.0))
  }

  test("sessionize: splits on gap > threshold, keeps gap == threshold, " +
      "numbers sessions 1-based per user") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:30:00")), // exactly 30m later: SAME session
      (1L, ts("2024-01-01 11:00:01")), // 30m01s gap: new session
      (1L, ts("2024-01-01 11:10:00")),
      (2L, ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "tt")
    val out = EventAnalytics.sessionize(ev, "user_id", "tt",
        gapSeconds = 1800)
      .orderBy("user_id", "session_idx").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 1L, 2L), (1L, 2L, 2L), (2L, 1L, 1L)))
    // session bounds are the member min/max
    assert(out(1).getLong(3) ===
      ts("2024-01-01 11:00:01").getTime * 1000)
    assert(out(1).getLong(4) ===
      ts("2024-01-01 11:10:00").getTime * 1000)
  }

  test("zScoreOutliers: flags exactly the |z|>threshold rows per key") {
    // key a: nine 10s and one 20 -> mean 11, var 9, std 3; z(20) = 3 ->
    // NOT flagged at 2.9? 3.0 is not > 3.0 by a hair either way, so use
    // threshold 2.5: z(20)=3 flagged, z(10)=-1/3 not. key b: constant ->
    // std 0, z is null/NaN-free? (0/0 -> NaN; abs(NaN)>t is false).
    val rows = (1L to 9L).map(i => (i, "a", 10.0)) ++ Seq((10L, "a", 20.0),
      (11L, "b", 5.0), (12L, "b", 5.0))
    val out = EventAnalytics.zScoreOutliers(rows.toDF("event_id", "key", "v"),
        "event_id", "key", "v", threshold = 2.5)
      .collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(10L))
    assert(out.head.getDouble(3) === 3.0)
  }

  test("transitionMatrix: hand-computed counts/probabilities; sequences " +
      "stay inside their key; the tie column totalizes equal timestamps") {
    // u1: a -> b -> a -> a   (a->b:1, b->a:1, a->a:1)
    // u2: b -> b             (b->b:1); no cross-user a->b transition
    // u1's last two events share ts=30: event_id 4 < 5 orders them
    val ev = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"),
      (1L, 30L, 4L, "a"), (1L, 30L, 5L, "a"),
      (2L, 10L, 3L, "b"), (2L, 40L, 6L, "b")
    ).toDF("user_id", "us", "event_id", "event_type")
    val out = EventAnalytics.transitionMatrix(ev, "user_id", "us",
        "event_id", "event_type")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("a", "a", 1L, 2L, 0.5),
      ("a", "b", 1L, 2L, 0.5),
      ("b", "a", 1L, 2L, 0.5),
      ("b", "b", 1L, 2L, 0.5)))
  }

  test("associationRules: hand-computed supports/confidences/lift; " +
      "duplicate items inside a basket count once; positive and " +
      "negative association both appear") {
    // baskets (by b): b1{x,y}, b2{x,y}, b3{x,z}, b4{y} -> N=4
    // n_x=3 n_y=3 n_z=1; xy=2, xz=1, yz=0 (pair absent entirely)
    val df = Seq(
      (1L, "x"), (1L, "y"), (1L, "x"), // dup x in b1: counts once
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"),
      (4L, "y")
    ).toDF("b", "item")
    val out = EventAnalytics.associationRules(df, Seq("b"), "item")
      .orderBy("item_a", "item_b")
      .as[(String, String, Long, Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(out.map(r => (r._1, r._2, r._5)) === Seq(
      ("x", "y", 2L), ("x", "z", 1L)))
    val xy = out.head
    assert(xy._3 === 3L && xy._4 === 3L && xy._6 === 4L)
    assert(xy._7 === 0.5)             // support 2/4
    assert(xy._8 === 2.0 / 3.0)       // conf x->y
    assert(xy._10 === 2.0 * 4 / 9.0)  // lift < 1: mild negative assoc
    val xz = out(1)
    assert(xz._10 === 1.0 * 4 / 3.0)  // lift > 1: z implies x
  }

  test("ewmaSmooth: hand-computed fold in ts order (input deliberately " +
      "shuffled), s1 seeds, nulls drop, partition-order independent") {
    // u1 values in TS order: 10, 20, 40 (inserted out of order)
    // s1=10; s2=0.75*10+0.25*20=12.5; s3=0.75*12.5+0.25*40=19.375
    val ev = Seq(
      (1L, 30L, 40.0), (1L, 10L, 10.0), (1L, 20L, 20.0),
      (2L, 5L, 7.0) // single event: ewma == the value
    ).toDF("user_id", "us", "value")
      .union(Seq((1L, 40L, Option.empty[Double]))
        .toDF("user_id", "us", "value")) // null value: excluded
    val out = EventAnalytics.ewmaSmooth(ev, "user_id", "us", "value", 0.25)
      .orderBy("user_id").as[(Long, Long, Double)].collect().toSeq
    assert(out === Seq((1L, 3L, 19.375), (2L, 1L, 7.0)))
    // the fold is per-key sequential: physical partitioning is irrelevant
    val re = EventAnalytics.ewmaSmooth(ev.repartition(7), "user_id",
        "us", "value", 0.25)
      .orderBy("user_id").as[(Long, Long, Double)].collect().toSeq
    assert(re === out)
  }

  test("retentionCohorts: cohort = first active period, offsets count " +
      "distinct users, rate vs offset-0 size, gaps stay absent") {
    // bucket = 10 us. u1 active periods {0,1,3}; u2 {0,1}; u3 {1,3}:
    // cohort 0 = {u1,u2}, cohort 1 = {u3}. Duplicate activity inside a
    // period (u1 twice in p0) must not double-count.
    val ev = Seq(
      (1L, 2L), (1L, 5L), (1L, 12L), (1L, 33L),
      (2L, 7L), (2L, 19L),
      (3L, 11L), (3L, 38L)
    ).toDF("user_id", "us")
    val out = EventAnalytics.retentionCohorts(ev, "user_id", "us",
        bucketUs = 10L)
      .orderBy("cohort", "period_offset")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (0L, 0L, 2L, 2L, 1.0),   // u1, u2
      (0L, 1L, 2L, 2L, 1.0),   // both return in p1
      (0L, 3L, 1L, 2L, 0.5),   // only u1 at offset 3; offset 2 absent
      (1L, 0L, 1L, 1L, 1.0),   // u3 cohort
      (1L, 2L, 1L, 1L, 1.0)))  // u3 returns at p3 = offset 2
  }

  test("decayedAgg: hand-computed half-life weights; future and " +
      "too-old events excluded; partition invariant") {
    // refDay 100, half-life 10: days 95/85/75/30 -> b = 0/1/2/7,
    // weights 1, 1/2, 1/4, 1/128; day 101 is future, day -300 is
    // b=40 >= maxHalfLives — both excluded
    val rows = Seq(
      ("a", 95L, 8L), ("a", 85L, 4L), ("a", 75L, 16L), ("a", 30L, 8L),
      ("a", 101L, 999L), ("a", -300L, 999L),
      ("b", 100L, 10L))
    def run(parts: Int) = EventAnalytics.decayedAgg(
        rows.toDF("k", "day", "v").repartition(parts),
        "k", "day", "v", refDay = 100L, halfLifeDays = 10L)
      .orderBy("k").as[(String, Long, Double, Double)].collect().toSeq
    val out = run(1)
    out shouldBe Seq(
      ("a", 4L, 1.0 + 0.5 + 0.25 + 1.0 / 128, 8.0 + 2.0 + 4.0 + 8.0 / 128),
      ("b", 1L, 1.0, 10.0))
    run(7) shouldBe out // exact integer sums: bit-identical
  }

  test("rateSpikes: hand-computed trailing-window lifts — burst over a " +
      "steady baseline, absent days count ZERO (sparse key not flat), " +
      "fresh key bounded by smoothing") {
    // key u: 1/day on days 1..7, burst of 8 on day 8
    // key v: 1 on day 1 and day 8 only (days 2..7 absent -> count 0)
    val rows = (1L to 7L).map(d => ("u", d)) ++
      Seq.fill(8)(("u", 8L)) ++ Seq(("v", 1L), ("v", 8L))
    val out = EventAnalytics.rateSpikes(
        rows.toDF("k", "day"), "k", "day", windowDays = 7)
      .as[(String, Long, Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    out(("u", 8L)) shouldBe ((8L, 7L, 9.0 * 7 / 14))  // 4.5x burst
    out(("u", 1L)) shouldBe ((1L, 0L, 2.0 * 7 / 7))   // fresh, bounded
    out(("u", 5L)) shouldBe ((1L, 4L, 2.0 * 7 / 11))  // steady ~flat
    // absent days 2..7 contribute 0, not "no baseline": sum_prev = 1
    out(("v", 8L)) shouldBe ((1L, 1L, 2.0 * 7 / 8))
    intercept[IllegalArgumentException] {
      EventAnalytics.rateSpikes(rows.toDF("k", "day"), "k", "day", 0)
    }.getMessage should include("windowDays")
  }

  test("maxEventsPerKey guard: a hot key fails LOUDLY with its id and " +
      "count in the message; under-cap runs are byte-identical to " +
      "unguarded ones — funnel, ewmaSmooth, transitionMatrix") {
    // key 777 is hot (40 events), keys 1..3 are quiet (3 each)
    val hot = (0 until 40).map(i =>
      (777L, ts(f"2024-01-01 10:${i % 60}%02d:00"), i.toLong, "view"))
    val quiet = (1L to 3L).flatMap(u => Seq(
      (u, ts("2024-01-01 10:00:00"), u * 10 + 1, "view"),
      (u, ts("2024-01-01 10:05:00"), u * 10 + 2, "click"),
      (u, ts("2024-01-01 10:10:00"), u * 10 + 3, "purchase")))
    val ev = (hot ++ quiet).toDF("user_id", "tt", "event_id", "event_type")
      .withColumn("v", col("event_id").cast("double"))

    def trips(f: => Array[_]): String = {
      val e = intercept[Exception](f)
      val m = e.getMessage + Option(e.getCause).map(_.getMessage).mkString
      m should include("777")
      m should include("40")
      m should include("maxEventsPerKey=10")
      m
    }
    trips(EventAnalytics.funnel(ev, "user_id", "tt", "event_type",
      Seq("view", "click", "purchase"), 3600, Some(10L)).collect())
    trips(EventAnalytics.ewmaSmooth(ev, "user_id", "tt", "v", 0.25,
      Some(10L)).collect())
    trips(EventAnalytics.transitionMatrix(ev, "user_id", "tt", "event_id",
      "event_type", Some(10L)).collect())

    // a cap the data respects changes nothing — guarded == unguarded
    EventAnalytics.ewmaSmooth(ev, "user_id", "tt", "v", 0.25, Some(64L))
        .orderBy("user_id").collect() shouldBe
      EventAnalytics.ewmaSmooth(ev, "user_id", "tt", "v", 0.25)
        .orderBy("user_id").collect()
    EventAnalytics.transitionMatrix(ev, "user_id", "tt", "event_id",
        "event_type", Some(64L)).orderBy("from_type", "to_type")
        .collect() shouldBe
      EventAnalytics.transitionMatrix(ev, "user_id", "tt", "event_id",
        "event_type").orderBy("from_type", "to_type").collect()
  }

  test("attribution matches a brute-force per-conversion model on a " +
      "seeded random log, partition-invariant") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val rnd = new scala.util.Random(53)
    val types = Vector("view", "click", "purchase", "error")
    val rows = (0 until 600).map { _ =>
      (rnd.nextInt(12).toLong, rnd.nextInt(5000).toLong * 10L,
        types(rnd.nextInt(types.size))) }
    val look = 8000L
    val touches = Set("click", "view")
    val model = rows.filter(_._3 == "purchase").map { case (u, ts, _) =>
      val win = rows.filter(r => r._1 == u && touches(r._3) &&
        r._2 >= ts - look && r._2 <= ts)
      val pairs = win.map(r => (r._2, r._3))
      (u, ts,
        pairs.sorted.headOption.map(_._2), pairs.sorted.headOption.map(_._1),
        pairs.sorted.lastOption.map(_._2), pairs.sorted.lastOption.map(_._1),
        win.size.toLong)
    }.sorted
    def run(parts: Int) = EventAnalytics.attribution(
        rows.toDF("user_id", "us", "event_type").repartition(parts)
          .select(col("user_id"), timestamp_micros(col("us")).as("tt"),
            col("event_type")),
        "user_id", "tt", "event_type", Seq("click", "view"), "purchase",
        lookbackUs = look)
      .select("user_id", "conv_us", "first_channel", "first_us",
        "last_channel", "last_us", "n_touches")
      .as[(Long, Long, Option[String], Option[Long], Option[String],
        Option[Long], Long)]
      .collect().toSeq
      .map(r => (r._1, r._2, r._3, r._4, r._5, r._6, r._7)).sorted
    run(1) shouldBe model
    run(13) shouldBe model
  }

  test("attribution: first/last touch in the lookback window, boundary " +
      "inclusion, equal-ts tie-break, and the no-touch NULL case") {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    // user 1: view@100, click@100 (tie), view@160, purchase@150,
    //         purchase@400 (lookback 200: only view@160 too old? 400-200
    //         = 200 <= ... window [200, 400] excludes 160 -> NULL)
    // user 2: view exactly at lookback edge: touch@200, purchase@400
    //         (window [200, 400] INCLUDES the boundary touch)
    val rows = Seq(
      (1L, 100L, "view"), (1L, 100L, "click"), (1L, 150L, "purchase"),
      (1L, 160L, "view"), (1L, 400L, "purchase"),
      (2L, 200L, "view"), (2L, 400L, "purchase"))
    val ev = rows.toDF("user_id", "us", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("tt"),
        col("event_type"))
    val out = EventAnalytics.attribution(ev, "user_id", "tt",
        "event_type", Seq("click", "view"), "purchase", lookbackUs = 200L)
      .select("user_id", "conv_us", "first_channel", "last_channel",
        "n_touches")
      .as[(Long, Long, Option[String], Option[String], Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    out shouldBe Seq(
      // tie at 100: min struct -> 'click', max struct -> 'view'
      (1L, 150L, Some("click"), Some("view"), 2L),
      (1L, 400L, None, None, 0L),
      (2L, 400L, Some("view"), Some("view"), 1L))
  }

  test("interpolateDaily: hand-computed straight lines across interior " +
      "gaps, same-day pre-aggregation, independent keys, observed " +
      "endpoints, exact IEEE expectation order") {
    def run(rows: Seq[(String, Long, Long)]) =
      EventAnalytics.interpolateDaily(rows.toDF("k", "d", "v"),
          "k", "d", "v")
        .as[(String, Long, Option[Long], Double)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
    // key a: observed (1, 10), (4, 40): days 2 and 3 interpolate on
    // the 10 -> 40 line; the expectation is written with the SAME
    // operation order as the op, so the compare is exact even where
    // 1/3 is inexact
    def line(vp: Double, vn: Double, d: Long, dp: Long, dn: Long) =
      vp + (vn - vp) * ((d - dp).toDouble / (dn - dp).toDouble)
    run(Seq(("a", 1L, 10L), ("a", 4L, 40L))) shouldBe Seq(
      ("a", 1L, Some(10L), 10.0),
      ("a", 2L, None, line(10, 40, 2, 1, 4)),
      ("a", 3L, None, line(10, 40, 3, 1, 4)),
      ("a", 4L, Some(40L), 40.0))
    // same-day rows pre-sum; keys interpolate independently (b's gap
    // uses b's neighbors only); single-observation keys emit one row
    run(Seq(("a", 1L, 4L), ("a", 1L, 6L), ("a", 3L, 30L),
      ("b", 5L, 100L), ("b", 7L, 0L), ("c", 9L, 9L))) shouldBe Seq(
      ("a", 1L, Some(10L), 10.0),
      ("a", 2L, None, line(10, 30, 2, 1, 3)),
      ("a", 3L, Some(30L), 30.0),
      ("b", 5L, Some(100L), 100.0),
      ("b", 6L, None, line(100, 0, 6, 5, 7)),
      ("b", 7L, Some(0L), 0.0),
      ("c", 9L, Some(9L), 9.0))
  }

  test("giniByGroup: hand-computed concentration — uniform 0, fully " +
      "concentrated (n-1)/n, textbook middle case, per-key pre-sum, " +
      "zero-mass NULL, tie invariance") {
    def gini(rows: Seq[(String, Long, Long)]) =
      EventAnalytics.giniByGroup(rows.toDF("g", "k", "v"), "g", "k", "v")
        .as[(String, Long, Long, Option[Double])]
        .collect().sortBy(_._1).toSeq
    gini(Seq(
      // group u: uniform 5,5,5 -> G = 0
      ("u", 1L, 5L), ("u", 2L, 5L), ("u", 3L, 5L),
      // group c: one key holds all 12 -> sorted 0,0,12:
      // sum_ix = 3*12 = 36, G = (72 - 4*12)/(3*12) = 24/36 = 2/3
      ("c", 1L, 0L), ("c", 2L, 0L), ("c", 3L, 12L),
      // group m: masses 1,2,3,4 -> sum_ix = 1+4+9+16 = 30,
      // G = (60 - 5*10)/(4*10) = 10/40 = 0.25
      ("m", 1L, 1L), ("m", 2L, 2L), ("m", 3L, 3L), ("m", 4L, 4L),
      // group z: all-zero mass -> gini NULL
      ("z", 1L, 0L), ("z", 2L, 0L))) shouldBe Seq(
      ("c", 3L, 12L, Some(2.0 / 3.0)),
      ("m", 4L, 10L, Some(0.25)),
      ("u", 3L, 15L, Some(0.0)),
      ("z", 2L, 0L, None))
    // per-key PRE-SUM: key 1 split across two event rows equals the
    // one-row equivalent
    gini(Seq(("s", 1L, 3L), ("s", 1L, 1L), ("s", 2L, 2L))) shouldBe
      gini(Seq(("s", 1L, 4L), ("s", 2L, 2L)))
    // tie invariance: equal masses on distinct keys — the index-
    // weighted sum over a tied run is order-free, G identical across
    // partitionings
    val tied = Seq(("t", 1L, 7L), ("t", 2L, 7L), ("t", 3L, 7L),
      ("t", 4L, 1L))
    val a = EventAnalytics.giniByGroup(
      tied.toDF("g", "k", "v").repartition(1), "g", "k", "v")
      .as[(String, Long, Long, Option[Double])].collect().head
    val b = EventAnalytics.giniByGroup(
      tied.toDF("g", "k", "v").repartition(7), "g", "k", "v")
      .as[(String, Long, Long, Option[Double])].collect().head
    a shouldBe b
  }

  test("seasonalDecompose: pure weekday pattern — interior residuals " +
      "exactly zero, truncated edges hand-computed, gaps shrink the " +
      "trend window honestly") {
    import org.apache.spark.sql.functions._
    // two full weeks, v = 10 * weekday: interior trend = 30 (each
    // weekday once in the +-3 window), seasonal(wd) = 10wd - 30,
    // so interior resid = 0 EXACTLY
    val df = (0L to 13L).map(d => ("k", d, 10L * (d % 7)))
      .toDF("key", "day", "v")
    val out = EventAnalytics.seasonalDecompose(df, "key", "day", "v")
      .as[(String, Long, Long, Double, Double, Double)]
      .collect().map(r => r._2 -> r).toMap
    (3L to 10L).foreach { d => out(d)._6 shouldBe 0.0 }
    // day 0 window covers days 0..3: trend 15; seasonal(0) = -30
    out(0L)._4 shouldBe 15.0
    out(0L)._6 shouldBe (0.0 - 15.0) - (0.0 - 30.0)
    // day 13 (wd 6) window 10..13: trend 45; seasonal(6) = +30
    out(13L)._4 shouldBe 45.0
    out(13L)._6 shouldBe (60.0 - 45.0) - 30.0
    // identity holds row-for-row by construction
    out.values.foreach { r =>
      (r._3.toDouble - r._4) - r._5 shouldBe r._6 }
    // a missing day shrinks the window instead of inventing a zero
    val gaps = Seq(("k", 0L, 10L), ("k", 1L, 20L), ("k", 2L, 30L),
        ("k", 4L, 50L)).toDF("key", "day", "v")
    val g1 = EventAnalytics.seasonalDecompose(gaps, "key", "day", "v")
      .as[(String, Long, Long, Double, Double, Double)]
      .collect().map(r => r._2 -> r).toMap
    g1(1L)._4 shouldBe (10.0 + 20.0 + 30.0 + 50.0) / 4.0
  }
}
