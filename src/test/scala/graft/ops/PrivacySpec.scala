package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpecBase
import graft.functions.LongHashes

/** The dyadic geometric mechanism: bit-level model parity, mechanism
  * laws (clipping, sensitivity bookkeeping), and the determinism the
  * release contract promises. */
class PrivacySpec extends SparkSpecBase with Matchers {
  import spark.implicits._

  private def modelNoise(seed: Long): Long = {
    def g(z: Long): Long = {
      val zm = z & ((1L << 62) - 1)
      java.lang.Long.bitCount(zm ^ (zm + 1)) - 1L
    }
    g(LongHashes.splitmix64Of(seed)) -
      g(LongHashes.splitmix64Of(seed ^ 0x9e3779b97f4a7c15L))
  }

  test("geometricNoise == the trailing-ones model bit for bit, " +
      "including the sign and mask edges") {
    val rnd = new scala.util.Random(7)
    val seeds = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue) ++
      Seq.fill(200)(rnd.nextLong())
    val got = seeds.toDF("s")
      .select(col("s"), Privacy.geometricNoise(col("s")).as("x"))
      .as[(Long, Long)].collect().toMap
    seeds.foreach { s =>
      withClue(s"seed $s: ") { got(s) shouldBe modelNoise(s) }
    }
  }

  test("noise distribution sanity over 4096 seeds: integer, symmetric " +
      "to a few percent, variance ~4 (two Geometric(1/2) draws)") {
    val xs = (0L until 4096L).toDF("s")
      .select(Privacy.geometricNoise(col("s")).as("x"))
      .as[Long].collect()
    val mean = xs.sum.toDouble / xs.length
    val varc = xs.map(x => (x - mean) * (x - mean)).sum / xs.length
    withClue(s"mean $mean variance $varc: ") {
      math.abs(mean) should be < 0.15
      varc should (be > 3.0 and be < 5.0)
    }
    // pmf ∝ 2^-|x|: zero is the mode, |x| = 1 next
    val hist = xs.groupBy(identity).view.mapValues(_.length).toMap
    hist(0L) should be > hist(1L)
    hist(1L) should be > hist.getOrElse(3L, 0)
  }

  test("noisyCount: per-user contributions clip at the cap; cap=1 is " +
      "the distinct-user count; deterministic across partitionings; " +
      "the salt moves the noise") {
    // user 1 has 5 rows in g1 (clips), user 2 has 1; g2 has one user
    val rows = Seq.fill(5)(("g1", 1L)) ++ Seq(("g1", 2L), ("g2", 3L),
      ("g2", 3L))
    val df = rows.toDF("g", "u")
    val out = Privacy.noisyCount(df, "g", "u", cap = 3, salt = 99L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    out("g1")._2 shouldBe 2L // users
    out("g1")._3 shouldBe 4L // 3 (clipped from 5) + 1
    out("g2")._3 shouldBe 2L
    out.values.foreach { case (_, _, cApped, noise, noisy) =>
      noisy shouldBe cApped + noise
    }
    // cap=1 == distinct users
    val dc = Privacy.noisyCount(df, "g", "u", cap = 1, salt = 99L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    dc shouldBe Map("g1" -> 2L, "g2" -> 1L)
    // partitioning-invariant
    val re = Privacy.noisyCount(df.repartition(7), "g", "u", 3, 99L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    re shouldBe out
    // a different salt re-draws at least one group's noise
    val other = Privacy.noisyCount(df, "g", "u", 3, 100L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    val same = out.view.mapValues(_._4).toMap
    withClue(s"salt 99 -> $same, salt 100 -> $other: ") {
      other should not be same
    }
    // null users carry no privacy unit
    val withNull = rows.map { case (g, u) => (g, Option(u)) } :+
      (("g1", Option.empty[Long]))
    val nn = Privacy.noisyCount(withNull.toDF("g", "u"), "g", "u", 3, 99L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    nn shouldBe out
  }

  test("noisySum: clip -> quantize -> noise composes exactly; " +
      "unit=cap is the 0/1 materiality release; audit math holds; " +
      "deterministic across partitionings") {
    // user 1: 700 + 900 = 1600, clips at 1500; user 2: 200;
    // user 3 (g2): 3000 clips at 1500
    val df = Seq(("g1", 1L, 700L), ("g1", 1L, 900L), ("g1", 2L, 200L),
      ("g2", 3L, 3000L)).toDF("g", "u", "v")
    val out = Privacy.noisySum(df, "g", "u", "v",
        userCap = 1500L, unit = 500L, salt = 7L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // g1: s_c = 1500 + 200; q_u = (3000+500)//1000=3, (400+500)//1000=0
    out("g1")._2 shouldBe 2L
    out("g1")._3 shouldBe 1700L
    out("g1")._4 shouldBe 3L
    // g2: clipped 1500 -> 3 units
    out("g2")._3 shouldBe 1500L
    out("g2")._4 shouldBe 3L
    out.values.foreach { case (_, _, _, units, noise, released) =>
      released shouldBe (units + noise) * 500L
    }
    // half rounds UP: 250 is exactly half a 500 unit
    val half = Privacy.noisySum(Seq(("g", 1L, 250L)).toDF("g", "u", "v"),
        "g", "u", "v", 1500L, 500L, 7L)
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    half._4 shouldBe 1L
    // unit == cap: one unit iff the clipped total rounds to the cap
    val mat = Privacy.noisySum(df, "g", "u", "v", 1500L, 1500L, 7L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    mat shouldBe Map("g1" -> 1L, "g2" -> 1L)
    // partitioning-invariant
    val re = Privacy.noisySum(df.repartition(5), "g", "u", "v",
        1500L, 500L, 7L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    re shouldBe out
    // the unit folds into the seed: same salt, different unit -> the
    // count released alongside draws independent noise
    val cnt = Privacy.noisyCount(df, "g", "u", 1, 7L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    withClue(s"sum noise ${out.view.mapValues(_._5).toMap} vs count " +
        s"noise $cnt: ") {
      out.view.mapValues(_._5).toMap should not be cnt
    }
  }

  test("noisySum loud guards: negative value raises per-row naming " +
      "the column; non-integral value rejected at plan time; unit " +
      "bounds checked") {
    val neg = Seq(("g", 1L, -3L)).toDF("g", "u", "v")
    val e1 = intercept[Exception] {
      Privacy.noisySum(neg, "g", "u", "v", 100L, 10L, 0L).collect()
    }
    e1.getMessage should include("negative value in 'v'")
    val e2 = intercept[IllegalArgumentException] {
      Privacy.noisySum(Seq(("g", 1L, 1.5)).toDF("g", "u", "v"),
        "g", "u", "v", 100L, 10L, 0L)
    }
    e2.getMessage should include("must be integral")
    val e3 = intercept[IllegalArgumentException] {
      Privacy.noisySum(Seq(("g", 1L, 1L)).toDF("g", "u", "v"),
        "g", "u", "v", 100L, 200L, 0L)
    }
    e3.getMessage should include("unit must be in [1, userCap]")
    // caps past MaxValue/3 would wrap the long quantizer's
    // s_c * 2 + unit (which reaches 3·userCap) — rejected, INCLUDING
    // the (MaxValue/3, MaxValue/2] window the old /2 guard let through
    val e4 = intercept[IllegalArgumentException] {
      Privacy.noisySum(Seq(("g", 1L, 1L)).toDF("g", "u", "v"),
        "g", "u", "v", Long.MaxValue, 1L, 0L)
    }
    e4.getMessage should include("userCap must be in [1, Long.MaxValue/3]")
    val e5 = intercept[IllegalArgumentException] {
      Privacy.noisySum(Seq(("g", 1L, 1L)).toDF("g", "u", "v"),
        "g", "u", "v", Long.MaxValue / 2, 1L, 0L)
    }
    e5.getMessage should include("userCap must be in [1, Long.MaxValue/3]")
    // the largest admissible cap must NOT wrap: q_u at s_c = unit =
    // cap stays positive (3·cap <= Long.MaxValue by the guard)
    val cap = Long.MaxValue / 3
    val ok = Privacy.noisySum(Seq(("g", 1L, cap)).toDF("g", "u", "v"),
      "g", "u", "v", cap, cap, 0L)
    ok.select(col("units_true")).as[Long].collect() shouldBe Array(1L)
  }

  test("boundGroupParticipation caps each user at maxGroups groups, " +
      "deterministically, and makes the composed release-level " +
      "guarantee claimable") {
    // u1 spans 4 groups, u2 spans 2, u3 spans 1 — cap at 2
    val df = Seq(
      ("a", 1L, 10L), ("b", 1L, 11L), ("c", 1L, 12L), ("d", 1L, 13L),
      ("a", 2L, 20L), ("b", 2L, 21L),
      ("c", 3L, 30L),
      ("a", 1L, 14L) // second row in a kept-or-dropped group rides along
    ).toDF("g", "u", "v")
    val bounded = Privacy.boundGroupParticipation(df, "g", "u", 2)
    val perUser = bounded.select("u", "g").distinct()
      .groupBy("u").agg(count(lit(1)).as("ng"))
      .as[(Long, Long)].collect().toMap
    perUser(1L) shouldBe 2L
    perUser(2L) shouldBe 2L
    perUser(3L) shouldBe 1L
    // a kept (user, group) keeps ALL its rows
    val keptGroups = bounded.where(col("u") === 1L).select("g")
      .distinct().as[String].collect().toSet
    bounded.where(col("u") === 1L && col("g").isin(keptGroups.toSeq: _*))
      .count() shouldBe df.where(col("u") === 1L &&
        col("g").isin(keptGroups.toSeq: _*)).count()
    // determinism: the pick is a pure function of the data
    val again = Privacy.boundGroupParticipation(df, "g", "u", 2)
      .select("g", "u", "v").as[(String, Long, Long)].collect().sorted
    bounded.select("g", "u", "v").as[(String, Long, Long)].collect()
      .sorted shouldBe again
    // under-cap users are untouched entirely
    bounded.where(col("u") === 3L).count() shouldBe 1L
    // loud guards
    val e1 = intercept[IllegalArgumentException] {
      Privacy.boundGroupParticipation(df, "g", "u", 0)
    }
    e1.getMessage should include("maxGroups must be >= 1")
    val e2 = intercept[IllegalArgumentException] {
      Privacy.boundGroupParticipation(
        Seq((1L, 2L)).toDF("g", "u"), "g", "u", 1)
    }
    e2.getMessage should include("must be STRING")
    val e3 = intercept[IllegalArgumentException] {
      Privacy.boundGroupParticipation(
        Seq(("a", "u1")).toDF("g", "u"), "g", "u", 1)
    }
    e3.getMessage should include("must be integral")
  }

  test("a NULL group key raises at runtime naming the column — no " +
      "silent NULL-noise release") {
    val df = Seq((Option("g"), 1L), (Option.empty[String], 2L))
      .toDF("g", "u")
    val e1 = intercept[Exception] {
      Privacy.noisyCount(df, "g", "u", 1, 0L).collect()
    }
    e1.getMessage should include("contains NULL")
    val dfv = Seq((Option("g"), 1L, 5L), (Option.empty[String], 2L, 5L))
      .toDF("g", "u", "v")
    val e2 = intercept[Exception] {
      Privacy.noisySum(dfv, "g", "u", "v", 100L, 10L, 0L).collect()
    }
    e2.getMessage should include("contains NULL")
  }

  test("noisyCount loud guards: non-string group, cap < 1") {
    val df = Seq((1L, 2L)).toDF("g", "u")
    val e1 = intercept[IllegalArgumentException] {
      Privacy.noisyCount(df, "g", "u", 1, 0L)
    }
    e1.getMessage should include("must be STRING")
    val e2 = intercept[IllegalArgumentException] {
      Privacy.noisyCount(Seq(("a", 2L)).toDF("g", "u"), "g", "u", 0, 0L)
    }
    e2.getMessage should include("cap must be >= 1")
  }
}
