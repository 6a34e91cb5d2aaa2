package graft.ops

import org.apache.spark.sql.functions.col
import org.scalatest.matchers.should.Matchers

import graft.SparkSpecBase

class AsOfJoinSpec extends SparkSpecBase with Matchers {
  import spark.implicits._

  // quotes: (key, ts, price); trades: (key, ts, qty)
  private def quotes = Seq(
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
    ("b", 15L, 9.0)
  ).toDF("k", "ts", "price")

  private def trades = Seq(
    ("a", 5L, 100L),  // before any quote -> null
    ("a", 20L, 200L), // exactly at a quote -> that quote (2.0)
    ("a", 25L, 300L), // between -> latest earlier (2.0)
    ("a", 99L, 400L), // after all -> latest (3.0)
    ("b", 14L, 500L), // before b's only quote -> null
    ("c", 50L, 600L)  // key with no quotes at all -> null
  ).toDF("k", "ts", "qty")

  test("asOf picks the greatest right ts <= left ts per key") {
    val joined = AsOfJoin.asOf(trades, quotes, "k", "ts")
      .select("k", "ts", "qty", "right_price", "right_ts")
      .as[(String, Long, Long, Option[Double], Option[Long])]
      .collect().sortBy(r => (r._1, r._2))
    joined shouldBe Array(
      ("a", 5L, 100L, None, None),
      ("a", 20L, 200L, Some(2.0), Some(20L)),
      ("a", 25L, 300L, Some(2.0), Some(20L)),
      ("a", 99L, 400L, Some(3.0), Some(30L)),
      ("b", 14L, 500L, None, None),
      ("c", 50L, 600L, None, None))
  }

  test("tolerance voids matches older than the lookback window") {
    val joined = AsOfJoin.asOf(trades, quotes, "k", "ts", tolerance = Some(10L))
      .select("k", "ts", "right_price").as[(String, Long, Option[Double])]
      .collect().sortBy(r => (r._1, r._2))
    // trade at 99 matched quote at 30 -> 69 > 10 stale -> voided
    joined.find(r => r._1 == "a" && r._2 == 99L).get._3 shouldBe None
    // trade at 25 matched quote at 20 -> age 5 <= 10 -> kept
    joined.find(r => r._1 == "a" && r._2 == 25L).get._3 shouldBe Some(2.0)
  }

  test("left column colliding with a right_ output name is rejected") {
    val badLeft = trades.withColumnRenamed("qty", "right_price")
    an[IllegalArgumentException] should be thrownBy
      AsOfJoin.asOf(badLeft, quotes, "k", "ts")
  }

  test("plan: one shuffle-sort, no per-key quadratics (no cartesian/BNLJ)") {
    val p = AsOfJoin.asOf(trades, quotes, "k", "ts")
      .queryExecution.executedPlan.toString
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include("Window")
  }

  test("bucketedAsOf equals asOf on a deliberately hot key") {
    // one hot key with many rows spanning many buckets, plus ordinary
    // keys; right rows are sparse so most buckets need a carried seed
    val rng = new scala.util.Random(7)
    val hotLeft = (0 until 2000).map(i => ("hot", rng.nextInt(10000).toLong, i.toLong))
    val hotRight = (0 until 40).map(i => ("hot", (i * 250 + 3).toLong, i * 1.5))
    val coldLeft = (0 until 50).map(i => ("c" + i % 5, (i * 7).toLong, (1000 + i).toLong))
    val coldRight = (0 until 10).map(i => ("c" + i % 5, (i * 11).toLong, -i.toDouble))
    val l = (hotLeft ++ coldLeft).toDF("k", "ts", "qty")
    val r = (hotRight ++ coldRight).toDF("k", "ts", "price")
      .dropDuplicates("k", "ts") // contract: unique (key, ts)

    val cols = AsOfJoin.asOf(l, r, "k", "ts").columns.toIndexedSeq
    val plain = AsOfJoin.asOf(l, r, "k", "ts")
      .orderBy("k", "ts", "qty").collect()
    for (width <- Seq(100L, 333L, 1000000L)) { // incl. one bucket total
      val bucketed = AsOfJoin.bucketedAsOf(l, r, "k", "ts", bucketWidth = width)
        .select(cols.map(col): _*)
        .orderBy("k", "ts", "qty").collect()
      bucketed shouldBe plain
    }
  }

  test("bucketedAsOf: seeds cross empty buckets and negative timestamps") {
    val l = Seq(("a", -95L, 1L), ("a", 500L, 2L), ("a", 999L, 3L))
      .toDF("k", "ts", "qty")
    val r = Seq(("a", -100L, 7.0)).toDF("k", "ts", "price")
    // bucket width 10: the only right row sits ~60 buckets before the
    // last left row — the seed must carry across all the empty buckets
    val out = AsOfJoin.bucketedAsOf(l, r, "k", "ts", bucketWidth = 10L)
      .select("k", "ts", "qty", "right_price", "right_ts")
      .as[(String, Long, Long, Option[Double], Option[Long])]
      .collect().sortBy(_._2)
    out.map(_._4) shouldBe Array(Some(7.0), Some(7.0), Some(7.0))
    out.map(_._5) shouldBe Array(Some(-100L), Some(-100L), Some(-100L))
  }

  test("bucketedAsOf honors tolerance like asOf") {
    val plain = AsOfJoin.asOf(trades, quotes, "k", "ts", tolerance = Some(10L))
      .select("k", "ts", "right_price").as[(String, Long, Option[Double])]
      .collect().sortBy(r => (r._1, r._2))
    val bucketed = AsOfJoin.bucketedAsOf(trades, quotes, "k", "ts",
        bucketWidth = 7L, tolerance = Some(10L))
      .select("k", "ts", "right_price").as[(String, Long, Option[Double])]
      .collect().sortBy(r => (r._1, r._2))
    bucketed shouldBe plain
  }

  test("bucketedAsOf: tolerance voids stale cross-bucket seeds exactly") {
    // The seed injected into a bucket keeps its ORIGINAL timestamp
    // (AsOfJoin.scala bucketedAsOf scaladoc), so the tolerance guard in
    // asOfImpl must age it from the real right ts, not the bucket edge.
    // Deterministic corpus: one right row per 1000 ts on key "hot", left
    // rows placed so their only candidate is a carried seed whose age
    // straddles the tolerance on both sides.
    val l = Seq(
      ("hot", 1105L, 1L), // b11, seed ts=1000 (b10), age 105 <= 200 -> kept
      ("hot", 1199L, 2L), // b11, age 199 <= 200 -> kept (edge-1)
      ("hot", 1200L, 3L), // b12, age 200 <= 200 -> kept (edge)
      ("hot", 1201L, 4L), // b12, age 201 >  200 -> VOIDED (edge+1)
      ("hot", 3500L, 5L), // b35, seed ts=3000 (b30), age 500 -> VOIDED
      ("hot", 3150L, 6L)  // b31, age 150 <= 200 -> kept
    ).toDF("k", "ts", "qty")
    val r = Seq(("hot", 1000L, 10.0), ("hot", 3000L, 30.0))
      .toDF("k", "ts", "price")
    // bucketWidth 100: every left row sits in a LATER bucket than its
    // matching right row, so every match flows through a carried seed.
    val out = AsOfJoin.bucketedAsOf(l, r, "k", "ts",
        bucketWidth = 100L, tolerance = Some(200L))
      .select("qty", "right_price", "right_ts")
      .as[(Long, Option[Double], Option[Long])]
      .collect().sortBy(_._1)
    out shouldBe Array(
      (1L, Some(10.0), Some(1000L)),
      (2L, Some(10.0), Some(1000L)),
      (3L, Some(10.0), Some(1000L)),
      (4L, None, None),
      (5L, None, None),
      (6L, Some(30.0), Some(3000L)))
  }

  test("bucketedAsOf + tolerance matches the brute-force model on a hot key") {
    // Randomized composition check: hot key spanning many buckets with
    // sparse rights (most matches ride a seed), a tolerance tight enough
    // to void a good fraction, vs the same in-memory model used for asOf.
    val rng = new scala.util.Random(23)
    val lRows = Vector.fill(1500)(("hot", rng.nextInt(20000).toLong, rng.nextLong())) ++
      Vector.fill(60)(("c" + rng.nextInt(3), rng.nextInt(200).toLong, rng.nextLong()))
    val rRows = (Vector.fill(25)(("hot", rng.nextInt(20000).toLong, rng.nextDouble())) ++
      Vector.fill(15)(("c" + rng.nextInt(3), rng.nextInt(200).toLong, rng.nextDouble())))
      .groupBy(x => (x._1, x._2)).map(_._2.head).toVector // unique (key, ts)
    val tol = 400L
    val got = AsOfJoin.bucketedAsOf(lRows.toDF("k", "ts", "qty"),
        rRows.toDF("k", "ts", "price"),
        "k", "ts", bucketWidth = 250L, tolerance = Some(tol))
      .select("k", "ts", "qty", "right_ts", "right_price")
      .as[(String, Long, Long, Option[Long], Option[Double])]
      .collect().sortBy(x => (x._1, x._2, x._3))
    val want = lRows.map { case (k, ts, qty) =>
      val m = rRows.filter(x => x._1 == k && x._2 <= ts && x._2 >= ts - tol)
        .sortBy(_._2).lastOption
      (k, ts, qty, m.map(_._2), m.map(_._3))
    }.sortBy(x => (x._1, x._2, x._3))
    got.toSeq shouldBe want
    // the tolerance actually bit: some matches voided, some kept
    got.count(_._4.isEmpty) should be > 0
    got.count(_._4.nonEmpty) should be > 0
  }

  test("asOf matches a brute-force in-memory model on random data") {
    val rng = new scala.util.Random(11)
    val keys = Vector("a", "b", "c", "d")
    val lRows = Vector.fill(300)((keys(rng.nextInt(4)), rng.nextInt(200).toLong,
      rng.nextLong()))
    val rRows = Vector.fill(80)((keys(rng.nextInt(4)), rng.nextInt(200).toLong,
      rng.nextDouble()))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toVector // unique (key, ts)
    val l = lRows.toDF("k", "ts", "qty")
    val r = rRows.toDF("k", "ts", "price")

    val got = AsOfJoin.asOf(l, r, "k", "ts")
      .select("k", "ts", "qty", "right_ts", "right_price")
      .as[(String, Long, Long, Option[Long], Option[Double])]
      .collect().sortBy(x => (x._1, x._2, x._3))
    val want = lRows.map { case (k, ts, qty) =>
      val m = rRows.filter(x => x._1 == k && x._2 <= ts)
        .sortBy(_._2).lastOption
      (k, ts, qty, m.map(_._2), m.map(_._3))
    }.sortBy(x => (x._1, x._2, x._3))
    got.toSeq shouldBe want
  }

  test("bucketedAsOf window partitions on (key, bucket), not key alone") {
    val p = AsOfJoin.bucketedAsOf(trades, quotes, "k", "ts", bucketWidth = 10L)
      .queryExecution.analyzed.toString
    p should include("__asof_bucket")
    p should not include "CartesianProduct"
  }
}
