package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpecBase

/** Z-order layout: the expression against a bit-twiddling-free model,
  * plus the locality property the layout exists for. */
class LayoutSpec extends SparkSpecBase with Matchers {
  import spark.implicits._

  /** Model: interleave by walking bits one at a time. */
  private def mortonModel(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zValue matches the bit-walk model over random and edge inputs") {
    val rnd = new scala.util.Random(42)
    val edge = Seq(0L, 1L, 2L, 3L, (1L << 31) - 1, 12345L, 0x55555555L, 0x2AAAAAAAL)
    val xs = edge ++ Seq.fill(200)(rnd.nextLong().abs % (1L << 31))
    val ys = edge ++ Seq.fill(200)(rnd.nextLong().abs % (1L << 31))
    val rows = xs.zip(ys)
    val got = rows.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect()
    got.zip(rows).foreach { case (z, (x, y)) =>
      withClue(s"x=$x y=$y: ") { z shouldBe mortonModel(x, y) }
    }
  }

  test("zValue is non-negative and strictly monotonic in each dim with " +
      "the other fixed (sortable layout key)") {
    val xs = (0L until 64L).toSeq
    val zx = xs.toDF("x").select(Layout.zValue(col("x"), lit(7L)).as("z"))
      .as[Long].collect()
    val zy = xs.toDF("y").select(Layout.zValue(lit(7L), col("y")).as("z"))
      .as[Long].collect()
    all(zx) should be >= 0L
    zx.toSeq shouldBe zx.toSeq.sorted
    zy.toSeq shouldBe zy.toSeq.sorted
    zx.distinct.length shouldBe zx.length
  }

  test("z-bucket z>>2k bounds BOTH dimensions within 2^k (the row-group " +
      "pruning property)") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(2000)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val k = 5 // bucket fixes all but the low 5 bits of each dim
    val spans = rows.toDF("x", "y")
      .withColumn("bucket",
        call_function("shiftright", Layout.zValue(col("x"), col("y")), lit(2 * k)))
      .groupBy("bucket")
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
      .select(greatest(col("dx"), col("dy")))
      .as[Long].collect()
    all(spans) should be < (1L << k)
  }

  /** 3-D model: one bit at a time, stride 3. */
  private def morton3Model(x: Long, y: Long, z: Long): Long = {
    var r = 0L
    var i = 0
    while (i < 21) {
      r |= ((x >> i) & 1L) << (3 * i)
      r |= ((y >> i) & 1L) << (3 * i + 1)
      r |= ((z >> i) & 1L) << (3 * i + 2)
      i += 1
    }
    r
  }

  test("zValue3 matches the bit-walk model over random and edge inputs") {
    val rnd = new scala.util.Random(43)
    val edge = Seq(0L, 1L, 2L, 7L, (1L << 21) - 1, 0x155555L, 0x0AAAAAL)
    val rows = (edge ++ Seq.fill(200)(rnd.nextLong().abs % (1L << 21)))
      .map(x => (x, rnd.nextLong().abs % (1L << 21), rnd.nextLong().abs % (1L << 21)))
    val got = rows.toDF("x", "y", "z")
      .select(Layout.zValue3(col("x"), col("y"), col("z")).as("m"))
      .as[Long].collect()
    got.zip(rows).foreach { case (m, (x, y, z)) =>
      withClue(s"x=$x y=$y z=$z: ") { m shouldBe morton3Model(x, y, z) }
    }
    all(got) should be >= 0L
  }

  test("hilbertIndex is a true Hilbert curve at order 4: bijection onto " +
      "[0, 256) and every consecutive index pair is GRID-ADJACENT (the " +
      "no-diagonal-jump property Morton lacks)") {
    import spark.implicits._
    // reference: the published xy2d bit algorithm, directly transcribed
    def xy2d(order: Int, x0: Long, y0: Long): Long = {
      val n = 1L << order
      var (x, y, d) = (x0, y0, 0L)
      var s = n / 2
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    val grid = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = Layout
      .hilbertIndex(grid.toDF("x", "y"), "x", "y", order = 4, outCol = "h")
      .select("x", "y", "h").as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, h) =>
      withClue(s"x=$x y=$y: ") { h shouldBe xy2d(4, x, y) }
    }
    val byIndex = got.sortBy(_._3)
    byIndex.map(_._3).toSeq shouldBe (0L until 256L) // bijection
    byIndex.sliding(2).foreach { case Array((x1, y1, _), (x2, y2, _)) =>
      ((x1 - x2).abs + (y1 - y2).abs) shouldBe 1L // grid adjacency
    }
  }

  test("zValue stays codegen'd (composed from built-in bitwise exprs — " +
      "no UDF, no fallback)") {
    // spark.range (not a local Seq): a LocalRelation of literals would
    // constant-fold the whole interleave away before any codegen
    val df = spark.range(16)
      .select(Layout.zValue(col("id"), col("id") + 1).as("z"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val projLine = p.linesIterator.find(_.contains("Project"))
      .getOrElse(fail("no Project in plan"))
    projLine.trim.replaceFirst("^[:+\\- ]+", "") should startWith("*(")
  }

  test("rangeBucketByQuantiles: buckets partition the value order, are " +
      "~balanced, and the assignment is partition-invariant") {
    val rnd = new scala.util.Random(17)
    val rows = (0L until 5000L).map(id => (id, rnd.nextInt(1000000).toLong))
    def run(parts: Int) = Layout.rangeBucketByQuantiles(
        rows.toDF("id", "v").repartition(parts), "id", "v",
        nBuckets = 10, k = 1024)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"),
        max(col("v")).as("hi"))
      .orderBy("bucket")
      .as[(Int, Long, Long, Long)].collect().toSeq
    val out = run(1)
    out.map(_._1) shouldBe (0 until 10)
    // order partition: every value in bucket b is <= every value in b+1
    out.sliding(2).foreach { case Seq(a, b) => a._4 should be <= b._3 }
    // balance: each bucket within 30% of the ideal 500 (k=1024 sample
    // rank error ~4%; 30% is a loose, non-flaky bound)
    all(out.map(_._2)) should (be >= 350L and be <= 650L)
    // hash-derived boundaries: identical on any input partitioning
    run(13) shouldBe out
  }

  test("zonemapStats + pruneAudit: envelopes and band overlap counted " +
      "exactly (touching, containing, and missing bands)") {
    // 3 files: [0,10], [20,30], [40,50], 2 rows each
    val df = Seq((0, 0L), (0, 10L), (1, 20L), (1, 30L), (2, 40L), (2, 50L))
      .toDF("f", "v")
    val stats = Layout.zonemapStats(df, "f", "v")
    stats.orderBy("file").as[(Int, Long, Long, Long)].collect()
      .toSeq shouldBe Seq((0, 2L, 0L, 10L), (1, 2L, 20L, 30L),
        (2, 2L, 40L, 50L))
    def audit(lo: Long, hi: Long) = Layout.pruneAudit(stats, lo, hi)
      .as[(Long, Long, Long)].head()
    audit(25L, 45L) shouldBe ((3L, 2L, 4L)) // spans files 1 and 2
    audit(10L, 10L) shouldBe ((3L, 1L, 2L)) // touches file 0's hi edge
    audit(11L, 19L) shouldBe ((3L, 0L, 0L)) // gap: everything pruned
  }

  test("rangeBucketByQuantiles: NULL value gets a NULL bucket, not " +
      "silent bucket-0 mingling") {
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(20L)),
        (4L, Some(30L)), (5L, Some(40L)))
      .toDF("id", "v")
    val out = Layout.rangeBucketByQuantiles(df, "id", "v", nBuckets = 2)
      .select("id", "bucket").as[(Long, Option[Int])]
      .collect().toMap
    out(2L) shouldBe None          // null value -> null bucket
    out(1L) shouldBe Some(0)       // smallest real value stays bucket 0
    out(5L) shouldBe Some(1)
  }
}
