package graft.ops

import org.scalatest.matchers.should.Matchers

import graft.SparkSpecBase

class RangeJoinSpec extends SparkSpecBase with Matchers {
  import spark.implicits._

  private def left = Seq(
    ("a", 100L, 1L), ("a", 200L, 2L), ("b", 100L, 3L)
  ).toDF("k", "ts", "lid")

  private def right = Seq(
    ("a", 80L, 10L),  // within [100-30, 100] of lid 1
    ("a", 100L, 11L), // boundary: equal ts
    ("a", 171L, 12L), // within lookback of lid 2 (>= 170)
    ("a", 240L, 13L), // after everything
    ("b", 95L, 14L),  // within for lid 3
    ("c", 100L, 15L)  // wrong key
  ).toDF("k", "ts", "rid")

  test("intervalJoin matches exactly the naive range predicate, once each") {
    val binned = RangeJoin.intervalJoin(left, right, "k", "ts",
        lower = -30L, upper = 0L)
      .select("lid", "right_rid").as[(Long, Long)].collect().sorted
    val naive = left.as("l").join(right.as("r"),
        $"l.k" === $"r.k" && $"r.ts" >= $"l.ts" - 30 && $"r.ts" <= $"l.ts")
      .select($"l.lid", $"r.rid").as[(Long, Long)].collect().sorted
    binned shouldBe naive
    binned shouldBe Array((1L, 10L), (1L, 11L), (2L, 12L), (3L, 14L))
  }

  test("intervalJoin matches the naive join on random data and windows") {
    val rng = new scala.util.Random(13)
    val keys = Vector("a", "b", "c")
    val l = Vector.fill(200)((keys(rng.nextInt(3)), rng.nextInt(1000).toLong,
      rng.nextLong())).toDF("k", "ts", "lid")
    val r = Vector.fill(150)((keys(rng.nextInt(3)), rng.nextInt(1000).toLong,
      rng.nextLong())).toDF("k", "ts", "rid")
    for ((lo, hi) <- Seq((-50L, 0L), (0L, 77L), (-33L, 33L), (-1000L, 1000L))) {
      withClue(s"window [$lo, $hi]") {
        val binned = RangeJoin.intervalJoin(l, r, "k", "ts", lo, hi)
          .select("lid", "right_rid").as[(Long, Long)].collect().sorted
        val naive = l.as("a").join(r.as("b"),
            $"a.k" === $"b.k" && $"b.ts" >= $"a.ts" + lo && $"b.ts" <= $"a.ts" + hi)
          .select($"a.lid", $"b.rid").as[(Long, Long)].collect().sorted
        binned shouldBe naive
      }
    }
  }

  test("plan: equi-join on (key, bucket) — no cartesian/nested-loop") {
    val p = RangeJoin.intervalJoin(left, right, "k", "ts", -30L, 0L)
      .queryExecution.executedPlan.toString
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("rejects left frames with reserved/colliding column names") {
    val withBucket = left.withColumn("__bucket",
      org.apache.spark.sql.functions.lit(0))
    val e1 = intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(withBucket, right, "k", "ts", -30L, 0L)
    }
    e1.getMessage should include("__bucket")
    val withRightName = left.withColumn("right_rid",
      org.apache.spark.sql.functions.lit(0L))
    val e2 = intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(withRightName, right, "k", "ts", -30L, 0L)
    }
    e2.getMessage should include("right_rid")
  }

  test("works with positive (lookahead) windows and long spans") {
    val binned = RangeJoin.intervalJoin(left, right, "k", "ts",
        lower = 0L, upper = 1000L)
      .select("lid", "right_rid").as[(Long, Long)].collect().sorted
    val naive = left.as("l").join(right.as("r"),
        $"l.k" === $"r.k" && $"r.ts" >= $"l.ts" && $"r.ts" <= $"l.ts" + 1000)
      .select($"l.lid", $"r.rid").as[(Long, Long)].collect().sorted
    binned shouldBe naive
  }
}
