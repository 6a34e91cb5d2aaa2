package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpecBase

class SkewJoinSpec extends SparkSpecBase with Matchers {
  import spark.implicits._

  // 90% of rows share one hot key — the shape salting exists for.
  private def skewedLeft = (1 to 1000).map { i =>
    (if (i <= 900) 7L else i.toLong, s"row$i")
  }.toDF("k", "payload")

  private def right = Seq((7L, "hot"), (950L, "cold"), (999L, "cold2"),
    (12345L, "unmatched")).toDF("k", "attr")

  test("salted inner join returns exactly the plain join's rows") {
    val plain = skewedLeft.join(right, "k")
      .select("k", "payload", "attr").as[(Long, String, String)]
      .collect().sorted
    val salted = SkewJoin.saltedJoin(skewedLeft, right, "k", saltFactor = 8)
      .select("k", "payload", "attr").as[(Long, String, String)]
      .collect().sorted
    salted shouldBe plain
    salted.count(_._1 == 7L) shouldBe 900
  }

  test("salted left join preserves unmatched left rows exactly once") {
    val salted = SkewJoin.saltedJoin(skewedLeft, right, "k", 8, "left")
      .select("k", "payload", "attr").as[(Long, String, Option[String])]
      .collect()
    salted.length shouldBe 1000 // every left row exactly once
    salted.count(_._3.isEmpty) shouldBe 1000 - 900 - 2 // non-hot, non-matched
  }

  test("right/full outer are rejected (replication would duplicate rights)") {
    an[IllegalArgumentException] should be thrownBy
      SkewJoin.saltedJoin(skewedLeft, right, "k", 8, "right")
    an[IllegalArgumentException] should be thrownBy
      SkewJoin.saltedJoin(skewedLeft, right, "k", 0)
  }

  test("the hot key's rows spread across salt values") {
    val hot = skewedLeft.where(col("k") === 7L)
    val salts = hot.withColumn("s", SkewJoin.saltOf(hot, 8))
      .select(countDistinct(col("s"))).as[Long].head()
    salts should be > 4L // 900 rows over 8 salts: all 8 with overwhelming probability
  }

  test("byte-identical duplicate rows still spread (position enters the salt)") {
    val dups = Seq.fill(800)((7L, "same-payload")).toDF("k", "payload")
    val salts = dups.withColumn("s", SkewJoin.saltOf(dups, 8))
      .select(countDistinct(col("s"))).as[Long].head()
    salts shouldBe 8L // content hash alone would put all 800 on ONE salt
    // and the join result is still exactly the plain join
    val r = Seq((7L, "hot")).toDF("k", "attr")
    SkewJoin.saltedJoin(dups, r, "k", 8).count() shouldBe 800L
  }
}
