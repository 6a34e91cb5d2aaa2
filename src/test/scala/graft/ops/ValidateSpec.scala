package graft.ops

import graft.SparkSpecBase
import org.scalatest.matchers.should.Matchers

class ValidateSpec extends SparkSpecBase with Matchers {
  import spark.implicits._
  import Validate._

  private lazy val frame = Seq(
    // (id, name, score) with deliberate defects
    (Some(1L), Some("alice"), Some(10.0)),
    (Some(2L), Some("bob"), Some(200.0)),   // range violation
    (Some(2L), Some("Carol"), Some(20.0)),  // dup id + regex violation
    (Some(3L), None, Some(-5.0)),           // null name + range violation
    (Some(4L), Some("dave"), None)          // null score: violates nothing
  ).toDF("id", "name", "score")

  test("validate: hand-computed violation counts per rule kind; NULLs " +
      "never violate range/regex/unique, only not_null") {
    val dim = Seq(1L, 2L, 4L).toDF("k") // 3 is dangling
    val out = Validate.validate(frame, Seq(
        NotNull("name"),
        InRange("score", 0.0, 100.0),
        MatchesRegex("name", "^[a-z]+$"),
        Unique("id"),
        ForeignKey("id", dim, "k")))
      .orderBy("rule", "col_name")
      .as[(String, String, Long, Boolean)].collect().toSeq
    out shouldBe Seq(
      ("foreign_key", "id", 1L, false),    // the id=3 row dangles
      ("in_range", "score", 2L, false),    // 200.0 and -5.0
      ("matches_regex", "name", 1L, false),// "Carol"
      ("not_null", "name", 1L, false),
      ("unique", "id", 1L, false))         // one surplus id=2 row
  }

  test("min_group_size: rows in sub-k quasi-identifier groups are the " +
      "violations; a saturated grouping passes; NULLs form a group") {
    val qf = Seq(
      ("a", Some(1)), ("a", Some(1)), ("a", Some(1)), // group of 3
      ("a", Some(2)),                                  // group of 1
      ("b", None), ("b", None)                         // NULL group of 2
    ).toDF("g", "sub")
    val out = Validate.validate(qf,
        Seq(MinGroupSize(Seq("g", "sub"), 2), MinGroupSize(Seq("g"), 2)))
      .orderBy("col_name")
      .as[(String, String, Long, Boolean)].collect().toSeq
    out shouldBe Seq(
      ("min_group_size", "g", 0L, true),      // groups of 4 and 2
      ("min_group_size", "g,sub", 1L, false)) // the ("a",2) singleton
  }

  test("validate: a clean frame passes every rule with zero violations") {
    val dim = Seq(1L, 2L, 3L, 4L).toDF("k")
    val out = Validate.validate(frame.where($"id" =!= 2L && $"id" =!= 3L),
        Seq(NotNull("name"), InRange("score", 0.0, 100.0),
          MatchesRegex("name", "^[a-z]+$"), Unique("id"),
          ForeignKey("id", dim, "k")))
      .as[(String, String, Long, Boolean)].collect()
    all(out.map(_._3)) shouldBe 0L
    all(out.map(_._4)) shouldBe true
    out.length shouldBe 5
  }

  test("plan: row-local rules fuse into ONE scan-aggregate; unique " +
      "rules avoid the multi-distinct Expand") {
    val p = Validate.validate(frame, Seq(
        NotNull("name"), InRange("score", 0.0, 100.0),
        MatchesRegex("name", "^[a-z]+$"),
        Unique("id"), Unique("name")))
      .queryExecution.executedPlan.toString
    // two separate single-distinct aggregates, never a fused Expand
    p should not include "Expand"
  }

  test("benfordAudit: string-head digits, exact shares against the " +
      "stamped log10 constants, absent digits kept at n=0, " +
      "zero/negative/null drop") {
    import spark.implicits._
    val vals = Seq(Option(1L), Option(19L), Option(25L), Option(31L),
      Option(399L), Option(9000000L), Option(0L), Option(-70L),
      Option.empty[Long]).toDF("v")
    val out = Validate.benfordAudit(vals, "v")
      .as[(Int, Long, Option[Double], Double, Option[Double])]
      .collect().sortBy(_._1).toSeq
    out.map(_._1) shouldBe (1 to 9)
    out.map(_._2) shouldBe Seq(2L, 1L, 2L, 0L, 0L, 0L, 0L, 0L, 1L)
    // shares are exact n/6 divisions; dev subtracts the SAME stamped
    // constant the op embeds
    out.foreach { case (d, n, share, benford, dev) =>
      share shouldBe Some(n.toDouble / 6.0)
      benford shouldBe math.log10(1.0 + 1.0 / d)
      dev shouldBe Some(n.toDouble / 6.0 - math.log10(1.0 + 1.0 / d))
    }
    // an all-dropped input keeps the 9 expectation rows with NULL share
    val empty = Validate.benfordAudit(
      Seq(Option(0L), Option.empty[Long]).toDF("v"), "v")
      .as[(Int, Long, Option[Double], Double, Option[Double])]
      .collect().sortBy(_._1).toSeq
    empty.map(_._2).sum shouldBe 0L
    empty.foreach(r => r._3 shouldBe None)
  }
}
