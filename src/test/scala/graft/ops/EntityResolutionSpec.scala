package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

class EntityResolutionSpec extends SparkSpecBase with Matchers {
  import spark.implicits._

  private val records = Seq(
    (1L, "red widget"), // block widget
    (2L, "hot widget"), // lev(red widget, hot widget) = 3
    (3L, "red gadget"), // ALSO lev 3 from "red widget" — but block gadget
    (4L, "red widget"), // exact duplicate of 1
    (5L, "azure widget") // lev 5/6 from the others — above threshold
  ).toDF("id", "name")

  private def block = element_at(split(col("name"), " "), -1)

  test("fuzzyPairs: same-block pairs within threshold only — the " +
      "cross-block lev-3 pair and the above-threshold pair are absent") {
    val pairs = EntityResolution
      .fuzzyPairs(records, "id", "name", block, maxDist = 3)
      .as[(Long, Long, Int)].collect().toSet
    pairs shouldBe Set((1L, 2L, 3), (1L, 4L, 0), (2L, 4L, 3))
    // (1,3) excluded by BLOCKING despite lev("red widget","red gadget")
    // = 3 <= maxDist; (x,5) excluded by the threshold despite sharing
    // the widget block — both exclusions are the operator's contract
  }

  test("fuzzyPairs: the replicated-group decomposition is pair-complete " +
      "— any `groups` yields the same set as the plain join (groups=1)") {
    import org.apache.spark.sql.functions.lit
    // one big block, 40 names engineered so some pairs match and most
    // don't; ids spread across hash groups
    val rows = (1L to 40L)
      .map(i => (i, s"item ${"abcde" (i.toInt % 5)}${i % 7}"))
      .toDF("id", "name")
    def pairs(g: Int) = EntityResolution
      .fuzzyPairs(rows, "id", "name", lit("all"), maxDist = 1, groups = g)
      .as[(Long, Long, Int)].collect().toSet
    val reference = pairs(1) // degenerate decomposition = plain block join
    reference should not be empty
    pairs(3) shouldBe reference
    pairs(8) shouldBe reference
  }

  test("fuzzyCanonical: min lower-id match with candidate count; " +
      "unmatched records are their own canon with n_cands = 0") {
    val canon = EntityResolution
      .fuzzyCanonical(records, "id", "name", block, maxDist = 3)
      .as[(Long, Long, Long)].collect().toSet
    canon shouldBe Set(
      (1L, 1L, 0L), // no LOWER-id match: keeper
      (2L, 1L, 1L),
      (3L, 3L, 0L), // alone in its block
      (4L, 1L, 2L), // matches 1 (dist 0) and 2 (dist 3): min id 1
      (5L, 5L, 0L)) // in the widget block but beyond maxDist
  }

  test("fsScorePairs: rare-field agreement outweighs two common-field " +
      "agreements; decisions follow the two-threshold rule exactly") {
    // field a: rare agreement (u=0.01, ratio 90); b, c: common (ratio 2)
    val df = Seq(
      (1L, "x", "p", "q"),
      (2L, "x", "P", "Q"),   // agrees with 1 on a ONLY
      (3L, "y", "m", "n"),
      (4L, "z", "m", "n"))   // agrees with 3 on b AND c
      .toDF("id", "a", "b", "c")
    val out = EntityResolution.fsScorePairs(df, "id", lit(1),
        fields = Seq(("a", 0.9, 0.01), ("b", 0.6, 0.3), ("c", 0.6, 0.3)),
        matchOdds = 20.0, possibleOdds = 0.2)
      .select("id_a", "id_b", "n_agree", "score", "decision")
      .as[(Long, Long, Long, Double, String)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    val dis = (1 - 0.6) / (1 - 0.3)
    val rareOnly = 1.0 * (0.9 / 0.01) * dis * dis       // ~29.4
    val commonTwo = 1.0 * ((1 - 0.9) / (1 - 0.01)) * (0.6 / 0.3) * (0.6 / 0.3) // ~0.40
    // all-disagree cross pairs (~0.033) fall below possibleOdds: absent
    out shouldBe Seq(
      (1L, 2L, 1L, rareOnly, "match"),
      (3L, 4L, 2L, commonTwo, "possible"))
  }

  test("fsScorePairs matches a brute-force all-pairs model on seeded " +
      "random records (scores bit-exact, decisions identical, " +
      "partition-invariant)") {
    val rnd = new scala.util.Random(41)
    val fields = Seq(("f1", 0.9, 0.05), ("f2", 0.7, 0.2), ("f3", 0.8, 0.1))
    val recs = (0L until 60L).map { id =>
      (id, s"b${rnd.nextInt(3)}", s"x${rnd.nextInt(4)}",
        s"y${rnd.nextInt(3)}", s"z${rnd.nextInt(5)}") }
    val model = (for {
      a <- recs; b <- recs
      if a._1 < b._1 && a._2 == b._2 // same block
    } yield {
      val agrees = Seq(a._3 == b._3, a._4 == b._4, a._5 == b._5)
      val score = fields.zip(agrees).foldLeft(1.0) {
        case (acc, ((_, m, u), ag)) =>
          acc * (if (ag) m / u else (1 - m) / (1 - u)) }
      (a._1, b._1, agrees.count(identity).toLong, score,
        if (score >= 20.0) "match"
        else if (score >= 1.0) "possible" else null)
    }).filter(_._5 != null).sortBy(r => (r._1, r._2))
    def run(parts: Int) = EntityResolution.fsScorePairs(
        recs.toDF("id", "blk", "f1", "f2", "f3").repartition(parts),
        "id", col("blk"), fields, matchOdds = 20.0, possibleOdds = 1.0)
      .select("id_a", "id_b", "n_agree", "score", "decision")
      .as[(Long, Long, Long, Double, String)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    run(1) shouldBe model
    run(13) shouldBe model
  }
}
