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

  test("fsEmWeights: hand-traced one-field EM — rounds 1 and 2 exact") {
    // One block, one field: records a,b share value "x", c has "y" ->
    // histogram pat=0 cnt=2, pat=1 cnt=1. Round 1 by hand from
    // (m,u,p) = (0.9, 0.1, 0.5):
    //   g(pat1) = .5*.9 / (.5*.9 + .5*.1) = 0.9
    //   g(pat0) = .5*.1 / (.5*.1 + .5*.9) = 0.1  (escapes: plain arith)
    // Folds in ascending-pat order, seeded 0.0:
    //   sg = 0 + .1*2 + .9*1, sn = 0 + .9*2 + .1*1
    //   m' = (.9*1)/sg, u' = (.1*2)/sn, p' = sg/(sg+sn)
    // The expectations below recompute exactly that chain in plain
    // Scala doubles — shouldBe with NO tolerance is the bit-exactness
    // claim. Round 2 repeats the chain from round 1's outputs.
    val df = Seq((1L, "blk", "x"), (2L, "blk", "x"), (3L, "blk", "y"))
      .toDF("id", "blk", "f")
    val got = EntityResolution.fsEmWeights(df, "id", col("blk"),
        Seq("f"), iters = 2)
      .as[(Int, String, Double, Double, Double)].collect()
      .sortBy(_._1)
    def round(m: Double, u: Double, p: Double) = {
      val g1 = p * m / (p * m + (1.0 - p) * u)
      val g0 = p * (1.0 - m) / (p * (1.0 - m) + (1.0 - p) * (1.0 - u))
      val sg = 0.0 + g0 * 2.0 + g1 * 1.0
      val sn = 0.0 + (1.0 - g0) * 2.0 + (1.0 - g1) * 1.0
      val sg1 = 0.0 + 0.0 + g1 * 1.0
      val su1 = 0.0 + 0.0 + (1.0 - g1) * 1.0
      def cl(x: Double) = math.min(math.max(x, 1e-6), 1.0 - 1e-6)
      (cl(sg1 / sg), cl(su1 / sn), cl(sg / (sg + sn)))
    }
    val r1 = round(0.9, 0.1, 0.5)
    val r2 = round(r1._1, r1._2, r1._3)
    got(0) shouldBe ((1, "f", r1._1, r1._2, r1._3))
    got(1) shouldBe ((2, "f", r2._1, r2._2, r2._3))
  }

  test("fsEmWeights recovers separation from planted duplicates and is " +
      "partition-invariant") {
    // 40 planted duplicate pairs agree on all three fields; 120 filler
    // records carry near-unique values (agreements among fillers are
    // rare). EM must find m_k high, u_k low, p near the planted pair
    // share — with NO labels.
    val rnd = new scala.util.Random(7)
    val dups = (0L until 40L).flatMap { i =>
      val (b, f1, f2, f3) =
        (s"b${i % 4}", s"v$i", s"w$i", s"z$i")
      Seq((2 * i, b, f1, f2, f3), (2 * i + 1, b, f1, f2, f3)) }
    val fillers = (0L until 120L).map { i =>
      (1000L + i, s"b${rnd.nextInt(4)}", s"v${rnd.nextInt(400) + 500}",
        s"w${rnd.nextInt(400) + 500}", s"z${rnd.nextInt(400) + 500}") }
    val df = (dups ++ fillers).toDF("id", "blk", "f1", "f2", "f3")
    def run(parts: Int) = EntityResolution.fsEmWeights(
        df.repartition(parts), "id", col("blk"),
        Seq("f1", "f2", "f3"), iters = 10)
      .as[(Int, String, Double, Double, Double)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    val out = run(1)
    out shouldBe run(9) // exact-histogram determinism
    val fin = out.filter(_._1 == 10)
    fin.foreach { case (_, f, m, u, p) =>
      withClue(s"field $f") {
        m should be > 0.9 // planted dups agree on every field
        u should be < 0.05
        m should be > u * 10
        p should (be > 0.001 and be < 0.2)
      }
    }
  }

  test("fsEmWeights guards fire loudly") {
    val df = Seq((1L, "b", "x")).toDF("id", "blk", "f")
    an[IllegalArgumentException] should be thrownBy
      EntityResolution.fsEmWeights(df, "id", col("blk"), Seq.empty)
    an[IllegalArgumentException] should be thrownBy
      EntityResolution.fsEmWeights(df, "id", col("blk"),
        (1 to 13).map(i => s"f$i"))
    an[IllegalArgumentException] should be thrownBy
      EntityResolution.fsEmWeights(df, "id", col("blk"), Seq("f"),
        iters = 0)
    an[IllegalArgumentException] should be thrownBy
      EntityResolution.fsEmWeights(df, "id", col("blk"), Seq("f"),
        m0 = 1.0)
    // single record -> zero candidate pairs -> loud, not NaN
    an[IllegalArgumentException] should be thrownBy
      EntityResolution.fsEmWeights(df, "id", col("blk"), Seq("f"))
  }
}
