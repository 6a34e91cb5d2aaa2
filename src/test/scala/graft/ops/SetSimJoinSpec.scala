package graft.ops

import graft.SparkSpecBase
import org.scalatest.matchers.should.Matchers

class SetSimJoinSpec extends SparkSpecBase with Matchers {
  import spark.implicits._

  private def bruteForce(docs: Seq[(Long, String)], t: Double,
      shingle: Int = 1): Set[(Long, Long)] = {
    def tok(s: String): Set[String] = {
      val ws = s.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq
      ws.sliding(shingle).filter(_.size == shingle).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, s) => id -> tok(s) }.filter(_._2.nonEmpty)
    (for {
      (a, ta) <- sets; (b, tb) <- sets if a < b
      i = (ta intersect tb).size
      if i.toDouble / (ta.size + tb.size - i).toDouble >= t
    } yield (a, b)).toSet
  }

  test("hand-built corpus: near-identical pair found with exact jaccard; " +
      "disjoint and low-overlap pairs excluded") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma epsilon"), // J(1,2) = 3/5 = 0.6
      (3L, "zeta eta theta iota"),      // disjoint from 1,2
      (4L, "alpha zeta")                // low overlap with everything
    ).toDF("doc_id", "text")
    val got = SetSimJoin.jaccardJoinPairs(df, "doc_id", "text", 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect()
    got.map(r => (r._1, r._2)).toSet shouldBe Set((1L, 2L))
    got.head._3 shouldBe 0.6 +- 1e-15
  }

  test("prefix filtering is complete AND sound: output == brute-force " +
      "all-pairs on random mutated corpora at several thresholds, " +
      "including non-dyadic ones where ceil(t*n) sits on an IEEE edge") {
    val rng = new scala.util.Random(97)
    val vocab = Vector.tabulate(60)(i => s"w$i")
    def doc(len: Int): Vector[String] =
      Vector.fill(len)(vocab(rng.nextInt(vocab.size)))
    val bases = Vector.fill(5)(doc(8 + rng.nextInt(10)))
    val docs = (bases ++ bases.flatMap { b =>
      Vector.fill(3) { // token-level mutations => genuinely high jaccards
        var v = b
        (0 until 1 + rng.nextInt(3)).foreach { _ =>
          v = v.updated(rng.nextInt(v.size), vocab(rng.nextInt(vocab.size)))
        }
        v
      }
    } :+ bases.head // an exact dup: a jaccard-1.0 pair exists
    ).zipWithIndex.map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
    val df = docs.toDF("doc_id", "text")
    for (t <- Seq(0.3, 1.0 / 3.0, 0.5, 0.7, 0.9, 1.0)) {
      val got = SetSimJoin.jaccardJoinPairs(df, "doc_id", "text", t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      got shouldBe bruteForce(docs, t)
    }
    // shingle mode (the discriminative-set path): same exactness over
    // word-3-gram sets — mutated docs keep shared shingles, unrelated
    // docs share almost none
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val got = SetSimJoin.jaccardJoinPairs(df, "doc_id", "text", t,
          shingle = 3)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      got shouldBe bruteForce(docs, t, shingle = 3)
    }
  }

  test("empty-token docs match nothing; jaccard/overlap/sizes are exact") {
    val df = Seq(
      (1L, "x y z"), (2L, "x y z"), (3L, "... !!! ---")
    ).toDF("doc_id", "text")
    val rows = SetSimJoin.jaccardJoinPairs(df, "doc_id", "text", 0.99)
      .as[(Long, Long, Int, Int, Int, Double)].collect()
    rows.toSeq shouldBe Seq((1L, 2L, 3, 3, 3, 1.0))
  }
}
