package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpecBase

class TokenizerSpec extends SparkSpecBase with Matchers {
  import spark.implicits._

  private def merges(corpus: Seq[String], rounds: Int, parts: Int = 1) =
    Tokenizer.bpeMerges(
        corpus.map(Tuple1(_)).toDF("text").repartition(parts),
        "text", rounds)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toSeq

  test("bpeMerges reproduces the classic low/lower/newest/widest trace, " +
      "including the round-1 tie broken by symbol order") {
    // Sennrich et al. 2016's worked example (sans end-of-word marker):
    // pair counts open with es=9 and st=9 tied — the (l, r) ascending
    // tie-break picks ("e","s") < ("s","t"); after "es" exists, "st"
    // never wins because ("es","t") inherits the 9.
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    merges(corpus, 4) shouldBe Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L),
      (4, "lo", "w", "low", 7L))
  }

  test("applyMerge fuses left-to-right non-overlapping occurrences") {
    def run(syms: Seq[String], a: String, b: String): Seq[String] =
      Tokenizer.applyMerge(
          Seq((1L, syms)).toDF("cnt", "syms"), a, b)
        .select("syms").as[Seq[String]].head()
    run(Seq("a", "a", "a"), "a", "a") shouldBe Seq("aa", "a")
    run(Seq("a", "a", "a", "a"), "a", "a") shouldBe Seq("aa", "aa")
    run(Seq("a", "b", "a", "b"), "a", "b") shouldBe Seq("ab", "ab")
    run(Seq("x", "a", "a", "a", "x"), "a", "a") shouldBe
      Seq("x", "aa", "a", "x")
    run(Seq("a", "b"), "b", "a") shouldBe Seq("a", "b") // no match
    run(Seq("q"), "a", "b") shouldBe Seq("q") // single symbol
  }

  test("repeated-symbol cascade: aa then aaa (counts weighted by word " +
      "frequency)") {
    // "aaa" x2: round 1 fuses (a,a) with multiplicity 2 per word -> 4;
    // words become [aa, a]; round 2 fuses (aa, a) -> 2.
    merges(Seq("aaa", "aaa"), 2) shouldBe Seq(
      (1, "a", "a", "aa", 4L),
      (2, "aa", "a", "aaa", 2L))
  }

  test("symbol exhaustion ends the merge table early instead of " +
      "padding or failing") {
    merges(Seq("ab"), rounds = 5) shouldBe Seq((1, "a", "b", "ab", 1L))
  }

  test("bpeMerges is partition-invariant") {
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    merges(corpus, 6, parts = 1) shouldBe merges(corpus, 6, parts = 7)
  }

  test("bpeEncode: per-doc codepoint and BPE-token counts under a " +
      "trained table (hand-computed)") {
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val rules = merges(corpus, 4).map(m => (m._2, m._3))
    val out = Tokenizer.bpeEncode(
        Seq((1L, "low lower"), (2L, "newest widest zzz")).toDF("id", "text"),
        "id", "text", rules)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // doc 1: low -> [low] (1); lower -> [low, e, r] (3); chars 3 + 5
    // doc 2: newest -> [n, e, w, est] (4); widest -> [w, i, d, est]
    //        (4); zzz (unseen word, char fallback) -> [z, z, z] (3)
    out shouldBe Seq((1L, 8L, 4L), (2L, 15L, 11L))
  }

  test("bpeMerges guards fire loudly") {
    an[IllegalArgumentException] should be thrownBy
      Tokenizer.bpeMerges(Seq(Tuple1("ab")).toDF("text"), "text", 0)
    val longWord = "x" * (Tokenizer.MaxWordLen + 1)
    val ex = intercept[Exception] {
      Tokenizer.bpeMerges(Seq(Tuple1(longWord)).toDF("text"), "text", 1)
        .collect()
    }
    ex.getMessage should include("pre-tokenization failed")
  }
}
