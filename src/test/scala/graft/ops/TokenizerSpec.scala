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

  private def mergesLocal(corpus: Seq[String], rounds: Int,
      maxWords: Int = 1 << 20) =
    Tokenizer.bpeMergesLocal(
        corpus.map(Tuple1(_)).toDF("text"), "text", rounds, maxWords)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toSeq

  test("bpeMergesLocal is bit-identical to the distributed bpeMerges: " +
      "Sennrich trace, repeated-symbol cascade, exhaustion, and a " +
      "seeded random corpus run to exhaustion") {
    val sennrich = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    mergesLocal(sennrich, 4) shouldBe merges(sennrich, 4)
    mergesLocal(Seq("aaa", "aaa"), 2) shouldBe merges(Seq("aaa", "aaa"), 2)
    mergesLocal(Seq("ab"), 5) shouldBe merges(Seq("ab"), 5)
    val rnd = new scala.util.Random(31L)
    val vocabulary = Seq.fill(40)(
      Seq.fill(2 + rnd.nextInt(8))(('a' + rnd.nextInt(5)).toChar).mkString)
    val corpus = Seq.fill(200)(
      Seq.fill(1 + rnd.nextInt(6))(
        vocabulary(rnd.nextInt(vocabulary.size))).mkString(" "))
    mergesLocal(corpus, 64) shouldBe merges(corpus, 64)
  }

  test("bpeMergesLocal trains past the distributed 256-round ceiling: " +
      "a wide synthetic vocabulary yields >= 1000 rules that the " +
      "serving kernel applies") {
    // 1500 distinct 6-char words over 26 letters: each word needs 5
    // fusions to collapse, far more than 1000 rounds of material
    val rnd = new scala.util.Random(7L)
    val words = Seq.fill(1500)(
      Seq.fill(6)(('a' + rnd.nextInt(26)).toChar).mkString).distinct
    val docs = words.grouped(50).map(_.mkString(" ")).toSeq
    val table = mergesLocal(docs, rounds = 1200)
    table.size should be >= 1000
    table.map(_._1) shouldBe (1 to table.size) // dense rounds, in order
    // the trained table serves through the kernel encode path: every
    // doc's token count is at most its word count after enough merges
    val rules = table.map(m => (m._2, m._3))
    val enc = Tokenizer.bpeEncode(
        docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("id", "text"),
        "id", "text", rules)
      .agg(sum($"n_bpe"), sum($"n_chars_alpha")).as[(Long, Long)].head()
    enc._1 should be < enc._2 // merges actually compress
    an[IllegalArgumentException] should be thrownBy
      Tokenizer.bpeMergesLocal(docs.map(Tuple1(_)).toDF("text"), "text",
        rounds = 10, maxWords = 100) // vocab over the guard
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
