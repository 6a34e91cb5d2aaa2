package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpecBase
import graft.ops.Tokenizer

/** Byte-parity of the whole-table BPE kernel ([[Bpe.bpe_apply]])
  * against the independently-derived fold path
  * ([[Tokenizer.applyMerge]] folded rule-by-rule), plus the fold-order
  * semantics the kernel must preserve exactly and the realistic-scale
  * (32k-rule) case the fold could never express. */
class BpeKernelSpec extends SparkSpecBase with Matchers {
  import spark.implicits._

  private def kernel(syms: Seq[String], rules: Seq[(String, String)]): Seq[String] =
    Seq(Tuple1(syms)).toDF("syms")
      .select(Bpe.bpe_apply(col("syms"), rules).as("syms"))
      .as[Seq[String]].head()

  private def fold(syms: Seq[String], rules: Seq[(String, String)]): Seq[String] =
    rules.foldLeft(Seq(Tuple1(syms)).toDF("syms")) {
      case (acc, (a, b)) => Tokenizer.applyMerge(acc, a, b) }
      .as[Seq[String]].head()

  /** Plain-Scala LTR fold — the third, obviously-correct derivation
    * used to check the kernel where the DataFrame fold is too slow. */
  private def scalaFold(syms: Seq[String], rules: Seq[(String, String)]): Seq[String] =
    rules.foldLeft(syms.toVector) { case (s, (a, b)) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += s(i); i += 1 }
      }
      out.result()
    }

  test("kernel matches the fold path byte-for-byte on adversarial " +
      "hand cases (LTR runs, unknown symbols, no-op rules)") {
    val cases = Seq(
      (Seq("a", "a", "a", "a"), Seq(("a", "a"))),
      (Seq("a", "a", "a"), Seq(("a", "a"), ("aa", "a"))),
      (Seq("x", "a", "a", "a", "x"), Seq(("a", "a"))),
      (Seq("a", "b"), Seq(("b", "a"))),
      (Seq("q"), Seq(("a", "b"))),
      (Seq("l", "o", "w", "e", "r"), Seq(("e", "s"), ("es", "t"),
        ("l", "o"), ("lo", "w"))),
      // unknown symbols (never in any rule) pass through untouched
      (Seq("ø", "a", "b", "ø"), Seq(("a", "b"))))
    for ((syms, rules) <- cases) {
      val k = kernel(syms, rules)
      k shouldBe fold(syms, rules)
      k shouldBe scalaFold(syms, rules)
    }
    // empty input: kernel is total (the fold path never sees one —
    // wordSyms guarantees >= 1 symbol — and its sequence(1, size)
    // stage assumes it)
    kernel(Seq.empty, Seq(("a", "b"))) shouldBe Seq.empty
  }

  test("fold-order semantics: a rule whose pair only appears AFTER a " +
      "later rule fired is NOT revisited (differs from priority-merge)") {
    // rank 0 = (s, ax): absent until rank 1 fuses (a, x) -> ax, but by
    // then rank 0's turn has passed. Priority-merge would emit [sax];
    // the fold (and so the kernel) must emit [s, ax].
    val rules = Seq(("s", "ax"), ("a", "x"))
    val got = kernel(Seq("s", "a", "x"), rules)
    got shouldBe Seq("s", "ax")
    got shouldBe fold(Seq("s", "a", "x"), rules)
  }

  test("duplicate (l, r) pair at two ranks: the later rank still fires " +
      "when an in-between rule recreates the pair") {
    // rank 0 = (ab, c): absent on [a, b, c]; rank 1 = (a, b) creates
    // it; rank 2 = (ab, c) again -> fires. Result [abc].
    val rules = Seq(("ab", "c"), ("a", "b"), ("ab", "c"))
    val got = kernel(Seq("a", "b", "c"), rules)
    got shouldBe Seq("abc")
    got shouldBe fold(Seq("a", "b", "c"), rules)
  }

  test("randomized parity vs both fold derivations (seeded), and the " +
      "concat invariant: merges only fuse, never alter bytes") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcd"
    for (_ <- 1 to 40) {
      // grow a plausible table: rule sides drawn from symbols created
      // so far (plus chars), exactly how training tables arise
      var pool = alphabet.map(_.toString).toVector
      val rules = (1 to (1 + rnd.nextInt(12))).map { _ =>
        val a = pool(rnd.nextInt(pool.length))
        val b = pool(rnd.nextInt(pool.length))
        pool :+= (a + b)
        (a, b)
      }
      val word = Seq.fill(2 + rnd.nextInt(14))(
        alphabet(rnd.nextInt(alphabet.length)).toString)
      val k = kernel(word, rules)
      k shouldBe fold(word, rules)
      k shouldBe scalaFold(word, rules)
      k.mkString shouldBe word.mkString
    }
  }

  test("bpeEncode (kernel path) matches bpeEncodeFold on the sf0.001 " +
      "documents corpus under the q_bpe-trained 12-rule table") {
    val d = spark.read.parquet(s"${sf()}/documents.parquet")
    val rules = Tokenizer.bpeMerges(d, "text", rounds = 12)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val viaKernel = Tokenizer.bpeEncode(d, "doc_id", "text", rules)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val viaFold = Tokenizer.bpeEncodeFold(d, "doc_id", "text", rules)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    viaKernel shouldBe viaFold
    viaKernel should not be empty
  }

  test("32k-rule table: the realistic tokenizer-serving case the fold " +
      "path could never plan (O(1) plan depth, parity vs plain Scala)") {
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    val twoChar = for (a <- alphabet; b <- alphabet) yield (a.toString, b.toString)
    val threeChar = for (a <- alphabet; b <- alphabet; c <- alphabet)
      yield (s"$a$b", c.toString)
    val rules = (twoChar ++ threeChar).take(32768).toSeq
    rules.length shouldBe 32768

    val rnd = new scala.util.Random(7)
    val words = Seq.fill(60)(
      Seq.fill(4 + rnd.nextInt(12))(
        alphabet(rnd.nextInt(alphabet.length)).toString))
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "syms")
    val got = df.select(col("id"), Bpe.bpe_apply(col("syms"), rules).as("syms"))
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    for ((id, out) <- got)
      out shouldBe scalaFold(words(id.toInt), rules)
    // the 2-char pass alone collapses every adjacent char pair, so the
    // encode genuinely fired — no vacuous pass-through
    got.map(_._2.length).sum should be < words.map(_.length).sum
  }
}
