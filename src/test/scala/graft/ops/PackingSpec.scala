package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpecBase

/** [[TextAnalysis.packChunks]] — the per-chunk view of packSequences
  * (whose per-doc semantics TextAnalysisSpec already pins). */
class PackingSpec extends SparkSpecBase with Matchers {
  import spark.implicits._

  // whitespace token counts 4, 7, 3, 12; one stream
  private def corpus = Seq(
    (0L, "s", "w w w w"),
    (1L, "s", "w w w w w w w"),
    (2L, "s", "w w w"),
    (3L, "s", "w w w w w w w w w w w w")).toDF("id", "part", "text")

  private def run(df: org.apache.spark.sql.DataFrame, cap: Long) =
    TextAnalysis.packChunks(df, "id",
        TextAnalysis.whitespaceTokenCount(col("text")), "part", cap)
      .select("part", "pack_id", "n_docs", "n_tokens", "n_continued",
        "continuation_frac")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .sortBy(r => (r._1, r._2)).toSeq

  test("hand-traced concat-and-chunk at capacity 10 — boundaries, " +
      "continuation counts and token shares exact") {
    // stream: d0 [0,4) d1 [4,11) d2 [11,14) d3 [14,26)
    run(corpus, 10L) shouldBe Seq(
      ("s", 0L, 2L, 10L, 0L, 0.0),  // d0 whole + d1 head
      ("s", 1L, 3L, 10L, 1L, 0.1),  // d1 tail (1 tok, continued) + d2 + d3 head
      ("s", 2L, 1L, 6L, 1L, 1.0))   // d3 tail only
  }

  test("streams pack independently; zero-token docs never " +
      "phantom-occupy a chunk; tokens are conserved per stream with " +
      "every non-tail chunk exactly full") {
    val two = Seq(
      (0L, "a", "w w w w"), (2L, "a", "w w w"), (4L, "a", ""),
      (1L, "b", "w w w w w w w"), (3L, "b", "w w w w w w w w w w w w"))
      .toDF("id", "part", "text")
    val got = run(two, 7L)
    // stream a: 7 tokens -> one exactly-full chunk, 2 docs, no cont
    // stream b: d1 [0,7) d3 [7,19) -> chunks 0 (7 tok), 1 (7), 2 (5);
    // d3 starts EXACTLY at chunk 1's boundary, so it is NOT a
    // continuation there (nothing of it was cut) — only in chunk 2
    got shouldBe Seq(
      ("a", 0L, 2L, 7L, 0L, 0.0),
      ("b", 0L, 1L, 7L, 0L, 0.0),
      ("b", 1L, 1L, 7L, 0L, 0.0),
      ("b", 2L, 1L, 5L, 1L, 1.0))
    got.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap shouldBe
      Map("a" -> 7L, "b" -> 19L)
    // matches the per-doc view's own numbers (one cumsum definition)
    val perDoc = TextAnalysis.packSequences(two, "id",
        TextAnalysis.whitespaceTokenCount(col("text")), "part", 7L)
      .agg(sum(col("n_tokens"))).as[Long].head()
    perDoc shouldBe 26L
  }
}
