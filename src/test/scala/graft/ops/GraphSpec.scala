package graft.ops

import graft.SparkSpecBase
import org.scalatest.matchers.should.Matchers

class GraphSpec extends SparkSpecBase with Matchers {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int,
      checkpointDir: Option[String] = None): Map[Long, Long] = {
    // symmetrize: pageRankFixed requires every node to appear as src
    val sym = edges ++ edges.map { case (a, b) => (b, a) }
    Graph.pageRankFixed(sym.toDF("src", "dst"), "src", "dst", iters,
      checkpointDir = checkpointDir)
      .as[(Long, Long)].collect().toMap
  }

  test("pageRankFixed: hand-computed path graph, two rounds, exact " +
      "integer scores") {
    // 1 - 2 - 3 (undirected): deg(2)=2, deg(1)=deg(3)=1, unit=1e6
    // round 1: v2 = 150000 + 85*(1e6 + 1e6) div 100      = 1_850_000
    //          v1 = v3 = 150000 + 85*(1e6 div 2) div 100 =   575_000
    // round 2: v2 = 150000 + 85*(575000*2) div 100       = 1_127_500
    //          v1 = v3 = 150000 + 85*(1850000 div 2) div 100 = 936_250
    ranks(Seq((1L, 2L), (2L, 3L)), iters = 2) shouldBe
      Map(1L -> 936250L, 2L -> 1127500L, 3L -> 936250L)
  }

  test("pageRankFixed: star graph exercises BOTH truncating divisions " +
      "(score div outdeg and the damping div)") {
    // hub 1 - {2,3,4}: leaves get 1e6 div 3 = 333333 (truncated), then
    // 150000 + (85 * 333333) div 100 = 150000 + 283333 (28333305 div
    // 100 truncates) = 433333; hub gets 150000 + 85*3e6 div 100.
    ranks(Seq((1L, 2L), (1L, 3L), (1L, 4L)), iters = 1) shouldBe
      Map(1L -> 2700000L, 2L -> 433333L, 3L -> 433333L, 4L -> 433333L)
  }

  test("pageRankFixed matches an in-memory integer reference on seeded " +
      "random graphs (exact equality — the point of fixed-point PR)") {
    def reference(edges: Set[(Long, Long)], iters: Int): Map[Long, Long] = {
      val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
      var score = edges.map(_._1).map(_ -> 1000000L).toMap
      for (_ <- 1 to iters) {
        score = edges.groupBy(_._2).map { case (dst, es) =>
          dst -> (150000L +
            85L * es.toSeq.map { case (s, _) => score(s) / out(s) }.sum / 100L)
        }
      }
      score
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val n = 3 + rnd.nextInt(8)
      val raw = Seq.fill(n * 2)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val sym = (raw ++ raw.map(_.swap)).toSet
      val got = Graph.pageRankFixed(sym.toSeq.toDF("src", "dst"),
        "src", "dst", iters = 3).as[(Long, Long)].collect().toMap
      got shouldBe reference(sym, 3)
    }
  }

  test("pageRankFixed: duplicate edges collapse; reliable-checkpoint " +
      "variant is score-identical (durability knob, not semantics)") {
    val dup = Seq((1L, 2L), (1L, 2L), (2L, 3L))
    val dir = java.nio.file.Files.createTempDirectory("graft-pr-ckpt")
      .toString
    val local = ranks(dup, iters = 2)
    local shouldBe Map(1L -> 936250L, 2L -> 1127500L, 3L -> 936250L)
    ranks(dup, iters = 2, checkpointDir = Some(dir)) shouldBe local
  }
}
