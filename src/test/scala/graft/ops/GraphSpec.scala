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

  private def danglingRanks(edges: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] =
    Graph.pageRankDangling(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("pageRankDangling: hand-computed 2-node chain — the sink keeps " +
      "its place and its mass respreads") {
    // 1 -> 2, node 2 dangling; n=2, unit=1e6.
    // round 1: dt = score(2) = 1e6, share = 1e6 div 2 = 500000
    //   v1 = 150000 + 85*(0 + 500000) div 100       = 575000
    //   v2 = 150000 + 85*(1000000 + 500000) div 100 = 1425000
    // round 2: dt = 1425000, share = 712500
    //   v1 = 150000 + 85*712500 div 100            = 755625
    //   v2 = 150000 + 85*(575000 + 712500) div 100 = 1244375
    danglingRanks(Seq((1L, 2L)), iters = 2) shouldBe
      Map(1L -> 755625L, 2L -> 1244375L)
  }

  test("pageRankDangling: on a graph where every node has an out-edge " +
      "AND an in-edge it degenerates to pageRankFixed exactly") {
    val sym = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    danglingRanks(sym, iters = 2) shouldBe ranks(Seq((1L, 2L), (2L, 3L)), 2)
  }

  test("pageRankDangling matches an in-memory integer reference on " +
      "seeded random DIRECTED graphs (dangling + no-in-edge nodes kept)") {
    def reference(edges: Set[(Long, Long)], iters: Int): Map[Long, Long] = {
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSeq.sorted
      val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
      val n = nodes.size.toLong
      var score = nodes.map(_ -> 1000000L).toMap
      for (_ <- 1 to iters) {
        val dt = nodes.filterNot(out.contains).map(score).sum
        val in = edges.groupBy(_._2).map { case (dst, es) =>
          dst -> es.toSeq.map { case (s, _) => score(s) / out(s) }.sum
        }
        score = nodes.map(v =>
          v -> (150000L +
            85L * (in.getOrElse(v, 0L) + dt / n) / 100L)).toMap
      }
      score
    }
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 5) {
      val n = 3 + rnd.nextInt(8)
      // directed, NOT symmetrized: dangling and source-only nodes occur
      val es = Seq.fill(n * 2)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).toSet
      danglingRanks(es.toSeq, iters = 3) shouldBe reference(es, 3)
    }
  }

  test("pageRankWarmStart: resuming from a stored k-round table for j " +
      "more rounds EQUALS k+j rounds in one go (exact round " +
      "composition); an empty prior degenerates to the cold start; " +
      "unknown nodes seed at the uniform unit") {
    val rnd = new scala.util.Random(7)
    val n = 9
    val es = Seq.fill(n * 2)(
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).toSet.toSeq
    val edges = es.toDF("src", "dst")
    def warm(e: org.apache.spark.sql.DataFrame,
        prior: org.apache.spark.sql.DataFrame, iters: Int) =
      Graph.pageRankWarmStart(e, "src", "dst", prior, "node", "score",
        iters).as[(Long, Long)].collect().toMap
    val stored = Graph.pageRankDangling(edges, "src", "dst", iters = 2)
    warm(edges, stored, 3) shouldBe danglingRanks(es, iters = 5)
    // empty prior: every node falls back to unit — the cold start
    val empty = Seq.empty[(Long, Long)].toDF("node", "score")
    warm(edges, empty, 3) shouldBe danglingRanks(es, iters = 3)
    // a delta that adds a NEW node: the stored table doesn't know it,
    // so it seeds at unit while known nodes keep their stored scores —
    // pin via one hand-checkable round on the 2-node chain + new node
    val grown = Seq((1L, 2L), (2L, 99L)).toDF("src", "dst")
    val prior12 = Seq((1L, 755625L), (2L, 1244375L)).toDF("node", "score")
    // round 1 on the grown chain (n=3): dangling = {99} with score 1e6
    //   dt = 1000000, share = 333333
    //   v1  = 150000 + 85*333333 div 100                    = 433333
    //   v2  = 150000 + 85*(755625 + 333333) div 100         = 1075614
    //   v99 = 150000 + 85*(1244375 + 333333) div 100        = 1491051
    warm(grown, prior12, 1) shouldBe
      Map(1L -> 433333L, 2L -> 1075614L, 99L -> 1491051L)
  }

  test("prGraph + pageRankDanglingOn/pageRankWarmStartOn: the shared-" +
      "setup variants are BIT-IDENTICAL to the standalone ones — one " +
      "PrGraph feeds several chains (the q_pagerank_incr shape); a " +
      "weighted graph is rejected by the unweighted round bodies") {
    val rnd = new scala.util.Random(19)
    val es = Seq.fill(20)(
      (rnd.nextInt(9).toLong, rnd.nextInt(9).toLong)).toSet.toSeq
    val edges = es.toDF("src", "dst")
    val g = Graph.prGraph(edges, "src", "dst")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().toMap
    m(Graph.pageRankDanglingOn(g, iters = 3)) shouldBe
      m(Graph.pageRankDangling(edges, "src", "dst", iters = 3))
    val stored = Graph.pageRankDangling(edges, "src", "dst", iters = 2)
    m(Graph.pageRankWarmStartOn(g, stored, "node", "score", iters = 3)) shouldBe
      m(Graph.pageRankWarmStart(edges, "src", "dst", stored,
        "node", "score", iters = 3))
    // the composition law holds THROUGH the shared graph: 2 stored + 3
    // warm rounds on one PrGraph == 5 one-shot rounds on it
    m(Graph.pageRankWarmStartOn(g,
      Graph.pageRankDanglingOn(g, iters = 2), "node", "score",
      iters = 3)) shouldBe m(Graph.pageRankDanglingOn(g, iters = 5))
    val wg = Graph.prGraph(
      es.map(e => (e._1, e._2, 2L)).toDF("src", "dst", "w"),
      "src", "dst", weightCol = Some("w"))
    an[IllegalArgumentException] should be thrownBy
      Graph.pageRankDanglingOn(wg, iters = 1)
    an[IllegalArgumentException] should be thrownBy
      Graph.pageRankWarmStartOn(wg, stored, "node", "score", iters = 1)
  }

  test("pageRankPersonalized matches an in-memory integer reference on " +
      "seeded random directed graphs; seed proximity beats the uniform " +
      "jump ordering") {
    def pprRanks(edges: Seq[(Long, Long)], seeds: Seq[Long],
        iters: Int): Map[Long, Long] =
      Graph.pageRankPersonalized(edges.toDF("src", "dst"), "src", "dst",
        seeds, iters).as[(Long, Long)].collect().toMap
    def reference(edges: Set[(Long, Long)], seeds: Seq[Long],
        iters: Int): Map[Long, Long] = {
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSeq.sorted
      val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
      val n = nodes.size.toLong
      val k = seeds.length.toLong
      val sb = (n * 1000000L - (n * 1000000L * 85L) / 100L) / k
      var score = nodes.map(_ -> 1000000L).toMap
      for (_ <- 1 to iters) {
        val dt = nodes.filterNot(out.contains).map(score).sum
        val in = edges.groupBy(_._2).map { case (dst, es) =>
          dst -> es.toSeq.map { case (s, _) => score(s) / out(s) }.sum
        }
        score = nodes.map { v =>
          val isSeed = seeds.contains(v)
          v -> ((if (isSeed) sb else 0L) +
            85L * (in.getOrElse(v, 0L) +
              (if (isSeed) dt / k else 0L)) / 100L)
        }.toMap
      }
      score
    }
    val rnd = new scala.util.Random(29)
    for (_ <- 1 to 5) {
      val n = 4 + rnd.nextInt(7)
      val es = Seq.fill(n * 2)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).toSet
      val nodes = (es.map(_._1) ++ es.map(_._2)).toSeq.sorted
      val seeds = nodes.take(1 + rnd.nextInt(2))
      pprRanks(es.toSeq, seeds, iters = 3) shouldBe reference(es, seeds, 3)
    }
    // proximity semantics: on a two-hub star (1 and 4 both fed by
    // leaves), personalizing on hub 1's side lifts hub 1 over hub 4
    // even though their in-degrees match
    val star = Seq((2L, 1L), (3L, 1L), (5L, 4L), (6L, 4L))
    val p = pprRanks(star, seeds = Seq(2L, 3L), iters = 3)
    p(1L) should be > p(4L)
  }

  test("pageRankDangling conserves total mass up to documented integer " +
      "rounding (< n units per round + damping truncation)") {
    // DAG: 1->3, 2->3, 3 dangling; total starts at 3e6 and must stay
    // within iters * (n + damping-truncation) units of it.
    val got = danglingRanks(Seq((1L, 3L), (2L, 3L)), iters = 4)
    val total = got.values.sum
    (3000000L - total) should be >= 0L
    (3000000L - total) should be < 4L * 10L
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

  test("pageRankWeighted: all-equal weights reproduce pageRankDangling " +
      "BIT-FOR-BIT; skewed weights redirect the mass") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
    def scores(df: org.apache.spark.sql.DataFrame,
        weighted: Boolean): Map[Long, Long] = {
      val out =
        if (weighted) Graph.pageRankWeighted(df, "src", "dst", "w", iters = 4)
        else Graph.pageRankDangling(df.drop("w"), "src", "dst", iters = 4)
      out.as[(Long, Long)].collect().toMap
    }
    // w = 1 everywhere: (score * 1) div wsum == score div outdeg, and
    // the weighted prelude's sum(w) == count — outputs must be equal
    val flat = edges.map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "w")
    scores(flat, weighted = true) shouldBe scores(flat, weighted = false)
    // 9:1 skew on node 1's out-edges: node 2 now inherits ~90% of 1's
    // walk mass; unweighted, 2 and 3 are symmetric and tie
    val skew = Seq((1L, 2L, 9L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val un = scores(skew, weighted = false)
    un(2L) shouldBe un(3L)
    val w = scores(skew, weighted = true)
    w(2L) should be > w(3L)
    // duplicate weighted edges SUM: (1->2 w=4) + (1->2 w=5) == w=9
    val dup = Seq((1L, 2L, 4L), (1L, 2L, 5L), (1L, 3L, 1L),
      (2L, 1L, 1L), (3L, 1L, 1L)).toDF("src", "dst", "w")
    scores(dup, weighted = true) shouldBe w
    // a non-positive weight fails LOUDLY with the edge named, instead
    // of silently corrupting every score it touches
    val bad = Seq((1L, 2L, 0L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    val ex = intercept[Exception](scores(bad, weighted = true))
    (ex.getMessage + Option(ex.getCause).map(_.getMessage).mkString) should
      include("non-positive")
  }

  private def lpa(edges: Seq[(Long, Long)], seeds: Seq[(Long, String)],
      iters: Int): Map[Long, Option[String]] = {
    import org.apache.spark.sql.functions.col
    Graph.labelPropagate(edges.toDF("src", "dst"), "src", "dst",
        seeds.toDF("id", "lab"), "id", "lab", iters)
      .select(col("id"), col("label"))
      .as[(Long, Option[String])].collect().toMap
  }

  test("labelPropagate: clamped seeds, deterministic tie-break to the " +
      "ascending label, frontier advances one hop per round") {
    // 1(a) -> 3 <- 2(b): tie at 3 resolves to 'a'
    // 1 -> 4 -> 5: chain reached at distance 2
    // 6 -> 1: labels flow src->dst, so 6 is never reached
    val edges = Seq((1L, 3L), (2L, 3L), (1L, 4L), (4L, 5L), (6L, 1L))
    val seeds = Seq((1L, "a"), (2L, "b"))
    val r1 = lpa(edges, seeds, iters = 1)
    r1(3L) shouldBe Some("a")   // tie {a, b} -> ascending label
    r1(4L) shouldBe Some("a")
    r1(5L) shouldBe None        // two hops away: not yet
    r1(6L) shouldBe None        // no in-edges from labeled nodes, ever
    r1(1L) shouldBe Some("a")   // seeds clamped
    r1(2L) shouldBe Some("b")
    val r2 = lpa(edges, seeds, iters = 2)
    r2(5L) shouldBe Some("a")   // frontier advanced
    r2(3L) shouldBe Some("a")   // stable under further rounds
    // majority beats the tie-break: give 3 a second 'b' voter
    val r3 = lpa(edges ++ Seq((7L, 3L)), seeds ++ Seq((7L, "b")), 1)
    r3(3L) shouldBe Some("b")
  }

  test("hits: hand-computed hubs/authorities — a chain middle node " +
      "carries BOTH roles; max-normalization and integer truncation " +
      "exact") {
    import org.apache.spark.sql.functions.col
    // 1 -> 2, 2 -> 3, 1 -> 4 at unit=100, one round:
    //   raw a: 2=100, 3=100, 4=100 (max 100) -> a = 100 each
    //   raw h: 1 = a(2)+a(4) = 200, 2 = a(3) = 100 (max 200)
    //   -> h(1)=100, h(2)=(100*100) div 200 = 50
    val out = Graph.hits(
        Seq((1L, 2L), (2L, 3L), (1L, 4L)).toDF("src", "dst"),
        "src", "dst", iters = 1, unit = 100L)
      .select(col("node"), col("hub"), col("authority"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    out shouldBe Seq(
      (1L, 100L, 0L),
      (2L, 50L, 100L), // both roles: bridge of the chain
      (3L, 0L, 100L),
      (4L, 0L, 100L))
  }

  test("hits: asymmetric bipartite graph — the denser hub wins after " +
      "two rounds, the weak hub's share truncates exactly") {
    import org.apache.spark.sql.functions.col
    // h1 -> {a1,a2,a3}, h2 -> {a2}; unit 100, 2 rounds (hand-derived):
    // r1: a=(50,100,50); h1=(50+100+50)=200 max -> h=(100,50)
    // r2: raw a: a1=100, a2=150, a3=100 (max 150) -> a=(66,100,66)
    //     raw h: h1=232, h2=100 -> h=(100, (100*100) div 232 = 43)
    val out = Graph.hits(
        Seq((1L, 11L), (1L, 12L), (1L, 13L), (2L, 12L)).toDF("src", "dst"),
        "src", "dst", iters = 2, unit = 100L)
      .select(col("node"), col("hub"), col("authority"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    out shouldBe Seq(
      (1L, 100L, 0L), (2L, 43L, 0L),
      (11L, 0L, 66L), (12L, 0L, 100L), (13L, 0L, 66L))
  }

  test("hits and labelPropagate are partition-invariant on a seeded " +
      "random graph (the family's determinism signature)") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(23)
    val edges = (0 until 400).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }.distinct
    val seeds = (0 until 8).map(i => (i.toLong, s"c${i % 3}"))
    def hitsRun(parts: Int) = Graph.hits(
        edges.toDF("src", "dst").repartition(parts), "src", "dst",
        iters = 3, unit = 1000L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    def lpaRun(parts: Int) = Graph.labelPropagate(
        edges.toDF("src", "dst").repartition(parts), "src", "dst",
        seeds.toDF("id", "lab"), "id", "lab", iters = 3)
      .select(col("id"), col("label"))
      .as[(Long, Option[String])].collect().sortBy(_._1).toSeq
    hitsRun(1) shouldBe hitsRun(13)
    lpaRun(1) shouldBe lpaRun(13)
  }

  test("labelPropagate rejects duplicate seed rows loudly") {
    val ex = intercept[Exception](
      lpa(Seq((1L, 2L)), Seq((1L, "a"), (1L, "b")), 1))
    (ex.getMessage + Option(ex.getCause).map(_.getMessage).mkString) should
      include("duplicate seed")
  }

  test("triangleStats: K4 + pendant — exact per-node triangle counts, " +
      "lcc, NULL on deg<2; dups/self-loops/reversed edges cleaned") {
    // K4 on {1,2,3,4} (4 triangles, each node in 3) + pendant 5-1.
    // Input deliberately messy: a duplicate, a reversed orientation,
    // and a self-loop — all must collapse to the canonical edge set.
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 2L), // one canonical edge
      (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 3L),                     // self-loop: dropped
      (5L, 1L))
      .toDF("src", "dst")
    val out = Graph.triangleStats(edges, "src", "dst")
      .select("v", "deg", "n_tri", "lcc")
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    out shouldBe Seq(
      (1L, 4L, 3L, Some(0.5)), // 2*3 / (4*3)
      (2L, 3L, 3L, Some(1.0)),
      (3L, 3L, 3L, Some(1.0)),
      (4L, 3L, 3L, Some(1.0)),
      (5L, 1L, 0L, None))      // pendant: undefined, not 0
    // total triangle incidences = 3 * #triangles
    out.map(_._3).sum shouldBe 3L * 4L
  }

  test("kCore: multi-round cascade peel — triangle+chain at k=2 drops " +
      "the chain in two rounds, k=3 dissolves everything; messy input " +
      "cleaned; k=1 keeps all non-isolated nodes") {
    // triangle {1,2,3} + chain 3-4-5; input has a dup, a reversed
    // orientation, and a self-loop
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (2L, 3L), (2L, 3L),
      (3L, 4L), (4L, 5L), (5L, 5L))
      .toDF("src", "dst")
    def run(k: Int): Seq[(Long, Long)] =
      Graph.kCore(edges, "src", "dst", k)
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    // k=2 cascade: round 1 peels 5 (deg 1); round 2 peels 4 (its deg
    // FELL to 1 when 5 left); the triangle is the 2-core.
    run(2) shouldBe Seq((1L, 2L), (2L, 2L), (3L, 2L))
    run(3) shouldBe Seq.empty // triangle degrees are 2 < 3
    run(1) shouldBe Seq((1L, 2L), (2L, 2L), (3L, 3L), (4L, 2L), (5L, 1L))
    intercept[IllegalArgumentException] {
      Graph.kCore(edges, "src", "dst", 0)
    }.getMessage should include("k must be >= 1")
  }

  test("coreness: full decomposition on triangle+chain+K4 recovers the " +
      "known core numbers; phase jumps credit the d-core wholesale; " +
      "messy input cleaned; empty input yields an empty frame") {
    // triangle {1,2,3} (core 2), chain 3-4-5 (4, 5 core 1), and a
    // disjoint K4 {6,7,8,9} (core 3); input has a dup, a reversed
    // orientation, and a self-loop
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (2L, 3L), (2L, 3L),
      (3L, 4L), (4L, 5L), (5L, 5L),
      (6L, 7L), (6L, 8L), (6L, 9L), (7L, 8L), (7L, 9L), (8L, 9L))
      .toDF("src", "dst")
    Graph.coreness(edges, "src", "dst")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq shouldBe Seq(
      (1L, 2L), (2L, 2L), (3L, 2L), (4L, 1L), (5L, 1L),
      (6L, 3L), (7L, 3L), (8L, 3L), (9L, 3L))
    // consistency with the fixed-k gate: {v : coreness >= k} == kCore(k)
    import org.apache.spark.sql.functions.{col => c, lit => l}
    val byCore = Graph.coreness(edges, "src", "dst")
      .where(c("coreness") >= 2).select(c("v"))
      .as[Long].collect().sorted.toSeq
    byCore shouldBe Graph.kCore(edges, "src", "dst", 2)
      .select(c("v")).as[Long].collect().sorted.toSeq
    Graph.coreness(edges.where(l(false)), "src", "dst")
      .collect() shouldBe empty
  }

  test("corenessGate: keeps exactly the topN densest members with " +
      "(coreness DESC, node ASC) tie-break, attaches coreness, and " +
      "drops items outside the graph (allowlist)") {
    // K4 {6,7,8,9} core 3, triangle {1,2,3} core 2, chain tail {4,5}
    // core 1; item 99 has no edges at all
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
      (6L, 7L), (6L, 8L), (6L, 9L), (7L, 8L), (7L, 9L), (8L, 9L))
      .toDF("src", "dst")
    val items = (1L to 9L).map(i => (i, s"item$i")).toDF("id", "name")
      .unionAll(Seq((99L, "orphan")).toDF("id", "name"))
    def run(n: Int): Seq[(Long, String, Long)] =
      Graph.corenessGate(items, "id", edges, "src", "dst", topN = n)
        .select("id", "name", "coreness")
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    // top 5: the K4 (coreness 3) then node 1 (first coreness-2 node)
    run(5) shouldBe Seq((1L, "item1", 2L), (6L, "item6", 3L),
      (7L, "item7", 3L), (8L, "item8", 3L), (9L, "item9", 3L))
    // topN beyond the graph keeps every ranked node, never the orphan
    run(100).map(_._1) shouldBe (1L to 9L)
    an[IllegalArgumentException] should be thrownBy
      Graph.corenessGate(items, "id", edges, "src", "dst", topN = 0)
  }

  test("kTruss: K4 + hanging triangle at k=4 peels the triangle and " +
      "emits the FIXPOINT support (3-4 drops from 3 to 2); k=3 keeps " +
      "everything with initial supports; k=5 dissolves all") {
    // K4 on {1,2,3,4} + vertex 5 closing triangle {3,4,5}; edge 3-4
    // starts at support 3 (two K4 triangles + 3-4-5). Messy input:
    // dup, reversed, self-loop.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 3L), (3L, 4L), (5L, 3L), (4L, 5L), (1L, 1L))
      .toDF("src", "dst")
    def run(k: Int): Seq[(Long, Long, Long)] =
      Graph.kTruss(edges, "src", "dst", k)
        .as[(Long, Long, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    // k=4: 3-5/4-5 peel (support 1 < 2); 3-4's support RECOUNTS to 2
    run(4) shouldBe Seq(
      (1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 2L))
    // k=3: every edge closes >= 1 triangle; supports are the originals
    run(3) shouldBe Seq(
      (1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 3L),
      (3L, 5L, 1L), (4L, 5L, 1L))
    run(5) shouldBe Seq.empty // K4 supports cap at 2 < 3
    intercept[IllegalArgumentException] {
      Graph.kTruss(edges, "src", "dst", 2)
    }.getMessage should include("k must be >= 3")
  }

  test("linkPrediction: hand-computed path graph — RA/Jaccard fixed-" +
      "point, tie-break order, k cutoff") {
    // path 1-2-3-4-5: deg(1)=deg(5)=1, deg(2)=deg(3)=deg(4)=2.
    // Wedge pairs (all non-edges): (1,3) thru 2, (2,4) thru 3,
    // (3,5) thru 4 — every through-vertex has deg 2, so
    // ra_fp = 2^40 div 2 = 549755813888 for all three; ties resolve
    // by (a, b) ascending. jac_fp = cn*2^20 div (da+db-cn):
    // (1,3): 1048576 div (1+2-1) = 524288
    // (2,4): 1048576 div (2+2-1) = 349525 (truncated)
    // (3,5): 1048576 div (2+1-1) = 524288
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    def run(k: Int): Seq[(Long, Long, Long, Long, Long, Long, Long)] =
      Graph.linkPrediction(edges, "src", "dst", k)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    run(10) shouldBe Seq(
      (1L, 3L, 1L, 549755813888L, 524288L, 1L, 2L),
      (2L, 4L, 1L, 549755813888L, 349525L, 2L, 2L),
      (3L, 5L, 1L, 549755813888L, 524288L, 2L, 1L))
    run(2) shouldBe Seq(
      (1L, 3L, 1L, 549755813888L, 524288L, 1L, 2L),
      (2L, 4L, 1L, 549755813888L, 349525L, 2L, 2L))
  }

  test("linkPrediction: existing edges are excluded, cn accumulates " +
      "over multiple common neighbors, maxThruDeg drops hub wedges") {
    // square 1-2-3-4-1: the two diagonals each have TWO common
    // neighbors -> cn=2, ra_fp = 2*(2^40 div 2) = 2^40, and no
    // adjacent pair appears (all share no common neighbor... the
    // square's edges (1,2) etc. have none; the diagonals are
    // non-edges).
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    Graph.linkPrediction(square, "src", "dst", 10)
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq shouldBe Seq(
        (1L, 3L, 2L, 1099511627776L, 1048576L, 2L, 2L),
        (2L, 4L, 2L, 1099511627776L, 1048576L, 2L, 2L))
    // star 1-{2,3,4}: leaves pair up thru the hub (deg 3) —
    // ra_fp = 2^40 div 3; capping the through role below 3 empties
    // the result (leaves keep their endpoint role, but no wedges).
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    Graph.linkPrediction(star, "src", "dst", 10)
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq shouldBe Seq(
        (2L, 3L, 1L, 366503875925L, 1048576L, 1L, 1L),
        (2L, 4L, 1L, 366503875925L, 1048576L, 1L, 1L),
        (3L, 4L, 1L, 366503875925L, 1048576L, 1L, 1L))
    Graph.linkPrediction(star, "src", "dst", 10, maxThruDeg = 2)
      .collect() shouldBe empty
  }

  test("multiSourceShortestPaths: hand-computed weighted relaxation — " +
      "a cheap long path beats an expensive direct edge, multi-source " +
      "nearest-seed, duplicate-edge min cost, loud guards") {
    def sp(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
        maxIters: Int = 50): Seq[(Long, Long)] =
      Graph.multiSourceShortestPaths(edges.toDF("s", "d", "w"),
          "s", "d", "w", seeds, maxIters)
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    // 1-2(1), 2-4(1), 1-3(5), 3-4(1): the 3-edge path 1-2-4-3 (cost 3)
    // beats the direct 1-3 edge (cost 5) — needs THREE relaxation
    // rounds, the Bellman-Ford point
    val sq = Seq((1L, 2L, 1L), (2L, 4L, 1L), (1L, 3L, 5L), (3L, 4L, 1L))
    sp(sq, Seq(1L)) shouldBe Seq((1L, 0L), (2L, 1L), (3L, 3L), (4L, 2L))
    // multi-source: every vertex reports its NEAREST seed's distance
    sp(sq, Seq(1L, 3L)) shouldBe
      Seq((1L, 0L), (2L, 1L), (3L, 0L), (4L, 1L))
    // disconnected vertices never appear; seeds always do (dist 0)
    sp(Seq((1L, 2L, 7L), (8L, 9L, 1L)), Seq(1L)) shouldBe
      Seq((1L, 0L), (2L, 7L))
    // duplicate edges keep the MIN cost
    sp(Seq((1L, 2L, 9L), (2L, 1L, 3L)), Seq(1L)) shouldBe
      Seq((1L, 0L), (2L, 3L))
    // non-positive weights refuse loudly
    val e = intercept[Exception](
      sp(Seq((1L, 2L, 0L)), Seq(1L)))
    (e.getMessage + Option(e.getCause).map(_.getMessage).mkString) should
      include("positive")
    // maxIters refusal when the cascade still improves
    intercept[IllegalStateException](
      sp(Seq((1L, 2L, 1L), (2L, 3L, 1L)), Seq(1L), maxIters = 1))
      .getMessage should include("no fixpoint")
  }

  test("modularity: hand-computed barbell — two triangles bridged; " +
      "single-community zero; unlabeled vertices drop") {
    // triangles {1,2,3} and {4,5,6} + bridge (3,4): m=7,
    // d_A = 2+2+3 = 7 = d_B, m_A = m_B = 3 intra edges.
    // sum_dc=14 sum_mc=6 sum_dc2=98: q_num = 2*14*6-98 = 70,
    // q_den = 196, Q = 70/196 = 5/14.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val comm2 = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"),
      (5L, "B"), (6L, "B")).toDF("v", "c")
    Graph.modularity(edges, "src", "dst", comm2, "v", "c")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq shouldBe
      Seq((2L, 7L, 70L, 196L, 70.0 / 196.0))
    // everything in ONE community: Q = m/m - 1 = 0 exactly
    val comm1 = (1L to 6L).map((_, "all")).toDF("v", "c")
    Graph.modularity(edges, "src", "dst", comm1, "v", "c")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq shouldBe
      Seq((1L, 7L, 0L, 196L, 0.0))
    // vertex 7 hangs off 1 but is UNLABELED: edge (1,7) leaves the
    // labeled graph entirely — same Q as without it
    val edges7 = edges.union(Seq((1L, 7L)).toDF("src", "dst"))
    Graph.modularity(edges7, "src", "dst", comm2, "v", "c")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq shouldBe
      Seq((2L, 7L, 70L, 196L, 70.0 / 196.0))
  }
}
