package graft.ops

import graft.SparkSpecBase

/** r21 loop-storage discipline (VERDICT r20 item 1): every iterative
  * op pins a frame per round via localCheckpoint, and before r21 the
  * superseded rounds' blocks lived until a driver GC happened to
  * collect the replaced handles (ContextCleaner) — O(rounds)
  * node-frame copies in the block store, unbounded in practice inside
  * one long loop. Each loop now releases round R−1's pin the moment
  * round R's eager pin lands, so the number of LIVE pinned frames at
  * any point DURING the loop must be a small constant, independent of
  * round count — which is what these tests assert, on inputs chosen to
  * force DEEP cascades (a path graph peels one layer per round).
  *
  * Measurement is GC- and parallel-suite-robust by construction:
  * pins carry a "graftpin-t<threadId>" RDD name stamped by
  * localCheckpointBounded, so only THIS test's pins count (sbt runs
  * suites concurrently on the shared session), and the metric is the
  * MAX live count observed at job boundaries mid-run — a concurrent
  * ContextCleaner sweep can only lower it, never inflate it, while the
  * pre-r21 leak (two pins per round, never released) blows past every
  * bound within a few rounds regardless of GC. */
class PinReleaseSpec extends SparkSpecBase {
  import spark.implicits._

  /** Max number of this thread's live pinned RDDs observed at any job
    * start while `body` runs (body must materialize its result). */
  private def maxLivePins(body: => Unit): Int = {
    val sc = spark.sparkContext
    val tag = s"graftpin-t${Thread.currentThread().getId}"
    val max = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val live = sc.getPersistentRDDs.values.count(_.name == tag)
        max.getAndAccumulate(live, math.max(_, _))
      }
    }
    sc.addSparkListener(listener)
    try {
      body
      // let the queued job-start events drain before reading the max
      Thread.sleep(500)
    } finally sc.removeSparkListener(listener)
    // clean this thread's leftovers so later tests start from zero
    sc.getPersistentRDDs.values.filter(_.name == tag)
      .foreach(_.unpersist(blocking = false))
    max.get()
  }

  private def pathEdges(n: Int): Seq[(Long, Long)] =
    (0L until n - 1L).map(i => (i, i + 1))

  test("kCore: live pins stay O(1) over a deep peel (path graph peels " +
      "one layer per round — pre-r21 this held 2 pins PER ROUND)") {
    val m = maxLivePins {
      Graph.kCore(pathEdges(32).toDF("src", "dst"), "src", "dst", k = 2)
        .collect()
    }
    assert(m > 0 && m <= 6, s"kCore live pins peaked at $m")
  }

  test("coreness: live pins stay O(1) over a deep peel") {
    val m = maxLivePins {
      Graph.coreness(pathEdges(32).toDF("src", "dst"), "src", "dst")
        .collect()
    }
    assert(m > 0 && m <= 8, s"coreness live pins peaked at $m")
  }

  test("kTruss: live pins stay O(1) over the peel cascade") {
    // K4 + a hanging triangle at k=4: the triangle peels, K4 survives
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L)).toDF("src", "dst")
    val m = maxLivePins {
      Graph.kTruss(edges, "src", "dst", k = 4).collect()
    }
    assert(m > 0 && m <= 5, s"kTruss live pins peaked at $m")
  }

  test("multiSourceShortestPaths: live pins stay O(1) over a deep " +
      "relaxation (path graph relaxes one hop per round)") {
    val m = maxLivePins {
      Graph.multiSourceShortestPaths(
        pathEdges(24).toDF("src", "dst").withColumn("w",
          org.apache.spark.sql.functions.lit(1L)),
        "src", "dst", "w", seeds = Seq(0L)).collect()
    }
    assert(m > 0 && m <= 5, s"SSSP live pins peaked at $m")
  }

  test("pageRankDangling / labelPropagate / hits: live pins stay O(1) " +
      "in iteration count") {
    val edges = pathEdges(10).toDF("src", "dst")
    val pr = maxLivePins {
      Graph.pageRankDangling(edges, "src", "dst", iters = 12).collect()
    }
    assert(pr > 0 && pr <= 6, s"pageRankDangling live pins peaked at $pr")
    val seeds = Seq((0L, "x")).toDF("id", "lab")
    val lp = maxLivePins {
      Graph.labelPropagate(edges, "src", "dst", seeds, "id", "lab",
        iters = 9).collect()
    }
    assert(lp > 0 && lp <= 5, s"labelPropagate live pins peaked at $lp")
    val hi = maxLivePins {
      Graph.hits(edges, "src", "dst", iters = 8).collect()
    }
    assert(hi > 0 && hi <= 7, s"hits live pins peaked at $hi")
  }

  test("nearDupClusters: live pins stay O(1) over a deep propagation " +
      "(a long pair chain needs multiple jump rounds)") {
    val m = maxLivePins {
      Dedup.nearDupClusters(
        (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b"))
        .collect()
    }
    assert(m > 0 && m <= 6, s"nearDupClusters live pins peaked at $m")
  }

  test("bpeMerges: live pins stay O(1) in round count") {
    val corpus = Seq("low lower lowest", "new newer newest",
      "wide wider widest").toDF("text")
    val m = maxLivePins {
      Tokenizer.bpeMerges(corpus, "text", rounds = 12).collect()
    }
    assert(m > 0 && m <= 4, s"bpeMerges live pins peaked at $m")
  }
}
