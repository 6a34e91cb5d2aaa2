package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: headline queries on SPARK_GRAFT_SF_DIR, one
  * JSON result line. Each query is forced through the `noop` sink so
  * every output column is actually computed (a bare `count()` would let
  * the optimizer prune the projections being measured).
  *
  * Timing honesty: the FIRST measured run of each query includes that
  * query's Catalyst planning and Janino/whole-stage-codegen compilation
  * (one untimed run of the first query pays only the generic JVM/session
  * warm-up). The headline `value`/`queries` therefore report the COLD
  * cost — what a fresh job pays. Cold is unrepeatable inside one JVM
  * (after the first run the plan/codegen/JIT caches are warm by
  * definition), so it is a single pass; a `cold_suspect` list flags
  * entries whose cold time exceeds 3x their warm median by >2s — the
  * signature of a co-tenant stall, not a plan cost.
  *
  * Noise control (this sandbox is co-tenant; a loaded neighbor inflated
  * one recorded warm entry 40x in round 5, and in round 6 two of three
  * warm passes stalled at loadavg 2.8 — a median cannot survive that):
  * the warm regime runs THREE full passes plus TWO extra passes over
  * the sub-second queries (relative jitter hits those hardest and they
  * are cheap — min-of-5 for them, min-of-3 for the rest) and reports
  * the per-query MIN as
  * `queries_warm` (co-tenant noise is strictly additive, so min is the
  * honest warm estimator; the headline `total_warm` sums it), the
  * per-query MEDIAN as `queries_warm_median`, the raw passes as
  * `warm_passes`, and the per-query MIN-REPRODUCIBILITY
  * `(secondFastest-fastest)/median` as `warm_spread` (the reported
  * warm value is the min, so its trust signal is whether another pass
  * reproduced it — slow-tail scatter is the stall mass min-of-N
  * already discards); queries whose spread exceeds 30% are listed in
  * `noisy_warm` so an outlier is visible in the artifact itself instead
  * of silently poisoning the round's numbers. `loadavg` records the
  * 1-minute load before the run and after every pass.
  *
  * Output: the FULL diagnostic JSON line first, then a COMPACT headline
  * line (cold/warm totals + per-query cold and warm-min, ms precision;
  * also persisted to target/bench_headline.json), then — absolutely
  * last — an ultra-compact integer-ms warm line sized to survive a
  * caller keeping only the final few KB of stdout. */
object Bench {

  /** Machine-detectable board pollution (round-19 delivery): a board
    * is DEGRADED when any 1-minute loadavg sample taken around the
    * passes exceeds `cpus / 8` — the round-18 polluted pair ran at
    * loadavg 4.5-6.3 on 32 cpus (threshold 4.0) while clean boards sat
    * near 2, so the stamp separates them with margin on both sides.
    * Failed samples (-1 sentinel from an unreadable /proc/loadavg)
    * are ignored: an unreadable load file is not evidence of load.
    * The stamp rides IN the artifact so a polluted board no longer
    * depends on a commit message for its own adjudication. */
  def isDegraded(loads: Seq[Double], cpus: Int): Boolean =
    loads.filter(_ >= 0).exists(_ > cpus / 8.0)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      // Clock starts BEFORE query construction: for most queries that is
      // pure plan building (~ms), but e.g. q_ann_ivf runs its k-means
      // training jobs during construction and those belong in the bill.
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // UNTIMED cleanup: iterative ops (PageRank, cluster dedup, CDC
      // merge) pin frames via localCheckpoint, and those blocks outlive
      // the query in this single shared JVM — 84 queries x 4 passes of
      // accumulation is storage the next query's bill shouldn't carry.
      // Each query is billed from a clean block store, the honest model
      // of a real cluster where a job's executors release on exit.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      dt
    }
    // ms precision: sub-millisecond digits are pure noise on a co-tenant
    // box, and the shorter numbers keep the 160-query headline small
    // enough to survive the driver's bounded tail capture (round 13 lost
    // warm timings for ~100 queries to truncation of full-precision
    // doubles).
    def fmt(results: Seq[(String, Double)]): String =
      results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
    def total(results: Seq[(String, Double)]): Double =
      results.map(_._2).filter(_ >= 0).sum
    def loadAvg(): Double =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }

    // Remove any previous run's headline up front: if this run dies or
    // its write fails, a caller must find NO file rather than silently
    // reading a stale round's numbers as this run's result.
    val headlinePath = java.nio.file.Paths.get("target", "bench_headline.json")
    try java.nio.file.Files.deleteIfExists(headlinePath)
    catch { case _: java.io.IOException => () }

    val loads = scala.collection.mutable.ArrayBuffer(loadAvg())
    val names = SparkEntry.benchQueries.filter(SparkEntry.queries.contains)
    // Generic JVM/session/parquet warm-up OUTSIDE the bench set, so no
    // measured query's own plan gets pre-compiled (warming names.head
    // would make its "cold" entry secretly warm). Every registered
    // query is benched now, so the warm-up is a bare scan-count — it
    // spins up the JVM, session, codegen, and parquet reader without
    // planning any benched projection/aggregate.
    try spark.read.parquet(s"$sfDir/events.parquet").count()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warm-up scan failed: ${e.getMessage}")
    }
    val cold = names.map(n => n -> run(n))
    loads += loadAvg()
    val mainPasses = (1 to 3).map { _ =>
      val p = names.map(n => n -> run(n))
      loads += loadAvg()
      p
    }
    def median(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.sorted.apply(ok.length / 2)
    }
    def minOk(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.min
    }
    // Sub-second queries are the ones co-tenant jitter distorts most
    // in RELATIVE terms (a 200ms stall is 40% of a 0.5s query, noise
    // on a 5s one) — and they are cheap to re-measure. Two extra
    // passes over just those: min-of-5 for the small rows, min-of-3
    // for the rest, at a bounded wall cost (< 2x the sub-second part
    // of one pass).
    val subSecond = names.filter { n =>
      val m = median(mainPasses.map(_.toMap.apply(n)))
      m >= 0 && m < 1.0
    }
    val extraPasses = (1 to 2).map { _ =>
      val p = subSecond.map(n => n -> run(n))
      loads += loadAvg()
      p
    }
    val warmPasses = mainPasses ++ extraPasses
    def samples(n: String): Seq[Double] =
      warmPasses.flatMap(_.toMap.get(n))
    // min over passes: co-tenant noise only ever ADDS time, so the
    // fastest observed pass is the least-contaminated warm estimate
    // (round 6's recorded median was poisoned by two stalled passes).
    val warm = names.map(n => n -> minOk(samples(n)))
    val warmMedian = names.map(n => n -> median(samples(n)))
    val warmMap = warm.toMap
    val medianMap = warmMedian.toMap
    // warm_spread measures the MIN ESTIMATOR's reproducibility — the
    // gap between the two fastest passes, relative to the median — not
    // the total pass scatter: the reported warm value IS the min, so
    // what matters is whether a second pass reproduced it; scatter in
    // the slow tail is exactly the co-tenant stall mass the min
    // already discards, and flagging it re-admitted the noise the
    // min-of-N design exists to reject.
    val spread = names.map { n =>
      val ok = samples(n).filter(_ >= 0).sorted
      val m = medianMap(n)
      n -> (if (ok.size < 2 || m <= 0) -1.0 else (ok(1) - ok(0)) / m)
    }
    def quote(ns: Seq[String]): String = ns.map("\"" + _ + "\"").mkString("[", ",", "]")
    val noisyWarm = spread.collect { case (n, s) if s > 0.3 => n }
    val coldSuspect = cold.collect { case (n, c)
      if c >= 0 && warmMap(n) > 0 && c > 3 * warmMap(n) && c - warmMap(n) > 2.0 => n }

    // ONE definition of the shared segments, so the full diagnostic
    // line and the persisted headline cannot drift apart — the
    // artifact-vs-stdout disagreement the headline exists to prevent.
    // cpus is part of the artifact's identity: a 4-thread builder spot
    // run and the driver's 32-thread board differ 1.3-2x on
    // shuffle-heavy queries, and without the stamp that reads as a
    // per-query regression (round 17 lost a bench cycle to exactly
    // this — compare boards only at equal cpus).
    val core = s""""metric":"total","value":${f"${total(cold)}%.3f"},"unit":"sec",""" +
      s""""cpus":$cpus,""" +
      s""""queries":${fmt(cold)},"total_warm":${f"${total(warm)}%.3f"},""" +
      s""""queries_warm":${fmt(warm)},""" +
      s""""noisy_warm":${quote(noisyWarm)},"cold_suspect":${quote(coldSuspect)},""" +
      s""""degraded":${isDegraded(loads.toSeq, cpus.toInt)},""" +
      s""""degraded_threshold":${f"${cpus.toInt / 8.0}%.3f"},""" +
      s""""loadavg":[${loads.mkString(",")}]"""
    println(s"{$core," +
      s""""queries_warm_median":${fmt(warmMedian)},""" +
      s""""warm_passes":[${warmPasses.map(fmt).mkString(",")}],""" +
      s""""warm_spread":${fmt(spread)},""" +
      s""""loadavg_before":${loads.head},"loadavg_after":${loads.last},""" +
      s""""sf":"$sfDir"}""")
    // Compact headline LAST: bounded size so a tail-grab parses it.
    // It carries its own adjudication evidence (loadavg, noisy_warm,
    // cold_suspect, warm medians): round 8's driver tail truncated the
    // full diagnostic line, leaving a 1.5x warm inflation and a 24.7s
    // cold outlier with no in-artifact proof they were machine noise.
    val headline = s"""{$core,"sf":"$sfDir"}"""
    println(headline)
    // Also persist it: the artifact survives even if the caller's
    // stdout tail-parse chokes on log prefixes (see README "Benchmark").
    try {
      java.nio.file.Files.createDirectories(headlinePath.getParent)
      java.nio.file.Files.write(headlinePath,
        headline.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: java.io.IOException =>
      System.err.println(s"bench: could not write target/bench_headline.json: $e")
    }
    // ROUND-STAMPED full artifact, in the repo (target/ is gitignored
    // and bench_headline.json is overwritten every run, so before this
    // file existed each round's complete per-query board was lost and
    // round-over-round regression tracking was blind on whatever the
    // driver's bounded tail truncated — 96/199 queries in r15). Round
    // number = latest driver-committed BENCH_r{N}.json + 1 (this run
    // IS that round's bench); the sf tag keeps builder-side sf0.01
    // spot runs from clobbering the driver's sf0.1 board.
    try {
      val roundRe = "BENCH_r(\\d+)\\.json".r
      // Files.list holds a directory handle — close it (Using) instead
      // of leaking one per bench run
      val round = scala.util.Using.resource(
          java.nio.file.Files.list(java.nio.file.Paths.get("."))) { s =>
        s.iterator().asScala
          .flatMap(p => roundRe.findFirstMatchIn(p.getFileName.toString)
            .map(_.group(1).toInt))
          .foldLeft(0)(math.max)
      } + 1
      val sfTag = java.nio.file.Paths.get(sfDir).getFileName.toString
      val dir = java.nio.file.Paths.get("bench_full")
      java.nio.file.Files.createDirectories(dir)
      // Never clobber an existing round file: before the driver commits
      // BENCH_r{N}.json every re-run infers the SAME round number, and
      // a silent overwrite would replace the exact per-query board this
      // file exists to preserve — suffix re-runs instead.
      val base = s"BENCH_r${round}_full_$sfTag"
      val path = Iterator.from(0)
        .map(i => dir.resolve(if (i == 0) s"$base.json" else s"$base.run$i.json"))
        .find(p => !java.nio.file.Files.exists(p)).get
      java.nio.file.Files.write(path,
        headline.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable =>
      System.err.println(s"bench: could not write bench_full artifact: $e")
    }
    // Ultra-compact warm line, printed ABSOLUTELY last: integer
    // milliseconds only, ~3.5 KB for the full board — sized to survive
    // a caller that keeps just the final few KB of stdout (round 13's
    // artifact kept ~2 KB and lost warm numbers for 2/3 of the board;
    // per-query warm regression tracking needs THIS line intact).
    // target/bench_headline.json remains the full-fidelity artifact.
    val warmMs = names.map { case n =>
      val v = warmMap(n)
      "\"" + n + "\":" + (if (v < 0) "-1" else math.round(v * 1000).toString)
    }.mkString("{", ",", "}")
    println(s"""{"metric":"warm_ms","unit":"ms","warm_ms":$warmMs,""" +
      s""""total_warm_sec":${f"${total(warm)}%.3f"},"sf":"$sfDir"}""")
    spark.stop()
  }
}
