package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpecBase
import graft.functions.LongHashes

class SketchesSpec extends SparkSpecBase with Matchers {
  import spark.implicits._

  test("splitmix64: matches an independent mod-2^64 BigInt reimplementation") {
    val M = BigInt(1) << 64
    def ref(x: Long): Long = {
      def u(b: BigInt): BigInt = b.mod(M)
      var z = u(BigInt(x) + BigInt("9E3779B97F4A7C15", 16))
      z = u((z ^ (z >> 30)) * BigInt("BF58476D1CE4E5B9", 16))
      z = u((z ^ (z >> 27)) * BigInt("94D049BB133111EB", 16))
      (z ^ (z >> 31)).toLong
    }
    val keys = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue, 123456789L)
    keys.foreach(x => LongHashes.splitmix64Of(x) shouldBe ref(x))
    // and through the codegen'd expression
    val out = keys.toDF("x")
      .select(col("x"), LongHashes.splitmix64(col("x")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    keys.foreach(x => out(x) shouldBe ref(x))
  }

  test("kmvDistinct: exact below k, ~6% estimate above k, duplicate-blind") {
    val n = 10000
    val base = (1L to n).toDF("key")
      .select(Sketches.kmvDistinct(LongHashes.splitmix64(col("key")), 256)
        .as("kmv"))
      .select(col("kmv.n_kept"), col("kmv.est")).head()
    base.getInt(0) shouldBe 256
    base.getLong(1).toDouble shouldBe (n.toDouble +- n * 0.15)

    // duplicates change nothing: the kept set is a function of the value SET
    val dup = (1L to n).flatMap(x => Seq(x, x, x)).toDF("key")
      .select(Sketches.kmvDistinct(LongHashes.splitmix64(col("key")), 256)
        .as("kmv"))
      .select(col("kmv.kth"), col("kmv.est")).head()
    dup.getLong(1) shouldBe base.getLong(1)

    // below k: exact, null kth
    val small = (1L to 100L).toDF("key")
      .select(Sketches.kmvDistinct(LongHashes.splitmix64(col("key")), 256)
        .as("kmv"))
      .select(col("kmv.n_kept"), col("kmv.kth"), col("kmv.est")).head()
    small.getInt(0) shouldBe 100
    small.isNullAt(1) shouldBe true
    small.getLong(2) shouldBe 100L
  }

  test("kmvDistinct: partition-count invariant (merge path exercised)") {
    val a = (1L to 5000L).toDF("key").repartition(1)
      .select(Sketches.kmvDistinct(LongHashes.splitmix64(col("key")), 128)
        .as("kmv")).head()
    val b = (1L to 5000L).toDF("key").repartition(13)
      .select(Sketches.kmvDistinct(LongHashes.splitmix64(col("key")), 128)
        .as("kmv")).head()
    a shouldBe b
  }

  test("countMin: estimates upper-bound true counts, exact when wide, " +
      "partition-invariant") {
    // 50 keys, key i appears i+1 times -> 1275 rows
    val rows = (0L until 50L).flatMap(k => Seq.fill(k.toInt + 1)(k))
    val df = rows.toDF("key")
    def estimates(parts: Int, width: Int) = {
      val grid = df.repartition(parts)
        .agg(Sketches.countMin(col("key"), 4, width).as("grid"))
      df.select(col("key")).distinct()
        .crossJoin(broadcast(grid))
        .select(col("key"),
          Sketches.cmsEstimate(col("grid"), col("key"), 4, width).as("est"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // wide grid: no collisions plausible at 4x4096 for 50 keys -> exact
    val wide = estimates(4, 4096)
    (0L until 50L).foreach(k => wide(k) shouldBe k + 1)
    // narrow grid: still an upper bound on every key
    val narrow = estimates(4, 16)
    (0L until 50L).foreach(k => narrow(k) should be >= (k + 1))
    // and partition-count cannot change a single estimate
    estimates(1, 16) shouldBe narrow
  }

  test("bloomFilter: no false negatives, real selectivity on foreign keys, " +
      "partition-invariant") {
    val inserted = (0L until 500L).map(_ * 7 + 1)
    def words(parts: Int) = inserted.toDF("key").repartition(parts)
      .agg(Sketches.bloomFilter(col("key"), bits = 1 << 13, numHashes = 3)
        .as("bf"))
    val bf = words(4)
    // every inserted key passes (the semi-join-reduction contract)
    val hits = inserted.toDF("key").crossJoin(broadcast(bf))
      .where(Sketches.bloomMightContain(col("bf"), col("key"), 1 << 13, 3))
      .count()
    hits shouldBe inserted.size
    // disjoint keys mostly rejected (8192 bits / 500 keys, k=3 -> FP ~ 1%)
    val foreign = (100000L until 102000L).toDF("key")
    val fp = foreign.crossJoin(broadcast(bf))
      .where(Sketches.bloomMightContain(col("bf"), col("key"), 1 << 13, 3))
      .count()
    assert(fp < 100, s"false-positive count $fp out of 2000 is implausible")
    // OR-merge: partitioning cannot change a single word
    words(1).head().getSeq[Long](0) shouldBe bf.head().getSeq[Long](0)
  }

  test("heavyHitters: EXACT equality with the naive groupBy.having on a " +
      "skewed corpus, across prefilter regimes (wide and colliding grids)") {
    // 3 hot keys (100x), 200 cold keys (3x each): hitters at t=50 are
    // exactly the hot keys, whatever the grid size — a narrow grid only
    // admits more false candidates for the exact confirm to discard.
    val rows = (Seq.fill(100)(Seq(1L, 2L, 3L)).flatten ++
      (10L until 210L).flatMap(k => Seq(k, k, k))).toDF("key")
    val expected = Seq((1L, 100L), (2L, 100L), (3L, 100L))
    for (width <- Seq(8, 1024)) {
      withClue(s"width=$width: ") {
        Sketches.heavyHitters(rows, "key", threshold = 50,
            depth = 4, width = width)
          .as[(Long, Long)].collect().toSeq.sortBy(_._1) shouldBe expected
      }
    }
    // threshold below the cold count: everyone is a hitter (exactness
    // holds in the degenerate regime too)
    Sketches.heavyHitters(rows, "key", threshold = 3, depth = 4, width = 8)
      .count() shouldBe 203L
  }

  test("heavyHitters plan: the exact groupBy consumes the PREFILTERED " +
      "scan (filter on the cms estimate sits below the aggregate)") {
    val rows = (1L to 100L).toDF("key")
    val plan = Sketches.heavyHitters(rows, "key", threshold = 5)
      .queryExecution.optimizedPlan.toString
    // the broadcast grid feeds a filter, not a join-after-aggregate
    plan should include("least(") // cmsEstimate's min-over-rows
    plan.indexOf("Filter") should be < plan.indexOf("Aggregate")
  }

  test("heavyHitters equals the naive model on seeded random multisets " +
      "across random thresholds and grid widths (exactness is not " +
      "distribution-dependent)") {
    val rnd = new scala.util.Random(31)
    for (_ <- 1 to 5) {
      val nKeys = 5 + rnd.nextInt(40)
      val rows = (0 until nKeys).flatMap { k =>
        Seq.fill(1 + rnd.nextInt(30))(k.toLong + 100)
      }
      val shuffled = rnd.shuffle(rows).toDF("key")
      val threshold = 1 + rnd.nextInt(25)
      val width = 1 << (2 + rnd.nextInt(6)) // 4..128, collisions certain
      val expected = rows.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
        .filter(_._2 >= threshold).toSeq.sortBy(_._1)
      val got = Sketches.heavyHitters(shuffled, "key",
          threshold = threshold, depth = 3, width = width)
        .as[(Long, Long)].collect().toSeq.sortBy(_._1)
      withClue(s"threshold=$threshold width=$width: ") {
        got shouldBe expected
      }
    }
  }

  test("kmvDistinct: serde round-trip preserves the kept set") {
    val agg = KmvDistinct(
      org.apache.spark.sql.GraftColumnBridge.expression(col("x")), 16)
    val buf = agg.createAggregationBuffer()
    (1L to 100L).foreach(x => buf.offer(LongHashes.splitmix64Of(x)))
    val back = agg.deserialize(agg.serialize(buf))
    back.size shouldBe buf.size
    back.kth shouldBe buf.kth
  }

  test("kmvResemblance: EQUALS exact Jaccard when k covers the union; " +
      "close (and in [0,1]) when it doesn't; matches a local bottom-k " +
      "model exactly at small k") {
    // two overlapping id sets with known Jaccard
    val a = (1L to 300L).toSet
    val b = (151L to 450L).toSet // |A∩B| = 150, |A∪B| = 450 -> J = 1/3
    val rows = (a.map(("a", _)) ++ b.map(("b", _))).toSeq
    val df = rows.toDF("g", "id")
      .select(col("g"), LongHashes.splitmix64(col("id")).as("h"))
    def resemblance(k: Int): Double = {
      val sk = df.groupBy("g").agg(Sketches.kmvKeepSet(col("h"), k).as("s"))
      sk.as("x").join(sk.as("y"), col("x.g") < col("y.g"))
        .select(Sketches.kmvResemblance(col("x.s"), col("y.s"), k).as("r"))
        .as[Double].head()
    }
    // k >= |A ∪ B|: sketches are the full sets -> estimate IS exact
    resemblance(512) shouldBe (150.0 / 450.0) +- 1e-15
    // small k: still a real estimate, and equal to the local model
    val est64 = resemblance(64)
    est64 should be >= 0.0
    est64 should be <= 1.0
    est64 shouldBe (1.0 / 3.0) +- 0.15 // ~1/sqrt(64) error regime
    def flip(x: Long) = x ^ Long.MinValue
    val sa = a.map(i => flip(LongHashes.splitmix64Of(i))).toSeq.sorted.take(64)
    val sb = b.map(i => flip(LongHashes.splitmix64Of(i))).toSeq.sorted.take(64)
    val x = (sa ++ sb).distinct.sorted.take(64)
    val model = x.count(h => sa.contains(h) && sb.contains(h)).toDouble / x.size
    est64 shouldBe model +- 1e-15
  }

  test("quantileSketch: kept values are the bottom-k-by-hash model, " +
      "identical on 1 and 13 partitions (hash-derived retention)") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map(id => (id, rnd.nextInt(10000).toLong))
    // local model: values of the 32 ids with smallest unsigned hash
    val expect = rows
      .sortBy { case (id, _) =>
        LongHashes.splitmix64Of(id) ^ Long.MinValue } // unsigned order
      .take(32).map(_._2).sorted
    def run(parts: Int): Seq[Long] =
      rows.toDF("id", "v").repartition(parts)
        .agg(Sketches.quantileSketch(LongHashes.splitmix64(col("id")),
          col("v"), 32).as("qs"))
        .select(col("qs")).as[Seq[Long]].head()
    run(1) shouldBe expect
    run(13) shouldBe expect
  }

  test("sketchQuantile: explicit interpolation on a known array; " +
      "empty -> null, singleton -> the value, endpoints exact") {
    def q(vs: Seq[Long], p: Double): Option[Double] = {
      val df = Seq(Tuple1(vs)).toDF("qs")
      df.select(Sketches.sketchQuantile(col("qs"), p).as("r"))
        .collect().headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
    }
    val vs = Seq(10L, 20L, 30L, 40L)
    q(vs, 0.0) shouldBe Some(10.0)
    q(vs, 1.0) shouldBe Some(40.0)
    q(vs, 0.5) shouldBe Some(25.0) // r=1.5 between 20 and 30
    // r = 0.9*3 = 2.7000000000000002; lo=2, frac=r-2 -> 30 + 10*frac,
    // the same IEEE ops in the same order as the Column expression
    q(vs, 0.9) shouldBe Some(30.0 + (40.0 - 30.0) * (0.9 * 3.0 - 2.0))
    q(Seq(7L), 0.5) shouldBe Some(7.0)
    q(Seq.empty[Long], 0.5) shouldBe None
  }

  test("cmsInnerProduct: self-join-size estimate NEVER undercounts, is " +
      "exact when collision-free, and matches a local grid model") {
    val rnd = new scala.util.Random(23)
    val keys = Seq.fill(2000)(rnd.nextInt(500).toLong)
    val exact = keys.groupBy(identity).values
      .map(v => v.size.toLong * v.size).sum
    def est(depth: Int, width: Int): Long =
      keys.toDF("k")
        .agg(Sketches.countMin(col("k"), depth, width).as("g"))
        .select(Sketches.cmsInnerProduct(col("g"), col("g"), depth, width)
          .as("e")).as[Long].head()
    def model(depth: Int, width: Int): Long = {
      val grid = Array.ofDim[Long](depth, width)
      keys.foreach { k =>
        (0 until depth).foreach { i =>
          grid(i)((LongHashes.splitmix64Of(k ^ i) & (width - 1)).toInt) += 1
        }
      }
      grid.map(row => row.map(c => c * c).sum).min
    }
    // wide grid: one-sided error within the |A|^2/width bias budget
    // (~2% at 2000 rows over 16384 buckets), and == the local model
    val wide = est(3, 1 << 14)
    wide should be >= exact
    wide.toDouble should be <= exact * 1.05
    wide shouldBe model(3, 1 << 14)
    // tight grid: 64 buckets for 500 keys — collisions certain, and
    // every collision term only ADDS (the one-sided error contract)
    val tight = est(3, 1 << 6)
    tight should be > exact
    tight shouldBe model(3, 1 << 6)
  }

  test("kmvUnionDistinct: exact while the union fits under k; matches " +
      "the local merged-bottom-k estimator beyond; ~1/sqrt(k) error") {
    val a = (1L to 3000L).toSet
    val b = (2001L to 5000L).toSet // |A∪B| = 5000
    val rows = (a.map(("a", _)) ++ b.map(("b", _))).toSeq
    val df = rows.toDF("g", "id")
      .select(col("g"), LongHashes.splitmix64(col("id")).as("h"))
    def unionEst(k: Int): Long = {
      val sk = df.groupBy("g").agg(Sketches.kmvKeepSet(col("h"), k).as("s"))
      sk.as("x").join(sk.as("y"), col("x.g") < col("y.g"))
        .select(Sketches.kmvUnionDistinct(col("x.s"), col("y.s"), k).as("u"))
        .as[Long].head()
    }
    // k >= |A∪B|: the merged keep set is the whole union -> exact
    unionEst(8192) shouldBe 5000L
    // k = 256: a genuine estimate within the ~1/sqrt(k-2) regime
    val est = unionEst(256)
    est.toDouble shouldBe 5000.0 +- 5000 * 0.2
    // and equal to the local model: bottom-256 of the merged hashes
    def flip(x: Long) = x ^ Long.MinValue
    val merged = (a ++ b).map(i => flip(LongHashes.splitmix64Of(i)))
      .toSeq.sorted.take(256)
    est shouldBe KmvDistinct.estimate(256, flip(merged.last))
  }

  test("kmvUnionDistinctAll: folding N keep sets == the bottom-k of " +
      "the total union (sketch algebra), independent of collect order; " +
      "oversized sketches raise") {
    val groups = Seq(
      ("g1", 1L to 900L), ("g2", 601L to 1500L), ("g3", 1201L to 2100L))
    val rows = groups.flatMap { case (g, r) => r.map((g, _)) }
    val df = rows.toDF("g", "id")
      .select(col("g"), LongHashes.splitmix64(col("id")).as("h"))
    val est = df.groupBy("g")
      .agg(Sketches.kmvKeepSet(col("h"), 64).as("s"))
      .agg(collect_list(col("s")).as("sks"))
      .select(Sketches.kmvUnionDistinctAll(col("sks"), 64).as("u"))
      .as[Long].head()
    // local model: bottom-64 of the union of ALL ids' hashes
    def flip(x: Long) = x ^ Long.MinValue
    val merged = (1L to 2100L).map(i => flip(LongHashes.splitmix64Of(i)))
      .sorted.take(64)
    est shouldBe KmvDistinct.estimate(64, flip(merged.last))
    est.toDouble shouldBe 2100.0 +- 2100 * 0.3 // ~1/sqrt(62) regime
    // same-k contract: a wider sketch in the array raises
    val bad = df.groupBy("g").agg(Sketches.kmvKeepSet(col("h"), 64).as("s"))
      .agg(collect_list(col("s")).as("sks"))
      .select(Sketches.kmvUnionDistinctAll(col("sks"), 16).as("u"))
    val ex = intercept[Exception](bad.collect())
    ex.getMessage should include("same-k contract")
  }

  test("quantilePairs/quantilePairsUnionAll: folding per-group keep-pair " +
      "sketches == the value set of the bottom-k over the whole union " +
      "(sketch algebra, values riding the keys); oversized raises") {
    val groups = Seq(
      ("g1", 1L to 900L), ("g2", 901L to 1500L), ("g3", 1501L to 2100L))
    val rows = groups.flatMap { case (g, r) => r.map(i => (g, i, i * 7L)) }
    val df = rows.toDF("g", "id", "v")
    val merged = df.groupBy("g")
      .agg(Sketches.quantilePairs(
        LongHashes.splitmix64(col("id")), col("v"), 64).as("s"))
      .agg(collect_list(col("s")).as("sks"))
      .select(Sketches.quantilePairsUnionAll(col("sks"), 64).as("vs"))
      .as[Seq[Long]].head()
    // local model: values of the 64 smallest unsigned hashes over ALL ids
    def flip(x: Long) = x ^ Long.MinValue
    val expect = (1L to 2100L)
      .sortBy(i => flip(LongHashes.splitmix64Of(i))).take(64)
      .map(_ * 7L).sorted
    merged shouldBe expect
    val bad = df.groupBy("g")
      .agg(Sketches.quantilePairs(
        LongHashes.splitmix64(col("id")), col("v"), 64).as("s"))
      .agg(collect_list(col("s")).as("sks"))
      .select(Sketches.quantilePairsUnionAll(col("sks"), 16).as("vs"))
    intercept[Exception](bad.collect())
      .getMessage should include("same-k contract")
  }

  test("kmvResemblance: a sketch larger than k raises (same-k contract) " +
      "instead of silently biasing the estimate") {
    val df = (1L to 300L).map(("a", _)).toDF("g", "id")
      .select(col("g"), LongHashes.splitmix64(col("id")).as("h"))
    val sk = df.groupBy("g").agg(Sketches.kmvKeepSet(col("h"), 64).as("s"))
    val ex = intercept[Exception] {
      sk.as("x").join(sk.as("y"), col("x.g") === col("y.g"))
        .select(Sketches.kmvResemblance(col("x.s"), col("y.s"), 16).as("r"))
        .collect()
    }
    ex.getMessage should include("same-k contract")
  }

  test("hllDistinct matches a driver model (same buckets, ranks, fold " +
      "order) exactly, estimates within the m=64 error band, ignores " +
      "duplicates, and is partition-invariant") {
    import graft.functions.LongHashes
    val n = 2000
    val ids = (0L until n.toLong) ++ (0L until 500L) // dups change nothing
    def run(parts: Int) = Sketches.hllDistinct(
        ids.map(i => ("g", i)).toDF("g", "id").repartition(parts)
          .select($"g", LongHashes.splitmix64($"id").as("h")),
        Seq("g"), "h", p = 6)
      .as[(String, Long, Double)].collect().head
    val got = run(1)
    got shouldBe run(7)
    // driver model: same splitmix values via the kernel itself, then
    // bucket/rank/fold re-derived in plain Scala
    val hs = (0L until n.toLong).map(i => ("x", i)).toDF("g", "id")
      .select(LongHashes.splitmix64($"id")).as[Long].collect()
    val regs = scala.collection.mutable.Map.empty[Int, Int]
    hs.foreach { h =>
      val b = (h & 63L).toInt
      val v = h >>> 6
      val rho = if (v == 0L) 59 else java.lang.Long.numberOfTrailingZeros(v) + 1
      regs(b) = math.max(regs.getOrElse(b, 0), rho)
    }
    val sPresent = regs.toSeq.sortBy(_._1).foldLeft(0.0) {
      case (a, (_, r)) => a + 1.0 / (1L << r) }
    val est = Sketches.hllAlphaM2(6) /
      (sPresent + (64L - regs.size).toDouble)
    got._2 shouldBe regs.size.toLong
    got._3 shouldBe est // bit-exact: same fold order, same literals
    math.abs(est - n) / n should be < 0.15 // ~1.04/sqrt(64) band
  }

  test("hllDistinct guards fire loudly") {
    an[IllegalArgumentException] should be thrownBy
      Sketches.hllDistinct(Seq(("g", 1L)).toDF("g", "h"), Seq("g"), "h",
        p = 3)
    an[IllegalArgumentException] should be thrownBy
      Sketches.hllDistinct(Seq(("g", 1L)).toDF("g", "h"), Seq.empty, "h")
  }

  test("hllMergeRegisters: merge(regs(A), regs(B)) == regs(A ∪ B) " +
      "bit-for-bit even with overlap, the merged estimate equals the " +
      "single-pass estimate, and merge is idempotent") {
    import graft.functions.LongHashes
    def frame(ids: Seq[Long]) =
      ids.map(i => ("g", i)).toDF("g", "id")
        .select($"g", LongHashes.splitmix64($"id").as("h"))
    val a = (0L until 700L)
    val b = (400L until 1200L) // overlaps a on [400, 700)
    val regsA = Sketches.hllRegisters(frame(a), Seq("g"), "h", p = 6)
    val regsB = Sketches.hllRegisters(frame(b), Seq("g"), "h", p = 6)
    val merged = Sketches.hllMergeRegisters(Seq(regsA, regsB), Seq("g"))
    val full = Sketches.hllRegisters(frame(a ++ b), Seq("g"), "h", p = 6)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Int, Int)].collect().sortBy(r => (r._1, r._2)).toSeq
    rows(merged) shouldBe rows(full)
    // idempotent: folding the merged table with one side changes nothing
    rows(Sketches.hllMergeRegisters(Seq(merged, regsA), Seq("g"))) shouldBe
      rows(full)
    Sketches.hllEstimate(merged, Seq("g"), p = 6)
      .as[(String, Long, Double)].collect().head shouldBe
      Sketches.hllEstimate(full, Seq("g"), p = 6)
        .as[(String, Long, Double)].collect().head
  }

  test("cmsMergeGrids: merge(grid(A), grid(B)) == grid(A ∪ B) cell for " +
      "cell even with overlap; merged point estimates equal single-pass; " +
      "wrong-shape grids raise") {
    def frame(ids: Seq[Long]) =
      ids.flatMap(i => Seq(("g", i), ("h", i % 7))).toDF("g", "id")
    val a = (0L until 300L)
    val b = (200L until 500L) // overlaps a on [200, 300)
    val ga = Sketches.cmsGrids(frame(a), Seq("g"), "id", 4, 32)
    val gb = Sketches.cmsGrids(frame(b), Seq("g"), "id", 4, 32)
    val merged = Sketches.cmsMergeGrids(Seq(ga, gb), Seq("g"), 4, 32)
    val full = Sketches.cmsGrids(frame(a ++ b), Seq("g"), "id", 4, 32)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Seq[Long])].collect().sortBy(_._1).toSeq
    rows(merged) shouldBe rows(full)
    def est(df: org.apache.spark.sql.DataFrame, key: Long) =
      df.select(Sketches.cmsEstimate($"cms_grid", lit(key), 4, 32))
        .as[Long].collect().toSeq.sorted
    est(merged, 3L) shouldBe est(full, 3L)
    // a grid built with another (depth, width) raises instead of
    // folding garbage
    val wrong = Sketches.cmsGrids(frame(a), Seq("g"), "id", 4, 64)
    // the stamp raises at PLAN time now (round 19); the row-level
    // size guard remains behind it as defense for unstamped tables
    intercept[Exception] {
      Sketches.cmsMergeGrids(Seq(ga, wrong), Seq("g"), 4, 32).collect()
    }.getMessage should include("mismatched: width")
    an[IllegalArgumentException] should be thrownBy
      Sketches.cmsMergeGrids(Seq.empty, Seq("g"), 4, 32)
  }

  test("bloomMergeWords: merge(words(A), words(B)) == words(A ∪ B) word " +
      "for word; merged membership equals single-pass (no false " +
      "negatives); wrong-bits tables raise") {
    def frame(ids: Seq[Long]) = ids.map(i => ("g", i)).toDF("g", "id")
    val a = (0L until 300L)
    val b = (200L until 500L)
    val wa = Sketches.bloomWords(frame(a), Seq("g"), "id", 256, 3)
    val wb = Sketches.bloomWords(frame(b), Seq("g"), "id", 256, 3)
    val merged = Sketches.bloomMergeWords(Seq(wa, wb), Seq("g"), 256)
    val full = Sketches.bloomWords(frame(a ++ b), Seq("g"), "id", 256, 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Seq[Long])].collect().sortBy(_._1).toSeq
    rows(merged) shouldBe rows(full)
    // every inserted key (either side) passes the MERGED probe
    val probes = (0L until 500L).map(i => ("g", i)).toDF("g", "id")
    probes.join(merged, Seq("g"))
      .where(!Sketches.bloomMightContain($"bloom_words", $"id", 256, 3))
      .count() shouldBe 0L
    val wrong = Sketches.bloomWords(frame(a), Seq("g"), "id", 512, 3)
    intercept[Exception] {
      Sketches.bloomMergeWords(Seq(wa, wrong), Seq("g"), 256).collect()
    }.getMessage should include("bits")
    an[IllegalArgumentException] should be thrownBy
      Sketches.bloomMergeWords(Seq.empty, Seq("g"), 256)
  }

  test("cmsSubtractGrids: base − delta == grid(survivors) cell for cell; " +
      "untouched groups pass through; non-subset retraction raises") {
    def frame(ids: Seq[Long]) =
      ids.flatMap(i => Seq(("g", i), ("h", i % 7))).toDF("g", "id")
    val all = (0L until 500L)
    val gone = (350L until 500L)
    val full = Sketches.cmsGrids(frame(all), Seq("g"), "id", 4, 32)
    val delta = Sketches.cmsGrids(frame(gone), Seq("g"), "id", 4, 32)
    val retracted = Sketches.cmsSubtractGrids(full, delta, Seq("g"), 4, 32)
    val survivors = Sketches.cmsGrids(frame(0L until 350L),
      Seq("g"), "id", 4, 32)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Seq[Long])].collect().sortBy(_._1).toSeq
    rows(retracted) shouldBe rows(survivors)
    // a delta group the base never saw -> its cells go negative -> raise
    val foreign = Sketches.cmsGrids(
      (0L until 10L).map(i => ("zz", i)).toDF("g", "id"),
      Seq("g"), "id", 4, 32)
    intercept[Exception] {
      Sketches.cmsSubtractGrids(full, foreign, Seq("g"), 4, 32).collect()
    }.getMessage should include("negative")
    // retracting rows never inserted (same group) raises too
    val over = Sketches.cmsGrids(frame(350L until 700L),
      Seq("g"), "id", 4, 32)
    intercept[Exception] {
      Sketches.cmsSubtractGrids(survivors, over, Seq("g"), 4, 32).collect()
    }.getMessage should include("negative")
    // wrong-shape delta raises on the PLAN-TIME stamp (round 19)
    val wrong = Sketches.cmsGrids(frame(gone), Seq("g"), "id", 4, 64)
    intercept[Exception] {
      Sketches.cmsSubtractGrids(full, wrong, Seq("g"), 4, 32).collect()
    }.getMessage should include("mismatched: width")
  }

  test("bloomRetractWords / hllRetractRegisters: cannot-delete raises " +
      "are loud and name the rebuild-window remedy — never a silent " +
      "no-op") {
    val f = (0L until 50L).map(i => ("g", i)).toDF("g", "id")
    val words = Sketches.bloomWords(f, Seq("g"), "id", 256, 3)
    val be = intercept[UnsupportedOperationException] {
      Sketches.bloomRetractWords(words, words, Seq("g"), 256)
    }
    be.getMessage should include("cannot delete")
    be.getMessage should include("Rebuild-window")
    val regs = Sketches.hllRegisters(
      f.select($"g", LongHashes.splitmix64($"id").as("h")), Seq("g"), "h",
      p = 6)
    val he = intercept[UnsupportedOperationException] {
      Sketches.hllRetractRegisters(regs, regs, Seq("g"), 6)
    }
    he.getMessage should include("cannot delete")
    he.getMessage should include("Rebuild-window")
  }

  test("sketch-state merges validate the stored column's TYPE at plan " +
      "time — an array<int> table from a foreign writer fails before " +
      "any job runs") {
    val badType = Seq(("g", Seq(1, 2, 3))).toDF("g", "cms_grid")
    intercept[IllegalArgumentException] {
      Sketches.cmsMergeGrids(Seq(badType), Seq("g"), 4, 32)
    }.getMessage should include("array<bigint>")
    val noCol = Seq(("g", 1L)).toDF("g", "not_words")
    intercept[IllegalArgumentException] {
      Sketches.bloomMergeWords(Seq(noCol), Seq("g"), 256)
    }.getMessage should include("no 'bloom_words' column")
  }

  test("quantileSummaries/quantileMergeSummaries: merged stored state == " +
      "single-pass pair for pair; served quantiles within the uniform-" +
      "sample rank bound; merge output chains as stored state") {
    def frame(ids: Seq[Long]) = ids.map(i => ("g", i, i * 10L))
      .toDF("g", "id", "v")
      .select($"g", LongHashes.splitmix64($"id").as("h"), $"v")
    val a = (0L until 400L)
    val b = (400L until 1000L)
    val sa = Sketches.quantileSummaries(frame(a), Seq("g"), "h", "v", 64)
    val sb = Sketches.quantileSummaries(frame(b), Seq("g"), "h", "v", 64)
    val merged = Sketches.quantileMergeSummaries(Seq(sa, sb), Seq("g"), 64)
    val full = Sketches.quantileSummaries(frame(a ++ b),
      Seq("g"), "h", "v", 64)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Seq[(Long, Long)])].collect().sortBy(_._1).toSeq
    rows(merged) shouldBe rows(full)
    // merged state is ITSELF mergeable (chains across nights): folding
    // it with an empty-extra night is identity
    rows(Sketches.quantileMergeSummaries(Seq(merged), Seq("g"), 64)) shouldBe
      rows(merged)
    // served median within the ~1.25/sqrt(k) rank bound of the exact
    // one: values are 0..9990 by 10, exact p50 = 4995; rank error 20%
    // of the range at k=64 is ±2000 — generous but non-vacuous
    val p50 = merged.select(
      Sketches.summaryQuantile($"qsketch", 0.5)).as[Double].head()
    math.abs(p50 - 4995.0) should be < 2000.0
    // same-k contract: a bigger-k sketch raises
    val big = Sketches.quantileSummaries(frame(a), Seq("g"), "h", "v", 128)
    intercept[Exception] {
      Sketches.quantileMergeSummaries(Seq(big), Seq("g"), 64).collect()
    }.getMessage should include("mismatched: k")
  }

  test("quantilePairsRetract: dropping removed hashes leaves EXACTLY " +
      "the survivors' bottom-m sketch (a removal cannot promote past " +
      "the old k-th minimum) — valid at degraded resolution") {
    def frame(ids: Seq[Long]) = ids.map(i => ("g", i, i * 10L))
      .toDF("g", "id", "v")
      .select($"g", LongHashes.splitmix64($"id").as("h"), $"v")
    val all = (0L until 500L)
    val gone = (0L until 500L by 5L) // every 5th row retracted
    val full = Sketches.quantileSummaries(frame(all), Seq("g"), "h", "v", 64)
    val rmHashes = gone.map(LongHashes.splitmix64Of)
    val retracted = full.select($"g",
      Sketches.quantilePairsRetract($"qsketch",
        typedlit(rmHashes)).as("qsketch"))
    val got = retracted.as[(String, Seq[(Long, Long)])].head()._2
    // the survivors' bottom-k, truncated to the degraded size m,
    // must match pair for pair
    val survivors = Sketches
      .quantileSummaries(frame(all.filterNot(gone.toSet)),
        Seq("g"), "h", "v", 64)
      .as[(String, Seq[(Long, Long)])].head()._2
    got.size should be < 64 // some removed rows WERE in the kept set
    got shouldBe survivors.take(got.size)
    // served quantile still reads (values are id*10, exact p50 ~2495
    // over survivors; generous uniform-sample bound at m ~ 50)
    val p50 = retracted.select(
      Sketches.summaryQuantile($"qsketch", 0.5)).as[Double].head()
    math.abs(p50 - 2495.0) should be < 1200.0
  }

  test("hllEstimate raises on registers outside the given p's domain " +
      "instead of silently skewing the estimate") {
    val regsP8 = Sketches.hllRegisters(
      (0L until 500L).map(i => ("g", i)).toDF("g", "id")
        .select($"g", graft.functions.LongHashes.splitmix64($"id").as("h")),
      Seq("g"), "h", p = 8)
    // a p=8 table has buckets up to 255 — estimating it as p=6 must die
    intercept[Exception] {
      Sketches.hllEstimate(regsP8, Seq("g"), p = 6).collect()
    }.getMessage should include("mismatched: p")
    an[IllegalArgumentException] should be thrownBy
      Sketches.hllMergeRegisters(Seq.empty, Seq("g"))
  }
}
