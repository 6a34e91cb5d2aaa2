package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpecBase
import graft.functions.LongHashes

/** Stratified bottom-k-by-hash sampling: the bounded aggregate against
  * the window-sort model it replaces, plus the properties the
  * "deterministic sample" contract promises. */
class SamplingSpec extends SparkSpecBase with Matchers {
  import spark.implicits._

  private def docs = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"${sf()}/documents.parquet")
  }

  private def asSet(rows: Array[(String, Long, Long)]) = rows.toSet

  test("sampleKPerGroup == row_number window model (incl. strata " +
      "smaller than k, which keep every row)") {
    // sf0.001 strata run 71..193 docs: k=80 puts de/zh/fr/es on the
    // keep-all path and en on the true bottom-k path
    val k = 80
    val got = Sampling.sampleKPerGroup(docs, "lang", "doc_id", k)
      .select(col("lang"), col("doc_id"), col("skey"))
      .as[(String, Long, Long)].collect()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("skey").bitwiseXOR(lit(Long.MinValue)))
    val want = docs
      .select(col("lang"), col("doc_id"),
        LongHashes.splitmix64(col("doc_id")).as("skey"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("lang"), col("doc_id"), col("skey"))
      .as[(String, Long, Long)].collect()
    asSet(got) shouldBe asSet(want)
    // at sf0.001 at least one stratum must be smaller than k for the
    // keep-all path to be exercised — guard against data drift
    val sizes = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    withClue(s"strata sizes $sizes: ") {
      sizes.values.exists(_ < k) shouldBe true
      sizes.values.exists(_ > k) shouldBe true
    }
  }

  test("weightedSampleKPerGroup == per-stratum priority window model; " +
      "weights bias picks; partitioning-invariant") {
    val k = 30
    val got = Sampling.weightedSampleKPerGroup(docs, "lang", "doc_id",
        col("n_chars"), k)
      .select(col("lang"), col("doc_id"), col("rank"))
      .as[(String, Long, Int)].collect()
    import org.apache.spark.sql.expressions.Window
    val u = shiftrightunsigned(LongHashes.splitmix64(col("doc_id")), 1)
      .bitwiseOR(lit(1L))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("priority").desc, col("doc_id"))
    val want = docs
      .select(col("lang"), col("doc_id"),
        (col("n_chars").cast("double") / u.cast("double")).as("priority"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("lang"), col("doc_id"), col("rn").cast("int"))
      .as[(String, Long, Int)].collect()
    got.toSet shouldBe want.toSet
    // weighting is live: the picked docs skew heavier than the stratum
    // median (w/u with uniform u favours large w)
    val pickedIds = got.map(_._2).toSet
    val (pickedMean, allMean) = {
      val rows = docs.select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)].collect()
      (rows.filter(r => pickedIds(r._1)).map(_._2).sum.toDouble / pickedIds.size,
        rows.map(_._2).sum.toDouble / rows.length)
    }
    withClue(s"picked mean $pickedMean vs corpus mean $allMean: ") {
      pickedMean should be > allMean
    }
    // bounded merge => same result on any partitioning
    val re = Sampling.weightedSampleKPerGroup(docs.repartition(13),
        "lang", "doc_id", col("n_chars"), k)
      .select(col("lang"), col("doc_id"), col("rank"))
      .as[(String, Long, Int)].collect()
    re.toSet shouldBe got.toSet
  }

  test("sample is partitioning-invariant (bounded merge, not " +
      "insertion-order)") {
    val base = Sampling.sampleKPerGroup(docs, "lang", "doc_id", 5)
      .as[(String, Long, Long)].collect()
    val shuffled = Sampling.sampleKPerGroup(
        docs.repartition(7, col("doc_id")), "lang", "doc_id", 5)
      .as[(String, Long, Long)].collect()
    asSet(base) shouldBe asSet(shuffled)
  }

  test("appending one document displaces at most one sample member per " +
      "stratum (stability under corpus growth)") {
    val k = 5
    val before = Sampling.sampleKPerGroup(docs, "lang", "doc_id", k)
      .as[(String, Long, Long)].collect().groupBy(_._1)
    val extra = Seq((999999L, "en")).toDF("doc_id", "lang")
    val after = Sampling.sampleKPerGroup(
        docs.select("doc_id", "lang").unionByName(extra), "lang", "doc_id", k)
      .as[(String, Long, Long)].collect().groupBy(_._1)
    after.keySet shouldBe before.keySet
    for (lang <- before.keySet) {
      val lost = before(lang).toSet -- after(lang).toSet
      withClue(s"$lang: ") { lost.size should be <= 1 }
    }
  }

  test("BottomKBuffer: random offers over random partition splits + " +
      "serde round-trip == global sorted take-k") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 30) {
      val n = rnd.nextInt(60)
      val k = 1 + rnd.nextInt(8)
      val pairs = Seq.fill(n)((rnd.nextLong(), rnd.nextLong().abs))
      val nParts = 1 + rnd.nextInt(4)
      val parts = Array.fill(nParts)(new BottomKBuffer(k))
      pairs.zipWithIndex.foreach { case ((h, id), i) =>
        parts(i % nParts).offer(h, id)
      }
      val merged = new BottomKBuffer(k)
      parts.foreach(p =>
        BottomKBuffer.fromBytes(k, p.toBytes).foreach((h, i) => merged.offer(h, i)))
      val got = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      merged.foreach((h, i) => got += ((h, i)))
      // model: smallest id per hash, then k smallest hashes unsigned
      val want = pairs.groupBy(_._1).map { case (h, ps) => (h, ps.map(_._2).min) }
        .toSeq.sortBy { case (h, _) => h ^ Long.MinValue }.take(k)
      withClue(s"trial $trial (n=$n k=$k parts=$nParts): ") {
        got.toList shouldBe want.toList
      }
    }
  }

  test("quotaSampleByGroup: largest-remainder quotas sum to exactly " +
      "totalK, remainder ties break to the ascending group name, and " +
      "picks are each group's bottom-quota hash prefix") {
    import org.apache.spark.sql.functions.col
    // sizes 5/3/2, totalK=7: shares 3.5/2.1/1.4 -> base 3/2/1 (sum 6),
    // remainders .5/.1/.4 -> the single extra unit goes to 'a'
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .zipWithIndex.map { case (g, i) => (g, i.toLong) }
      .toDF("g", "id")
    val out = Sampling.quotaSampleByGroup(df, "g", "id", totalK = 7)
      .select("g", "quota", "id", "rank")
      .as[(String, Long, Long, Long)].collect().toSeq
    out.map(_._2).sum should not be 0
    val quotas = out.groupBy(_._1).map { case (g, rs) => g -> rs.head._2 }
    quotas shouldBe Map("a" -> 4L, "b" -> 2L, "c" -> 1L)
    out.size shouldBe 7
    // picks are the prefix of the per-group unsigned hash order
    val byHash = df.as[(String, Long)].collect()
      .map { case (g, id) =>
        (g, id, graft.functions.LongHashes.splitmix64Of(id)) }
      .groupBy(_._1).map { case (g, rows) =>
        g -> rows.sortBy(_._3 ^ Long.MinValue).map(_._2).toSeq }
    out.groupBy(_._1).foreach { case (g, rows) =>
      rows.sortBy(_._4).map(_._3) shouldBe
        byHash(g).take(quotas(g).toInt)
    }
    // remainder TIE: sizes 3/3/2, totalK = 4 -> shares 1.5/1.5/1.0 ->
    // base 1/1/1, remainders .5/.5/.0, ONE extra unit, tie between
    // 'x' and 'y' -> ascending name wins: 'x'
    val df2 = (Seq.fill(3)("x") ++ Seq.fill(3)("y") ++ Seq.fill(2)("z"))
      .zipWithIndex.map { case (g, i) => (g, i.toLong) }
      .toDF("g", "id")
    val q2 = Sampling.quotaSampleByGroup(df2, "g", "id", totalK = 4)
      .select("g", "quota").as[(String, Long)].collect().toSet
    q2 shouldBe Set(("x", 2L), ("y", 1L), ("z", 1L))
  }

  test("prioritySamples == per-group priority window model; merge of " +
      "disjoint halves == from-scratch, pair for pair (top-m closure)") {
    val m = 8
    val d = docs.select(col("source"), col("doc_id"), col("n_chars"))
    val full = Sampling.prioritySamples(d, Seq("source"), "doc_id",
      "n_chars", m)
    // window model of the artifact's content
    import org.apache.spark.sql.expressions.Window
    val u = shiftrightunsigned(LongHashes.splitmix64(col("doc_id")), 1)
      .bitwiseOR(lit(1L))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("p").desc, col("doc_id"))
    val want = d
      .select(col("source"), col("doc_id"), col("n_chars"),
        (col("n_chars").cast("double") / u.cast("double")).as("p"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= m)
      .select(col("source"), col("doc_id"), col("n_chars"), col("p"))
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(r => (-r._4, r._2))
        .map(r => (-r._4, r._2, r._3)).toList).toMap
    val got = full.select(col("source"), col("wsample"))
      .as[(String, Array[(Double, Long, Long)])].collect()
      .map { case (s, a) => s -> a.toList }.toMap
    got shouldBe want
    // top-m closure: per-half artifacts merged == from-scratch
    val sa = Sampling.prioritySamples(
      d.where(pmod(col("doc_id"), lit(2)) === 0), Seq("source"),
      "doc_id", "n_chars", m)
    val sb = Sampling.prioritySamples(
      d.where(pmod(col("doc_id"), lit(2)) === 1), Seq("source"),
      "doc_id", "n_chars", m)
    val merged = Sampling.prioritySampleMerge(Seq(sa, sb),
      Seq("source"), m)
    val gotM = merged.select(col("source"), col("wsample"))
      .as[(String, Array[(Double, Long, Long)])].collect()
      .map { case (s, a) => s -> a.toList }.toMap
    gotM shouldBe got
    // halves actually evict (the closure is non-vacuous): at least one
    // per-half artifact is full at m
    val sizes = sa.select(
      org.apache.spark.sql.functions.size(col("wsample"))).as[Int].collect()
    withClue(s"half-artifact sizes ${sizes.toList}: ") {
      sizes.exists(_ == m) shouldBe true
    }
    // partitioning-invariant (bounded merge, not insertion order)
    val re = Sampling.prioritySamples(d.repartition(13), Seq("source"),
        "doc_id", "n_chars", m)
      .select(col("source"), col("wsample"))
      .as[(String, Array[(Double, Long, Long)])].collect()
      .map { case (s, a) => s -> a.toList }.toMap
    re shouldBe got
  }

  test("priorityPairsRetract leaves exactly the survivors' top-m' " +
      "prefix; estimates serve max(w, tau) with tau the (k+1)-th " +
      "priority, and exact weights on a complete sample") {
    val m = 8
    val d = docs.select(col("source"), col("doc_id"), col("n_chars"))
    val full = Sampling.prioritySamples(d, Seq("source"), "doc_id",
      "n_chars", m)
    val rm = d.where(pmod(col("doc_id"), lit(5)) === 0)
      .groupBy(col("source"))
      .agg(collect_list(col("doc_id")).as("rmids"))
    val retracted = full.join(rm, Seq("source"), "left")
      .select(col("source"), Sampling.priorityPairsRetract(col("wsample"),
        coalesce(col("rmids"), array().cast("array<long>"))).as("wsample"))
    val surv = Sampling.prioritySamples(
      d.where(pmod(col("doc_id"), lit(5)) =!= 0), Seq("source"),
      "doc_id", "n_chars", m)
    val gotR = retracted.select(col("source"), col("wsample"))
      .as[(String, Array[(Double, Long, Long)])].collect()
      .map { case (s, a) => s -> a.toList }.toMap
    val wantPrefix = surv.select(col("source"), col("wsample"))
      .as[(String, Array[(Double, Long, Long)])].collect()
      .map { case (s, a) => s -> a.toList }.toMap
    // a source whose every doc was removed vanishes from the survivor
    // build; its retracted sample must be empty
    for (s <- gotR.keySet)
      withClue(s"$s: ") {
        gotR(s) shouldBe wantPrefix.getOrElse(s, Nil).take(gotR(s).size)
      }
    // at least one source actually lost a sampled row
    withClue(s"sizes ${gotR.view.mapValues(_.size).toMap}: ") {
      gotR.values.exists(_.size < m) shouldBe true
    }
    // a NULL tombstone array (the left-join-no-tombstones shape,
    // WITHOUT a defensive coalesce) is a no-op, not a silent wipe
    val nullRm = full.select(col("source"),
      Sampling.priorityPairsRetract(col("wsample"),
        lit(null).cast("array<long>")).as("wsample"))
      .select(col("source"), col("wsample"))
      .as[(String, Array[(Double, Long, Long)])].collect()
      .map { case (s, a) => s -> a.toList }.toMap
    nullRm shouldBe full.select(col("source"), col("wsample"))
      .as[(String, Array[(Double, Long, Long)])].collect()
      .map { case (s, a) => s -> a.toList }.toMap
    // estimates: tau = (k+1)-th priority RESCALED TO WEIGHT UNITS
    // (the stored priority divides by the raw 63-bit hash, so the DLT
    // uniform variate is u/2^63 and tau serves as stored * 2^63),
    // w_est = max(w, tau), and every estimate dominates its weight
    val k = 4
    val est = full.select(col("source"),
        col("wsample"), Sampling.priorityEstimates(col("wsample"), k).as("e"))
      .as[(String, Array[(Double, Long, Long)], Array[(Long, Long, Double)])]
      .collect()
    var sawBindingTau = false
    est.foreach { case (s, sample, e) =>
      withClue(s"$s: ") {
        e.length shouldBe math.min(k, sample.length)
        val tau =
          if (sample.length > k) -sample(k)._1 * 9223372036854775808.0
          else 0.0
        e.toList shouldBe sample.take(k).map { case (np, id, w) =>
          (id, w, math.max(w.toDouble, tau)) }.toList
        // the rescaled threshold must actually BITE on a truncated
        // sample: a weight-scale tau exceeds at least the smallest
        // served weight (pre-fix, tau was ~2^-63 of the weight scale
        // and max(w, tau) collapsed to w for every entry)
        if (sample.length > k && e.exists { case (_, w, wEst) =>
            wEst > w.toDouble }) sawBindingTau = true
      }
    }
    withClue("no source had tau bind — the threshold rescale is dead: ") {
      sawBindingTau shouldBe true
    }
    // complete sample (m >= population) -> tau = 0 -> exact weights
    val tiny = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "w")
      .withColumn("g", lit("a"))
    val small = Sampling.prioritySamples(tiny, Seq("g"), "id", "w", 10)
    val eSmall = small.select(explode(
        Sampling.priorityEstimates(col("wsample"), 10)).as("e"))
      .select(col("e.w"), col("e.w_est")).as[(Long, Double)].collect()
    eSmall.foreach { case (w, wEst) => wEst shouldBe w.toDouble }
  }

  test("priority-sample loud guards: same-m merge, non-integral " +
      "columns, negative weights") {
    val d = Seq((1L, 5L), (2L, 7L)).toDF("id", "w")
      .withColumn("g", lit("a"))
    val big = Sampling.prioritySamples(d, Seq("g"), "id", "w", 4)
    val e1 = intercept[Exception] {
      Sampling.prioritySampleMerge(Seq(big), Seq("g"), 1).collect()
    }
    e1.getMessage should include("mismatched: m") // plan-time stamp (r19)
    val e2 = intercept[IllegalArgumentException] {
      Sampling.prioritySamples(d.withColumn("w", col("w").cast("string")),
        Seq("g"), "id", "w", 2)
    }
    e2.getMessage should include("must be integral")
    val e3 = intercept[Exception] {
      Sampling.prioritySamples(
        Seq((1L, -5L)).toDF("id", "w").withColumn("g", lit("a")),
        Seq("g"), "id", "w", 2).collect()
    }
    e3.getMessage should include("negative weight")
  }

  test("PriorityKBuffer: random offers over random partition splits + " +
      "serde round-trip == global sorted take-m") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 30) {
      val n = rnd.nextInt(60)
      val m = 1 + rnd.nextInt(8)
      val rows = Seq.fill(n)(
        (rnd.nextDouble() * 10, rnd.nextLong().abs, rnd.nextInt(100).toLong))
      val nParts = 1 + rnd.nextInt(4)
      val parts = Array.fill(nParts)(new PriorityKBuffer(m))
      rows.zipWithIndex.foreach { case ((p, id, w), i) =>
        parts(i % nParts).offer(p, id, w)
      }
      val merged = new PriorityKBuffer(m)
      parts.foreach(b => PriorityKBuffer.fromBytes(m, b.toBytes)
        .foreach((p, i, w) => merged.offer(p, i, w)))
      val got = merged.sortedDesc.toList
      val want = rows.sortBy { case (p, id, _) => (-p, id) }.take(m)
        .map { case (p, id, w) => (p, id, w) }
      withClue(s"trial $trial (n=$n m=$m parts=$nParts): ") {
        got shouldBe want
      }
    }
  }

  test("quotaSampleByGroup: loud guards — non-string strata rejected " +
      "at plan time, NULL stratum named in the failure") {
    val intStrata = Seq((1L, 0L), (2L, 1L)).toDF("g", "id")
    val e1 = intercept[IllegalArgumentException] {
      Sampling.quotaSampleByGroup(intStrata, "g", "id", totalK = 1)
    }
    e1.getMessage should include("must be STRING")
    val nullStrata = Seq((Option("a"), 0L), (Option.empty[String], 1L))
      .toDF("g", "id")
    val e2 = intercept[IllegalArgumentException] {
      Sampling.quotaSampleByGroup(nullStrata, "g", "id", totalK = 1)
    }
    e2.getMessage should include("'g' contains NULL")
  }
}
