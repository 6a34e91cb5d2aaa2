package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class SimilaritySpec extends SparkSpecBase with org.scalatest.matchers.should.Matchers {
  import spark.implicits._

  private def corpus = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 1.0f)),
    (5L, Array(0.7f, 0.7f, 0.0f))
  ).toDF("id", "vec")

  test("cosine: orthogonal 0, identical 1, zero-norm null") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 1.0f), Array(1.0f, 1.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 0.0f))
    ).toDF("a", "b").select(Similarity.cosine($"a", $"b").as("c"))
    val rows = df.collect()
    rows(0).getDouble(0) shouldBe 0.0 +- 1e-12
    rows(1).getDouble(0) shouldBe 1.0 +- 1e-12
    rows(2).isNullAt(0) shouldBe true
  }

  test("brute-force top-k returns correct neighbors, ranked, tie-broken") {
    val queries = Seq((100L, Array(1.0f, 0.0f, 0.0f))).toDF("qid", "qvec")
    val top = Similarity.bruteForceTopK(corpus, "id", "vec",
        queries, "qid", "qvec", k = 3)
      .orderBy("rank")
      .select("neighbor_id", "rank").as[(Long, Int)].collect()
    top.map(_._1) shouldBe Array(1L, 2L, 5L)
    top.map(_._2) shouldBe Array(1, 2, 3)
  }

  test("topk aggregate: bounded heap matches a full sort, with tie order") {
    val scored = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.9), (1L, 12L, 0.8),
      (1L, 13L, 0.95), (1L, 14L, 0.1), (2L, 20L, 0.5)
    ).toDF("q", "id", "score")
    val top = Similarity.topKPerKey(scored, "q", "id", "score", k = 3)
      .orderBy("q", "rank").as[(Long, Long, Double, Int)].collect()
    top.map(t => (t._1, t._2)) shouldBe
      Array((1L, 13L), (1L, 10L), (1L, 11L), (2L, 20L))
  }

  test("topk aggregate drops NaN scores instead of letting a NaN root " +
      "freeze the heap") {
    // NaN first: it would sit at the heap root and block every eviction
    // (all NaN comparisons are false), silently returning the first k
    // rows seen instead of the top-k
    val scored = Seq(
      (1L, 99L, Double.NaN), (1L, 10L, 0.2), (1L, 11L, 0.5),
      (1L, 12L, 0.9), (1L, 13L, 0.7)
    ).toDF("q", "id", "score").coalesce(1) // one partition: NaN offered first
    val top = Similarity.topKPerKey(scored, "q", "id", "score", k = 2)
      .orderBy("rank").select("id").as[Long].collect()
    top shouldBe Array(12L, 13L)
  }

  test("self-query (same column names on both sides) resolves instead " +
      "of AMBIGUOUS_REFERENCE") {
    val top = Similarity.bruteForceTopK(corpus, "id", "vec",
        corpus, "id", "vec", k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    // every vector's nearest neighbor is itself
    top.foreach { case (q, n) => n shouldBe q }
    top.length shouldBe 5
    val lsh = Similarity.lshTopK(corpus, "id", "vec", corpus, "id", "vec",
      k = 1, dim = 3, numTables = 8, planesPerTable = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    lsh.foreach { case (q, n) => n shouldBe q }
  }

  test("withLshBuckets rejects reserved column names instead of " +
      "silently replacing them") {
    val withBucket = corpus.withColumn("lsh_bucket", lit(7))
    val e = intercept[IllegalArgumentException] {
      Similarity.withLshBuckets(withBucket, "vec", dim = 3)
    }
    e.getMessage should include("lsh_bucket")
  }

  test("lsh top-k finds the true nearest neighbor") {
    val queries = Seq((100L, Array(0.95f, 0.05f, 0.0f))).toDF("qid", "qvec")
    val top = Similarity.lshTopK(corpus, "id", "vec", queries, "qid", "qvec",
        k = 2, dim = 3, numTables = 8, planesPerTable = 4)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    top.headOption shouldBe Some(1L)
  }

  test("ivf top-k matches brute force on the real embeddings sample") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
      k = 8, iters = 3)
    cents.length shouldBe 8
    all(cents.map(c => math.sqrt(c.map(x => x * x).sum))) shouldBe 1.0 +- 1e-9
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 3, cents, nprobe = 8) // all lists probed
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)]
      .collect().sortBy(r => (r._1, r._3))
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)]
      .collect().sortBy(r => (r._1, r._3))
    ivf shouldBe brute // nprobe = k-lists => candidate set is complete
  }

  test("ivf training on a sample still yields k unit-norm centroids") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
      k = 4, iters = 2, sampleFraction = 0.5)
    cents.length shouldBe 4
    all(cents.map(c => math.sqrt(c.map(x => x * x).sum))) shouldBe 1.0 +- 1e-9
  }

  test("ivfTopKInt8: identical to float IVF when vectors are int8-" +
      "representable (lossless quantization), and near-identical " +
      "ranking on the real embeddings") {
    // components are exact multiples of max/127 -> quantization is
    // bit-lossless -> the int8 serve must EQUAL the float serve
    val rnd = new scala.util.Random(13)
    val dim = 8
    val rows = (0L until 60L).map { id =>
      (id, Array.fill(dim)((rnd.nextInt(255) - 127) / 127.0))
    }
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cents = Similarity.trainCentroids(df, "vec_id", "embedding",
      k = 4, iters = 2)
    def serve(int8: Boolean): Seq[(Long, Long, Int)] = {
      val out =
        if (int8) Similarity.ivfTopKInt8(df, "vec_id", "embedding",
          queries, "qid", "qvec", k = 3, cents, nprobe = 4)
        else Similarity.ivfTopK(df, "vec_id", "embedding",
          queries, "qid", "qvec", k = 3, cents, nprobe = 4)
      out.select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSeq.sortBy(r => (r._1, r._3))
    }
    serve(int8 = true) shouldBe serve(int8 = false)

    // real float embeddings: quantization is lossy but the top-3
    // neighbor SETS should agree (scores differ below the rank gaps)
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val equeries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val ecents = Similarity.trainCentroids(emb, "vec_id", "embedding",
      k = 8, iters = 3)
    def sets(df8: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df8.select("query_id", "neighbor_id").as[(Long, Long)]
        .collect().groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val s8 = sets(Similarity.ivfTopKInt8(emb, "vec_id", "embedding",
      equeries, "qid", "qvec", k = 3, ecents, nprobe = 8))
    val s32 = sets(Similarity.ivfTopK(emb, "vec_id", "embedding",
      equeries, "qid", "qvec", k = 3, ecents, nprobe = 8))
    s8 shouldBe s32
  }

  test("ivf with partial probing still finds each query's self-match") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
      k = 8, iters = 3)
    val top1 = Similarity.ivfTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 1, cents, nprobe = 2)
      .where(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    // a query IS a corpus row: its own cluster is always probed first
    top1.foreach { case (q, n) => n shouldBe q }
  }

  test("buffer serde round-trips") {
    val buf = new TopKBuffer(2)
    buf.offer(1L, 0.5); buf.offer(2L, 0.9); buf.offer(3L, 0.7)
    val back = TopKBuffer.fromBytes(2, buf.toBytes)
    back.sortedDesc shouldBe Array((2L, 0.9), (3L, 0.7))
  }

  test("farthestPointSample: greedy k-center picks the least-covered " +
      "vector each round — exactly-representable cosines, id tiebreak") {
    import spark.implicits._
    // unit-ish 2-D vectors whose cosines are EXACT doubles: the dup of
    // the seed scores 1.0, the orthogonal 0.0, the antipode -1.0
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),  // seed (min id)
      (2L, Array(1.0f, 0.0f)),  // duplicate of the seed -> picked LAST
      (3L, Array(0.0f, 1.0f)),  // orthogonal
      (4L, Array(-1.0f, 0.0f))  // antipode -> picked FIRST after seed
    ).toDF("vec_id", "embedding")
    val out = Similarity
      .farthestPointSample(vecs, "vec_id", "embedding", k = 4)
      .as[(Int, Long, Option[Double])].collect().toSeq
    out shouldBe Seq(
      (1, 1L, None),        // seed: no prior centers, ms is null
      (2, 4L, Some(-1.0)),  // farthest from {1}
      (3, 3L, Some(0.0)),   // max cos to {1,4} = 0 beats dup's 1.0
      (4, 2L, Some(1.0)))   // the duplicate: max cos to seed = 1.0
  }

  test("farthestPointSample stops early when the corpus has fewer than " +
      "k rows") {
    import spark.implicits._
    val vecs = Seq((7L, Array(1.0f, 0.0f)), (9L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity
      .farthestPointSample(vecs, "vec_id", "embedding", k = 5)
      .as[(Int, Long, Option[Double])].collect().toSeq
    out shouldBe Seq((1, 7L, None), (2, 9L, Some(0.0)))
  }

  test("hardNegatives: self and near-dups fall outside the band, the " +
      "closest in-band rows rank first") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),        // the query itself: cosine 1.0
      (2L, Array(0.99f, 0.14f)),      // near-dup ~0.99: false negative
      (3L, Array(0.6f, 0.8f)),        // cosine 0.6: hard negative
      (4L, Array(0.0f, 1.0f)),        // cosine 0.0: easier negative
      (5L, Array(-1.0f, 0.0f)))       // cosine -1.0: below minScore
      .toDF("id", "vec")
    val q = Seq((100L, Array(1.0f, 0.0f))).toDF("qid", "qvec")
    val out = Similarity.hardNegatives(corpus, "id", "vec",
        q, "qid", "qvec", k = 5, maxScore = 0.9, minScore = -0.5)
      .select(col("neighbor_id"), col("rank"))
      .as[(Long, Int)].collect().sortBy(_._2).toSeq
    out shouldBe Seq((3L, 1), (4L, 2)) // 1, 2 above band; 5 below
  }

  test("rrfFuse: a doc mid-ranked in BOTH lists beats each list's " +
      "leader; absent docs contribute exactly zero; score is the " +
      "fixed-order sum of exact divisions") {
    import org.apache.spark.sql.functions.col
    val lex = Seq((10L, 1L), (11L, 2L), (99L, 3L)).toDF("id", "rank")
    val sem = Seq((20L, 1L), (21L, 2L), (99L, 3L)).toDF("id", "rank")
    val out = Similarity.rrfFuse(Seq("lex" -> lex, "sem" -> sem),
        "id", "rank", kRrf = 60, topN = 10)
      .select("fused_rank", "id", "rrf_score")
      .as[(Int, Long, Double)].collect().sortBy(_._1).toSeq
    // 99 is 3rd in both lists yet fuses to #1: agreement wins
    out.head._2 shouldBe 99L
    out.head._3 shouldBe (1.0 / 63 + 1.0 / 63)
    // single-list docs: exactly one term, the other exactly 0
    out.find(_._2 == 10L).get._3 shouldBe (1.0 / 61 + 0.0)
    // id tie-break: lex-only 10 and sem-only 20 share rank 1 terms
    out.map(_._2) shouldBe Seq(99L, 10L, 20L, 11L, 21L)
  }

  test("pq_encode/pq_decode: per-subspace min-L2 codes with lower-index " +
      "ties, concatenated reconstruction") {
    import org.apache.spark.sql.functions.col
    val books = Array(
      Array(Array(0.0, 0.0), Array(1.0, 1.0)),
      Array(Array(2.0, 2.0), Array(3.0, 3.0)))
    val out = Seq(Seq(0.9, 0.9, 2.1, 2.1), Seq(0.1, 0.0, 3.0, 2.9))
      .toDF("v")
      .select(
        graft.functions.Centroids.pq_encode(col("v"), books).as("codes"))
      .select(col("codes"),
        graft.functions.Centroids.pq_decode(col("codes"), books).as("dec"))
      .as[(Seq[Int], Seq[Double])].collect().toSeq
    out shouldBe Seq(
      (Seq(1, 0), Seq(1.0, 1.0, 2.0, 2.0)),
      (Seq(0, 1), Seq(0.0, 0.0, 3.0, 3.0)))
    // exact equidistance ties to the LOWER codeword index
    val tieBooks = Array(Array(Array(0.0), Array(2.0)))
    Seq(Seq(1.0)).toDF("v")
      .select(graft.functions.Centroids.pq_encode(col("v"), tieBooks))
      .as[Seq[Int]].collect().head shouldBe Seq(0)
  }

  test("pqCodebooks (spherical=false): one hand-computed Lloyd step — " +
      "min-L2 assignment, exact fixed-point UN-normalized means") {
    import org.apache.spark.sql.functions.col
    // init = first 2 rows by id: c0=[0,0], c1=[4,4]; ids 0,2 -> c0,
    // ids 1,3 -> c1; means [0.1,0.1] and [4.1,4.1] — NOT unit vectors,
    // the point of the non-spherical mode.
    val df = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(4.0, 4.0)),
      (2L, Seq(0.2, 0.2)), (3L, Seq(4.2, 4.2))).toDF("id", "v")
    val books = Similarity.pqCodebooks(df, "id", "v", dim = 2, m = 1,
      ks = 2, iters = 1)
    books.length shouldBe 1
    books(0).map(_.toSeq).toSeq shouldBe
      Seq(Seq(0.1, 0.1), Seq(4.1, 4.1))
    // two subspaces train independently on their own slices
    val df2 = Seq(
      (0L, Seq(0.0, 0.0, 4.0, 4.0)), (1L, Seq(4.0, 4.0, 0.0, 0.0)),
      (2L, Seq(0.2, 0.2, 4.2, 4.2)), (3L, Seq(4.2, 4.2, 0.2, 0.2)))
      .toDF("id", "v")
    val books2 = Similarity.pqCodebooks(df2, "id", "v", dim = 4, m = 2,
      ks = 2, iters = 1)
    books2(0).map(_.toSeq).toSeq shouldBe
      Seq(Seq(0.1, 0.1), Seq(4.1, 4.1))
    books2(1).map(_.toSeq).toSeq shouldBe
      Seq(Seq(4.1, 4.1), Seq(0.1, 0.1))
    intercept[IllegalArgumentException] {
      Similarity.pqCodebooks(df2, "id", "v", dim = 4, m = 3, ks = 2)
    }.getMessage should include("split evenly")
  }

  test("pqTopKReranked with a corpus-wide shortlist equals brute force " +
      "exactly (the rerank ceiling)") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7L)
    val corpus = Seq.tabulate(40)(i =>
      (i.toLong, Seq.fill(8)(rnd.nextDouble() - 0.5))).toDF("id", "v")
    val q = corpus.where(col("id") < 3)
      .select(col("id").as("qid"), col("v").as("qvec"))
    val books = Similarity.pqCodebooks(corpus, "id", "v", dim = 8,
      m = 4, ks = 4, iters = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3)).toSeq
    rows(Similarity.pqTopKReranked(corpus, "id", "v", q, "qid", "qvec",
      k = 5, shortlist = 40, books)) shouldBe
      rows(Similarity.bruteForceTopK(corpus, "id", "v", q, "qid", "qvec",
        k = 5))
    intercept[IllegalArgumentException] {
      Similarity.pqTopKReranked(corpus, "id", "v", q, "qid", "qvec",
        k = 5, shortlist = 4, books)
    }.getMessage should include("shortlist")
  }

  test("ivfPqTopK composition ceilings: full probing makes the ADC " +
      "stage equal pqTopK (list gating off), and full probing + " +
      "corpus-wide shortlist equals brute force exactly") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(11L)
    val corpus = Seq.tabulate(40)(i =>
      (i.toLong, Seq.fill(8)(rnd.nextDouble() - 0.5))).toDF("id", "v")
    val q = corpus.where(col("id") < 3)
      .select(col("id").as("qid"), col("v").as("qvec"))
    val cents = Similarity.trainCentroids(corpus, "id", "v",
      k = 4, iters = 2)
    val books = Similarity.pqCodebooks(corpus, "id", "v", dim = 8,
      m = 4, ks = 4, iters = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3)).toSeq
    // probing every list == a flat code scan: ADC stage equals pqTopK
    rows(Similarity.ivfPqTopKAdc(corpus, "id", "v", q, "qid", "qvec",
      k = 5, cents, nprobe = 4, books)) shouldBe
      rows(Similarity.pqTopK(corpus, "id", "v", q, "qid", "qvec",
        k = 5, books))
    // ...and with a corpus-wide shortlist the exact rerank recovers
    // brute force (the composition's recall ceiling)
    rows(Similarity.ivfPqTopK(corpus, "id", "v", q, "qid", "qvec",
      k = 5, cents, nprobe = 4, books, shortlist = 40)) shouldBe
      rows(Similarity.bruteForceTopK(corpus, "id", "v", q, "qid", "qvec",
        k = 5))
    // partial probing: every query still finds itself (self-vector sits
    // in the query's own nearest list, reconstruction notwithstanding,
    // after the exact rerank)
    val partial = Similarity.ivfPqTopK(corpus, "id", "v", q, "qid",
      "qvec", k = 5, cents, nprobe = 1, books, shortlist = 40)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    (0L to 2L).foreach(i => partial should contain((i, i)))
    intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(corpus, "id", "v", q, "qid", "qvec",
        k = 5, cents, nprobe = 1, books, shortlist = 4)
    }.getMessage should include("shortlist")
  }

  test("embeddingShift: identical snapshots give cos 1 / l2 0 exactly; " +
      "a hand-computed mean shift is exact; one-sided groups drop") {
    import org.apache.spark.sql.functions.col
    val a = Seq((1L, "g", Seq(1.0, 0.0)), (2L, "g", Seq(0.0, 1.0)),
      (3L, "only_a", Seq(1.0, 1.0))).toDF("id", "grp", "v")
    val same = Similarity.embeddingShift(a, a, "grp", "v")
      .select("grp", "n_ref", "n_cur", "cos_means", "l2_means")
      .as[(String, Long, Long, Double, Double)].collect().sortBy(_._1)
    same.map(_._1).toSeq shouldBe Seq("g", "only_a")
    // cos of a vector with itself rounds within an ulp of 1 (the
    // sqrt·sqrt denominator); the l2 of identical means is exactly 0
    same.foreach { r => r._4 shouldBe 1.0 +- 1e-12; r._5 shouldBe 0.0 }
    // shifted second snapshot: mean_ref = (0.5, 0.5),
    // mean_cur = (1.0, 0.0) -> cos = 0.5/sqrt(0.5), l2 = sqrt(0.5)
    val b = Seq((9L, "g", Seq(1.0, 0.0))).toDF("id", "grp", "v")
    val shift = Similarity.embeddingShift(a, b, "grp", "v")
      .select("grp", "n_ref", "n_cur", "cos_means", "l2_means")
      .as[(String, Long, Long, Double, Double)].collect()
    shift.map(_._1).toSeq shouldBe Seq("g") // only_a has no cur side
    val (_, nr, nc, cosm, l2m) = shift.head
    (nr, nc) shouldBe ((2L, 1L))
    cosm shouldBe 0.5 / (math.sqrt(0.5) * 1.0) +- 1e-12
    l2m shouldBe math.sqrt(0.5) +- 1e-12
  }

  test("residual IVF-PQ: on a CLUSTERED corpus residual codes beat raw " +
      "codes at identical serve cost (the Jégou 2011 premise, " +
      "controlled); ivfResiduals really removes the centroid") {
    import org.apache.spark.sql.functions.col
    // corpus with genuine cluster structure: 4 well-separated unit
    // centers in 8-dim, tight noise — the coarse quantizer explains
    // most of the energy, exactly when residual coding should win
    val rnd = new scala.util.Random(5L)
    val centers = Seq.fill(4)(Array.fill(8)(rnd.nextGaussian())).map { c =>
      val n = math.sqrt(c.map(x => x * x).sum); c.map(_ / n) }
    val corpus = Seq.tabulate(240) { i =>
      val c = centers(i % 4)
      val v = c.map(_ + 0.15 * rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(_ / n).toSeq)
    }.toDF("id", "v")
    val q = corpus.where(col("id") < 8)
      .select(col("id").as("qid"), col("v").as("qvec"))
    val cents = Similarity.trainCentroids(corpus, "id", "v", k = 4,
      iters = 4)
    val rawBooks = Similarity.pqCodebooks(corpus, "id", "v", dim = 8,
      m = 2, ks = 4, iters = 4)
    val residBooks = Similarity.pqCodebooks(
      Similarity.ivfResiduals(corpus, "id", "v", cents), "id", "resid",
      dim = 8, m = 2, ks = 4, iters = 4)
    val brute = Similarity.bruteForceTopK(corpus, "id", "v", q, "qid",
        "qvec", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def adcHits(books: Array[Array[Array[Double]]], residual: Boolean) =
      Similarity.ivfPqTopKAdc(corpus, "id", "v", q, "qid", "qvec",
          k = 5, cents, nprobe = 4, books, residual)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .count(brute.contains)
    val raw = adcHits(rawBooks, residual = false)
    val resid = adcHits(residBooks, residual = true)
    withClue(s"raw=$raw resid=$resid of ${brute.size}: ") {
      resid should be > raw
    }
    // ivfResiduals really subtracts the assigned centroid: residual
    // norms are far below the unit vectors' 1 on this clustered corpus
    val meanResidNorm = Similarity
      .ivfResiduals(corpus, "id", "v", cents)
      .select(aggregate(col("resid"), lit(0.0),
        (a, x) => a + x * x).as("e"))
      .agg(avg(sqrt(col("e")))).as[Double].head()
    meanResidNorm should be < 0.7
  }

  test("incremental IVF-PQ index: folding a snapshot into a stored " +
      "index (encode-against-stored-artifacts + append) serves " +
      "IDENTICALLY to a from-scratch build with the same artifacts, " +
      "raw and residual") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(23L)
    val corpus = Seq.tabulate(60)(i =>
      (i.toLong, Seq.fill(8)(rnd.nextDouble() - 0.5))).toDF("id", "v")
    val evens = corpus.where(col("id") % 2 === 0) // the stored history
    val odds = corpus.where(col("id") % 2 === 1) // tonight's snapshot
    val q = corpus.where(col("id") < 3)
      .select(col("id").as("qid"), col("v").as("qvec"))
    val cents = Similarity.trainCentroids(evens, "id", "v", k = 4,
      iters = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank", "score")
        .as[(Long, Long, Int, Double)].collect()
        .sortBy(r => (r._1, r._3)).toSeq
    // raw codes
    val books = Similarity.pqCodebooks(evens, "id", "v", dim = 8,
      m = 4, ks = 4, iters = 2)
    val folded = Similarity.ivfPqIndexAppend(
      Similarity.ivfPqIndex(evens, "id", "v", cents, books),
      odds, "id", "v", cents, books)
    folded.count() shouldBe 60
    rows(Similarity.ivfPqServeAdc(folded, "id", q, "qid", "qvec",
      k = 5, cents, nprobe = 2, books)) shouldBe
      rows(Similarity.ivfPqTopKAdc(corpus, "id", "v", q, "qid", "qvec",
        k = 5, cents, nprobe = 2, books))
    // residual codes: the index's cluster column feeds reconstruction
    val rBooks = Similarity.pqCodebooks(
      Similarity.ivfResiduals(evens, "id", "v", cents), "id", "resid",
      dim = 8, m = 4, ks = 4, iters = 2)
    val rFolded = Similarity.ivfPqIndexAppend(
      Similarity.ivfPqIndex(evens, "id", "v", cents, rBooks,
        residual = true),
      odds, "id", "v", cents, rBooks, residual = true)
    rows(Similarity.ivfPqServeAdc(rFolded, "id", q, "qid", "qvec",
      k = 5, cents, nprobe = 2, rBooks, residual = true)) shouldBe
      rows(Similarity.ivfPqTopKAdc(corpus, "id", "v", q, "qid", "qvec",
        k = 5, cents, nprobe = 2, rBooks, residual = true))
    // append refuses a frame that is not an ivfPqIndex artifact
    intercept[IllegalArgumentException] {
      Similarity.ivfPqIndexAppend(corpus, odds, "id", "v", cents, books)
    }.getMessage should include("ivfPqIndex")
  }

  test("ivfPqIndexUpsert / ivfPqIndexRetract / ivfPqIndexCompact: " +
      "upsert == from-scratch on the FINAL vector per id; retraction " +
      "== from-scratch on survivors; compaction changes no row and " +
      "serves byte-identically") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(31L)
    val corpus = Seq.tabulate(60)(i =>
      (i.toLong, Seq.fill(8)(rnd.nextDouble() - 0.5))).toDF("id", "v")
    val evens = corpus.where(col("id") % 2 === 0)
    val odds = corpus.where(col("id") % 2 === 1)
    val cents = Similarity.trainCentroids(evens, "id", "v", k = 4,
      iters = 2)
    val books = Similarity.pqCodebooks(evens, "id", "v", dim = 8,
      m = 4, ks = 4, iters = 2)
    val stored = Similarity.ivfPqIndex(evens, "id", "v", cents, books)
    // snapshot = the odd half + RE-EMBEDDED versions of ids % 10 == 0
    // (reversed vectors stand in for an encoder re-run)
    val reembedded = evens.where(col("id") % 10 === 0)
      .select(col("id"), org.apache.spark.sql.functions.reverse(col("v"))
        .as("v"))
    val snapshot = odds.select(col("id"), col("v")).unionByName(reembedded)
    val upserted = Similarity.ivfPqIndexUpsert(stored, snapshot,
      "id", "v", cents, books)
    upserted.count() shouldBe 60 // no double-serving of re-embedded ids
    val finalCorpus = corpus.select(col("id"),
      org.apache.spark.sql.functions.when(col("id") % 10 === 0,
        org.apache.spark.sql.functions.reverse(col("v")))
        .otherwise(col("v")).as("v"))
    def idxRows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Int, Seq[Int])].collect().sortBy(_._1).toSeq
    idxRows(upserted) shouldBe
      idxRows(Similarity.ivfPqIndex(finalCorpus, "id", "v", cents, books))
    // retraction: anti-join == from-scratch on survivors; unknown ids
    // are a no-op
    val retracted = Similarity.ivfPqIndexRetract(upserted,
      Seq(4L, 7L, 999L).toDF("id"), "id")
    idxRows(retracted) shouldBe idxRows(Similarity.ivfPqIndex(
      finalCorpus.where(!col("id").isin(4L, 7L)), "id", "v",
      cents, books))
    // compaction: identical row set, byte-identical serve
    val q = finalCorpus.where(col("id") < 3)
      .select(col("id").as("qid"), col("v").as("qvec"))
    def serveRows(idx: org.apache.spark.sql.DataFrame) =
      Similarity.ivfPqServeAdc(idx, "id", q, "qid", "qvec",
          k = 5, cents, nprobe = 2, books)
        .select("query_id", "neighbor_id", "rank", "score")
        .as[(Long, Long, Int, Double)].collect()
        .sortBy(r => (r._1, r._3)).toSeq
    val compacted = Similarity.ivfPqIndexCompact(upserted, "id")
    idxRows(compacted) shouldBe idxRows(upserted)
    serveRows(compacted) shouldBe serveRows(upserted)
    intercept[IllegalArgumentException] {
      Similarity.ivfPqIndexCompact(corpus, "id")
    }.getMessage should include("ivfPqIndex")
  }

  test("pcaTopComponents: rank-1 2D data recovers the (1, 2) direction " +
      "exactly and claims the whole variance") {
    // points (0.125k, 0.25k), k in -2..2 — every coordinate is exactly
    // representable at the 2^14 fixed point, the covariance matrix is
    // exactly [[v, 2v], [2v, 4v]], and one matvec already lands on the
    // (1, 2) eigendirection, so loading2 = 2 * loading1 EXACTLY.
    val vecs = (-2 to 2).map(k =>
      Tuple1(Seq(0.125f * k, 0.25f * k)))
    val out = Similarity.pcaTopComponents(
        vecs.toDF("v"), "v", dim = 2, components = 1, rounds = 4)
      .as[(Int, Int, Double, Double, Double)].collect().sortBy(_._2)
    val Array(c1, c2) = out
    c2._3 shouldBe 2.0 * c1._3 // exact doubling survives IEEE
    c1._5 shouldBe 1.0 +- 1e-12 // rank-1: component 1 is ALL variance
    c1._4 should be > 0.0
  }

  test("pcaTopComponents: full-rank corpus gives orthogonal components " +
      "with descending variance shares; partition-invariant") {
    val rnd = new scala.util.Random(42)
    // anisotropic cloud: coord 1 dominates, coord 2 next, rest noise
    val vecs = Seq.fill(300)(Tuple1(Seq.tabulate(8) { j =>
      val sd = if (j == 0) 1.0 else if (j == 1) 0.4 else 0.05
      (rnd.nextGaussian() * sd).toFloat }))
    def run(parts: Int) = Similarity.pcaTopComponents(
        vecs.toDF("v").repartition(parts), "v", dim = 8,
        components = 2, rounds = 12)
      .as[(Int, Int, Double, Double, Double)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    val out = run(1)
    out shouldBe run(7) // exact integer sums -> identical everywhere
    val v1 = out.filter(_._1 == 1).map(_._3)
    val v2 = out.filter(_._1 == 2).map(_._3)
    math.abs(v1.zip(v2).map { case (a, b) => a * b }.sum) should be < 1e-6
    val (l1, l2) = (out.find(_._1 == 1).get._4, out.find(_._1 == 2).get._4)
    l1 should be > l2
    l2 should be > 0.0
    // dominant direction is coord 1 (then 2): largest |loading| first
    v1.map(math.abs).zipWithIndex.maxBy(_._1)._2 shouldBe 0
    v2.map(math.abs).zipWithIndex.maxBy(_._1)._2 shouldBe 1
  }

  test("pcaTopComponents guards fire loudly") {
    an[IllegalArgumentException] should be thrownBy
      Similarity.pcaTopComponents(
        Seq(Tuple1(Seq(1f, 2f))).toDF("v"), "v", dim = 2, components = 0)
    // declared dim mismatch -> loud row-level assert
    intercept[Exception] {
      Similarity.pcaTopComponents(
        Seq(Tuple1(Seq(1f, 2f, 3f))).toDF("v"), "v", dim = 2)
    }.getMessage should include("!= declared dim")
    // constant vectors -> zero variance, loud
    intercept[IllegalArgumentException] {
      Similarity.pcaTopComponents(
        Seq.fill(5)(Tuple1(Seq(0.25f, 0.25f))).toDF("v"), "v", dim = 2)
    }.getMessage should include("zero total variance")
    // rank-1 data + 2 components: deflation leaves only rounding
    // residue (~1e-17), so component 2 converges on noise with a
    // negligible share rather than degenerating — pin that the share
    // says "nothing here" instead of lying
    val resid = Similarity.pcaTopComponents(
        (-2 to 2).map(k => Tuple1(Seq(0.125f * k, 0.25f * k))).toDF("v"),
        "v", dim = 2, components = 2)
      .as[(Int, Int, Double, Double, Double)].collect()
      .filter(_._1 == 2).head
    resid._5 should be < 1e-10
  }

  test("pcaProject: identity loadings recover centered coordinates " +
      "exactly; fit+project collapses rank-1 data to one axis") {
    val df = Seq((1L, Seq(0.5f, 0.25f)), (2L, Seq(-0.5f, 0.75f)))
      .toDF("id", "v")
    val out = Similarity.pcaProject(df, "id", "v",
        means = Seq(0.5, 0.25), comps = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    out(0) shouldBe ((1L, 0.0, 0.0))
    out(1) shouldBe ((2L, -1.0, 0.5))
    // end-to-end: rank-1 cloud projects to pc1 = ±0.125k*sqrt(5),
    // pc2 ~ 0 (all variance on the first axis)
    val cloud = (-2 to 2).map(k =>
      (k.toLong, Seq(0.125f * k, 0.25f * k))).toDF("id", "v")
    val (means, comps, _) =
      Similarity.pcaFit(cloud, "v", dim = 2, components = 1, rounds = 4)
    val proj = Similarity.pcaProject(cloud, "id", "v",
        means.toSeq, comps.map(_._1.toSeq))
      .as[(Long, Double)].collect().sortBy(_._1)
    proj.foreach { case (k, pc1) =>
      math.abs(pc1) shouldBe 0.125 * math.abs(k) * math.sqrt(5.0) +- 1e-12
    }
    // loud dim mismatch
    intercept[Exception] {
      Similarity.pcaProject(df, "id", "v",
        means = Seq(0.0), comps = Seq(Seq(1.0))).collect()
    }.getMessage should include("!= trained dim")
  }
}
