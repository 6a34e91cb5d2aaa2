package graft.ops

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (`array<float>` /
  * `array<double>`), designed for the 100 TB shape:
  *
  *  - vector math (dot/norm/cosine) is pure Catalyst higher-order
  *    functions (`zip_with` + `aggregate`) — codegen'd, no UDF;
  *  - brute-force top-k BROADCASTS the (small) query set against the
  *    corpus and reduces with [[TopKByScore]], a `TypedImperativeAggregate`
  *    holding a bounded heap: partial top-k happens MAP-SIDE, so the
  *    shuffle carries at most `numQueries * k` rows per partition instead
  *    of the full `numQueries * corpusSize` score matrix;
  *  - the scale path buckets both sides with seeded random-hyperplane LSH
  *    (multi-table) and joins on `(table, bucket)` — never all-pairs.
  *
  * The reference engine has no similarity surface at all (it is a
  * stateless record-at-a-time transformer — SURVEY §2.3); this module is
  * part of the LLM-data-pipeline extension mandated by the brief.
  */
object Similarity {

  /** Element-wise dot product — `zip_with` + `aggregate` (NOTE: higher-
    * order functions are interpreted; fine for one-off math, not for the
    * hot scoring path — that uses the codegen'd kernel below). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity via the single-pass codegen'd kernel
    * ([[graft.functions.VectorHashes.cosine_sim]]); zero-norm or
    * length-mismatched vectors yield null (not NaN/div-0). Arithmetic
    * order matches the naive fold, so results are bit-identical to it. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorHashes.cosine_sim(a, b)

  /** Brute-force exact cosine top-k: for every row of `queries`
    * (`qidCol`, `qvecCol`), the `k` nearest rows of `corpus`
    * (`idCol`, `vecCol`) by cosine. Ties broken by ascending id
    * (deterministic).
    *
    * Scale contract: `queries` MUST be the small side — it is broadcast;
    * the corpus is scanned once, partial top-k heaps combine map-side.
    * Output: one row per (query_id, neighbor) with `rank` 1..k.
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int): DataFrame = {
    val q = renamedQueries(corpus, queries, qidCol, qvecCol)
    val scored = corpus.crossJoin(broadcast(q))
      .select(col(QId).as("query_id"), col(idCol).as("neighbor_id"),
        cosine(col(vecCol), col(QVec)).as("score"))
      .where(col("score").isNotNull)
    topKPerKey(scored, "query_id", "neighbor_id", "score", k)
  }

  /** HARD-NEGATIVE mining for contrastive training: per query, the
    * top-k most-similar corpus rows whose cosine falls in
    * `[minScore, maxScore)` — the band just BELOW the near-dup
    * threshold. Random negatives are too easy (the model learns
    * nothing); rows above the dup threshold are FALSE negatives
    * (paraphrases punished as non-matches poison the loss); the
    * closest non-duplicates in between are exactly what embedding /
    * retrieval training wants. Self-matches fall out with the dup band
    * (cosine(x, x) = 1 >= maxScore).
    *
    * Same scale contract and machinery as [[bruteForceTopK]] (queries
    * broadcast, one corpus scan, bounded-heap map-side partials, no
    * Window) with the band filter applied BEFORE the heap — out-of-band
    * rows never enter the aggregate. For a corpus-sized query side,
    * run the band filter against [[ivfTopK]] candidates instead. */
  def hardNegatives(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, k: Int,
      maxScore: Double, minScore: Double = -1.0): DataFrame = {
    require(minScore < maxScore,
      s"need minScore < maxScore, got $minScore / $maxScore")
    val q = renamedQueries(corpus, queries, qidCol, qvecCol)
    val scored = corpus.crossJoin(broadcast(q))
      .select(col(QId).as("query_id"), col(idCol).as("neighbor_id"),
        cosine(col(vecCol), col(QVec)).as("score"))
      .where(col("score").isNotNull &&
        col("score") >= minScore && col("score") < maxScore)
    topKPerKey(scored, "query_id", "neighbor_id", "score", k)
  }

  /** RECIPROCAL-RANK FUSION (Cormack, Clarke & Buettcher 2009) — the
    * hybrid-retrieval combiner: merge rankings from rankers with
    * incomparable score scales (BM25 points vs cosine vs a reranker)
    * by RANKS alone, `score(d) = Σ over lists containing d of
    * 1 / (kRrf + rank_d)`. The standard first choice because rank is
    * the only scale-free common currency and the 1/(k+r) discount
    * rewards agreement near the top without letting one list's scores
    * dominate. Replayable by construction: the fused score sums the
    * per-list terms in LIST DECLARATION ORDER as one fixed expression
    * (fp addition is not associative — the association order is part
    * of the contract), each term one exact IEEE division of small
    * integers; a doc absent from a list contributes exactly 0.
    *
    * Scale shape: the inputs are already bounded top-k frames (that is
    * what a ranker emits), so everything here is k-sized — full-outer
    * joins on the id across lists, one fixed-order projection, a
    * bounded sort for the fused top-`topN`. Returns `(fused_rank,
    * idCol, rank_<name>..., rrf_score)`. */
  def rrfFuse(rankings: Seq[(String, DataFrame)], idCol: String,
      rankCol: String, kRrf: Int = 60, topN: Int = 20): DataFrame = {
    require(rankings.size >= 2, "rrfFuse needs at least two rankings")
    require(rankings.map(_._1).distinct.size == rankings.size,
      "ranking names must be distinct")
    require(kRrf >= 1, s"kRrf must be >= 1, got $kRrf")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val joined = rankings.map { case (nm, df) =>
      df.select(col(idCol), col(rankCol).cast(LongType).as(s"rank_$nm"))
    }.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = rankings.map { case (nm, _) =>
      coalesce(lit(1.0) /
        (lit(kRrf.toDouble) + col(s"rank_$nm").cast(DoubleType)), lit(0.0))
    }.reduce(_ + _)
    val top = joined
      .select(col(idCol) +: rankings.map(r => col(s"rank_${r._1}")) :+
        score.as("rrf_score"): _*)
      .orderBy(col("rrf_score").desc, col(idCol)).limit(topN)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rrf_score").desc, col(idCol))
    top.select(row_number().over(w).as("fused_rank") +: col(idCol) +:
      rankings.map(r => col(s"rank_${r._1}")) :+ col("rrf_score"): _*)
  }

  /** The query side renamed to reserved internal names before joining
    * against the corpus, so the standard SELF-query case (same frame or
    * same schema on both sides: idCol == qidCol, vecCol == qvecCol)
    * resolves instead of throwing AMBIGUOUS_REFERENCE. */
  private val QId = "__graft_q_id"
  private val QVec = "__graft_q_vec"
  private def renamedQueries(corpus: DataFrame, queries: DataFrame,
      qidCol: String, qvecCol: String): DataFrame = {
    require(!corpus.columns.contains(QId) && !corpus.columns.contains(QVec),
      s"corpus column names $QId/$QVec are reserved")
    queries.select(col(qidCol).as(QId), col(qvecCol).as(QVec))
  }

  /** Reduce (key, id, score) rows to per-key top-k via the bounded-heap
    * aggregate; exploded back to one row per neighbor with rank. The id
    * column must be integral (cast to the aggregate's long contract so
    * int/short ids work out of the box); strings/doubles are rejected
    * loudly — a silent cast would null them and emit empty results. */
  def topKPerKey(scored: DataFrame, keyCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    scored.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"topKPerKey id column `$idCol` must be integral, got ${other.simpleString}")
    }
    val agg = GraftColumnBridge.column(
      TopKByScore(
        GraftColumnBridge.expression(col(idCol).cast(LongType)),
        GraftColumnBridge.expression(col(scoreCol).cast(DoubleType)),
        k).toAggregateExpression())
    scored.groupBy(col(keyCol))
      .agg(agg.as("topk"))
      .select(col(keyCol), posexplode(col("topk")).as(Seq("pos", "nb")))
      .select(col(keyCol), col("nb.id").as(idCol),
        col("nb.score").as(scoreCol), (col("pos") + 1).cast(IntegerType).as("rank"))
  }

  // ---------------------------------------------------------------- LSH

  /** Deterministic pseudo-random hyperplanes: `numTables` tables of
    * `planesPerTable` planes each, components in [-1, 1] from a seeded
    * generator (driver-side literals — the plan embeds the planes, so
    * executors do zero RNG and every run is reproducible). */
  private[graft] def hyperplanes(dim: Int, numTables: Int, planesPerTable: Int,
      seed: Long): Array[Array[Array[Double]]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(numTables, planesPerTable, dim)(rng.nextDouble() * 2 - 1)
  }

  /** Sign-bucket of a vector in one table: bit j = (v . plane_j) > 0.
    * One codegen'd pass over all planes with the plane matrix as a
    * codegen reference object ([[graft.functions.VectorHashes.plane_signs]])
    * — no per-plane norm work, no plan-literal plane matrix. */
  private def bucketCol(vec: Column, planes: Array[Array[Double]]): Column =
    graft.functions.VectorHashes.plane_signs(vec, planes)

  /** Attach `(table, bucket)` pairs: one output row per table (explode),
    * so downstream joins co-locate by bucket. */
  def withLshBuckets(df: DataFrame, vecCol: String, dim: Int,
      numTables: Int = 4, planesPerTable: Int = 12,
      seed: Long = 42L): DataFrame = {
    // withColumn REPLACES an existing column silently — reject clashes
    // like AsOfJoin/RangeJoin/SkewJoin do instead of eating user data
    // (e.g. the buckets of a previous withLshBuckets with other planes)
    val clashes = df.columns.toSet
      .intersect(Set("_tb", "lsh_table", "lsh_bucket"))
    require(clashes.isEmpty,
      s"column name(s) ${clashes.mkString(", ")} are reserved — rename them")
    val planes = hyperplanes(dim, numTables, planesPerTable, seed)
    val tb = array(planes.indices.map(t =>
      struct(lit(t).as("table"), bucketCol(col(vecCol), planes(t)).as("bucket"))): _*)
    df.withColumn("_tb", explode(tb))
      .withColumn("lsh_table", col("_tb.table"))
      .withColumn("lsh_bucket", col("_tb.bucket"))
      .drop("_tb")
  }

  // ---------------------------------------------------------------- IVF

  /** Modulus/multiplier of [[hashSampleFilter]]'s multiplicative hash
    * (a prime modulus and Knuth's 2^32/phi multiplier). */
  private[graft] val SampleMod = 1000000007L
  private[graft] val SampleMul = 2654435761L

  /** Deterministic hash-based row sample: keep a row iff a seeded
    * multiplicative hash of its id lands below `fraction` of the
    * modulus. Unlike `Dataset.sample` (whose Bernoulli RNG is keyed by
    * partition index, so the kept set changes under repartitioning and
    * is irreproducible outside Spark), this is a pure function of the
    * id column — stable under retries/AQE re-plans and replayable
    * verbatim in the DuckDB oracle. The inner `pmod` bounds the
    * multiplicand so `id * mul` can never overflow a long (ANSI mode
    * would throw, non-ANSI would silently bias the sample). */
  def hashSampleFilter(id: Column, fraction: Double, seed: Long): Column =
    pmod(pmod(id.cast(LongType), lit(SampleMod)) * lit(SampleMul) + lit(seed),
      lit(SampleMod)) < lit((fraction * SampleMod).toLong)

  /** Train a spherical k-means coarse quantizer with Lloyd iterations
    * expressed as DataFrame jobs: assign rows to centroids with the
    * codegen'd [[graft.functions.Centroids.centroid_assign]] kernel
    * (one narrow pass), recompute per-dimension means via
    * posexplode + groupBy (shuffles `rows x dim` skinny tuples — train
    * on a SAMPLE at scale), normalize on the driver. Only `k x dim`
    * sums ever reach the driver per iteration. Deterministic init:
    * the k lowest-id vectors, normalized.
    *
    * Fully deterministic end to end: the sample is the id-hash filter
    * above, and the per-dimension mean accumulates FIXED-POINT longs
    * (each component quantized to 1e-6 before summing) instead of a
    * double `avg` — a distributed double sum's value depends on
    * partition/merge order, so the same job can produce different last
    * bits run to run; the long sum is exact and order-insensitive, and
    * the single driver-side division is bit-reproducible in any engine
    * (the DuckDB oracle replays the whole training loop). The <=5e-7
    * per-component quantization offset is noise to quantizer quality.
    *
    * Scale shape: training is a fixed number of narrow scans + skinny
    * shuffles over a bounded sample; serving (ivfTopK) never trains. */
  def trainCentroids(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 5, sampleFraction: Double = 1.0,
      seed: Long = 42L, spherical: Boolean = true): Array[Array[Double]] = {
    require(sampleFraction > 0.0 && sampleFraction <= 1.0)
    // At corpus scale, train the quantizer on a seeded sample — k-means
    // centroid quality saturates far below full-corpus size, and the
    // per-dimension-mean shuffle is `sampleRows x dim` skinny tuples.
    // Persist ONLY the sampled frame: each Lloyd iteration re-scans the
    // training input, and pinning a small sample pays the source scan +
    // sampling once instead of `iters` times. The full-corpus branch is
    // deliberately NOT cached — at corpus scale materializing the whole
    // vector column evicts everything else for a 5-scan loop, and a
    // columnar re-scan is the cheaper side of that trade.
    val sampled = sampleFraction < 1.0
    val train =
      if (sampled) df.where(hashSampleFilter(col(idCol), sampleFraction, seed))
        .select(col(vecCol)).persist()
      else df.select(col(vecCol))
    try {
      def normalize(v: Array[Double]): Array[Double] =
        if (!spherical) v
        else {
          val n = math.sqrt(v.map(x => x * x).sum)
          if (n > 0) v.map(_ / n) else v
        }
      // Non-spherical (plain L2) mode — the PQ codebook form: assign by
      // min squared distance, centroid = un-normalized mean.
      def assignExpr(centroids: Array[Array[Double]]) =
        if (spherical)
          graft.functions.Centroids.centroid_assign(col(vecCol), centroids)
        else element_at(graft.functions.Centroids.pq_encode(col(vecCol),
          Array(centroids)), 1)
      val init = df.orderBy(col(idCol)).limit(k)
        .select(col(vecCol).cast(ArrayType(DoubleType)).as("v"))
        .collect().map(r => normalize(r.getSeq[Double](0).toArray))
      var centroids = init
      for (_ <- 0 until iters) {
        val assigned = train.select(
          assignExpr(centroids).as("cluster"),
          posexplode(col(vecCol).cast(ArrayType(DoubleType))).as(Seq("pos", "x")))
        val sums = assigned.groupBy(col("cluster"), col("pos"))
          .agg(sum(floor(col("x") * lit(1e6) + lit(0.5))).as("s"),
            count(lit(1)).as("n"))
          .collect()
        val next = centroids.map(_.clone())
        sums.foreach { r =>
          next(r.getInt(0))(r.getInt(1)) =
            (r.getLong(2).toDouble / r.getLong(3).toDouble) / 1e6
        } // empty clusters keep their previous centroid (re-normalized below)
        centroids = next.map(normalize)
      }
      centroids
    } finally if (sampled) train.unpersist(blocking = false)
  }

  /** EMBEDDING DISTRIBUTION SHIFT between two corpus snapshots, per
    * group — the drift monitor for the EMBEDDING column (profileDrift
    * watches scalar columns; this watches the vector space): compare
    * each side's FIRST MOMENT, the per-dimension mean embedding, via
    * `cos_means` (≈1 when the group's semantic center held still) and
    * `l2_means` (the absolute shift). Mean drift is the standard
    * leading indicator that a source changed topic/provider/encoder
    * between snapshots — read it before ANN indexes or semantic-dedup
    * thresholds trained on the old snapshot are reused.
    *
    * Determinism (the [[trainCentroids]] mean recipe): per-dimension
    * sums of `floor(x·1e6 + 0.5)` — exact Longs, order-free — one
    * division per dimension, then fixed ascending-dimension folds for
    * the cosine and L2. Replays verbatim in SQL. LOUD raise past the
    * 2^53 exactness bound (~9e9 rows per group at unit-scale inputs).
    * Groups present on only one side drop (inner join): a shift needs
    * both moments; count appearing/vanishing groups with a plain
    * anti-join, not a drift number.
    *
    * Scale shape: each side is ONE slim `(group, pos, q)` explode ->
    * map-side-partial sum (rows·dim Long tuples, vectors never
    * shuffle whole), folded to one dim-length array per group; the
    * join is group-count sized. */
  def embeddingShift(ref: DataFrame, cur: DataFrame, groupCol: String,
      vecCol: String): DataFrame = {
    def means(df: DataFrame, side: String): DataFrame =
      df.where(col(vecCol).isNotNull)
        .select(col(groupCol),
          posexplode(col(vecCol).cast(ArrayType(DoubleType)))
            .as(Seq("pos", "x")))
        .groupBy(col(groupCol), col("pos"))
        .agg(sum(floor(col("x") * lit(1e6) + lit(0.5))).as("s"),
          count(lit(1)).as("n"))
        .groupBy(col(groupCol))
        .agg(max(when(col("n") > lit(9000000000L),
            raise_error(lit("embeddingShift: > 9e9 rows in a group — " +
              "the fixed-point mean sum would pass the 2^53 exactness " +
              "bound; shard the group or lower the scale")))
            .otherwise(col("n"))).as(s"n_$side"),
          array_sort(collect_list(struct(col("pos"),
            ((col("s").cast(DoubleType) / col("n").cast(DoubleType)) /
              lit(1e6)).as("m")))).as("__ms"))
        .select(col(groupCol), col(s"n_$side"),
          transform(col("__ms"), e => e.getField("m")).as(s"__mean_$side"))
    means(ref, "ref").join(means(cur, "cur"), Seq(groupCol))
      .select(col(groupCol), col("n_ref"), col("n_cur"),
        cosine(col("__mean_ref"), col("__mean_cur")).as("cos_means"),
        sqrt(aggregate(
          zip_with(col("__mean_ref"), col("__mean_cur"),
            (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x)).as("l2_means"))
  }

  /** IVF approximate top-k: corpus rows are bucketed by nearest
    * centroid (inverted lists); each query probes its `nprobe` nearest
    * centroids and exact cosine re-ranks the candidates. The join
    * shuffles by cluster id (cardinality k), so candidate work is
    * `~ corpus * nprobe / k` instead of all-pairs; raise k to shrink
    * lists, raise nprobe to raise recall. */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, centroids: Array[Array[Double]], nprobe: Int): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol),
      graft.functions.Centroids.centroid_assign(col(vecCol), centroids)
        .as("cluster"))
    val q = renamedQueries(corpus, queries, qidCol, qvecCol)
      .select(col(QId), col(QVec),
        explode(graft.functions.Centroids.centroid_probes(
          col(QVec), centroids, nprobe)).as("cluster"))
    val cand = c.join(q, "cluster")
      .select(col(QId).as("query_id"), col(idCol).as("neighbor_id"),
        cosine(col(vecCol), col(QVec)).as("score"))
      .where(col("score").isNotNull)
    // a (query, neighbor) pair appears at most once: each corpus row
    // lives in exactly ONE inverted list (unlike multi-table LSH)
    topKPerKey(cand, "query_id", "neighbor_id", "score", k)
  }

  /** [[ivfTopK]] serving from INT8-QUANTIZED inverted lists: the
    * corpus side of the candidate join carries
    * `(id, cluster, scale, codes)` — [[graft.functions.Quantization]]'s
    * symmetric int8 form, 1 byte per component + one double — instead
    * of the fp vector, a 4× (fp32) to 8× (fp64) cut in list
    * memory/shuffle/IO at serving time; candidates re-rank on the
    * DEQUANTIZED cosine against the full-precision query vector.
    *
    * Same bounded-heap scale shape as [[ivfTopK]] (map-side partial
    * top-k, no Window), and still fully deterministic: quantization is
    * floor-based half-up rounding (identical in every engine), so the
    * whole int8 serve path oracle-replays bit-for-bit — which is what
    * lets q_ann_ivf_int8 put the recall cost of the 4× compression
    * NEXT TO float serving as an exact, measured number (per-element
    * dequantization error <= scale/2; measured recall delta at the
    * tuned nprobe=8 point lives in the artifact). */
  def ivfTopKInt8(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, centroids: Array[Array[Double]], nprobe: Int): DataFrame = {
    // the stored list rows: cluster + quantized vector ONLY (the fp
    // vector column ends at this projection — that drop IS the win)
    val c = corpus.select(col(idCol),
      graft.functions.Centroids.centroid_assign(col(vecCol), centroids)
        .as("cluster"),
      graft.functions.Quantization.quantize(col(vecCol)).as("qz"))
    val q = renamedQueries(corpus, queries, qidCol, qvecCol)
      .select(col(QId), col(QVec),
        explode(graft.functions.Centroids.centroid_probes(
          col(QVec), centroids, nprobe)).as("cluster"))
    val cand = c.join(q, "cluster")
      .select(col(QId).as("query_id"), col(idCol).as("neighbor_id"),
        // widen the query to doubles: dequantization yields doubles and
        // the cosine kernel requires matching element types (the cast
        // is the same exact float->double widening the kernel does)
        cosine(graft.functions.Quantization.dequantize(
            col("qz.scale"), col("qz.codes")),
          col(QVec).cast(ArrayType(DoubleType))).as("score"))
      .where(col("score").isNotNull)
    topKPerKey(cand, "query_id", "neighbor_id", "score", k)
  }

  /** PRODUCT-QUANTIZATION codebooks (Jégou et al. 2011): split the
    * `dim`-dimensional vector into `m` contiguous subspaces of dim/m
    * and train an independent `ks`-codeword PLAIN k-means (min-L2
    * assignment, un-normalized means — magnitudes matter for
    * reconstruction, unlike the spherical coarse quantizer) per
    * subspace, each on the same seeded id-hash training sample. A code
    * is `m` small ints — m bytes at ks<=256 vs 4·dim (fp32) per
    * vector, a 32× memory/IO cut at dim=64, m=8. Deterministic for the
    * same reason [[trainCentroids]] is: hash-sampled training set,
    * exact fixed-point means, first-min tie-breaks. */
  def pqCodebooks(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int, ks: Int, iters: Int = 5, sampleFraction: Double = 1.0,
      seed: Long = 42L): Array[Array[Array[Double]]] = {
    require(m >= 1 && dim % m == 0,
      s"dim=$dim must split evenly into m=$m subspaces")
    val sub = dim / m
    // ALL m subspace codebooks train in ONE job per Lloyd iteration
    // (optimization r20, guide §1.2/§2.4 — remove redundant passes):
    // the pq_encode kernel already computes every subspace's
    // argmin-L2 assignment in a single codegen'd expression, and each
    // subspace's centroid update depends only on its OWN assignments,
    // so the previous subspace-at-a-time loop (m sample scans + m
    // persists + m orderBy-limit init scans + m·iters sequential
    // aggregate jobs) did m× redundant I/O and scheduling for
    // byte-identical math. Now: 1 sample scan + 1 init scan + iters
    // jobs, each shuffling the same skinny fixed-point tuples the
    // per-subspace jobs shuffled in total. The per-(subspace, cluster,
    // position) sums below are exact Longs (trainCentroids' recipe),
    // so the trained books are bit-identical to the old path's — the
    // oracle replays of every PQ query are unchanged.
    val sampled = sampleFraction < 1.0
    val train =
      if (sampled) df.where(hashSampleFilter(col(idCol), sampleFraction, seed))
        .select(col(vecCol)).persist()
      else df.select(col(vecCol))
    try {
      // Init per subspace = the j-th slice of the ks lowest-id vectors —
      // the exact rows (and slice-clamp semantics on short vectors) the
      // per-subspace trainCentroids init collected.
      val init = df.orderBy(col(idCol)).limit(ks)
        .select(col(vecCol).cast(ArrayType(DoubleType)).as("v"))
        .collect().map(_.getSeq[Double](0).toArray)
      var books: Array[Array[Array[Double]]] = (0 until m).toArray.map { j =>
        init.map(_.slice(j * sub, j * sub + sub))
      }
      for (_ <- 0 until iters) {
        val assigned = train.select(
          graft.functions.Centroids.pq_encode(col(vecCol), books).as("codes"),
          posexplode(col(vecCol).cast(ArrayType(DoubleType)))
            .as(Seq("gpos", "x")))
          // trailing elements of an OVER-LONG vector (len > dim) would
          // compute gpos div sub >= m, make element_at(codes, j+1)
          // NULL, and NPE the driver-side fold — ignore them, exactly
          // as the old per-subspace slice() path did (r21, ADVICE fix)
          .where(col("gpos") < lit(dim))
        val sums = assigned.select(
            expr(s"CAST(gpos div $sub AS INT)").as("j"),
            expr(s"element_at(codes, CAST(gpos div $sub AS INT) + 1)")
              .as("cluster"),
            expr(s"CAST(gpos % $sub AS INT)").as("pos"),
            col("x"))
          .groupBy(col("j"), col("cluster"), col("pos"))
          .agg(sum(floor(col("x") * lit(1e6) + lit(0.5))).as("s"),
            count(lit(1)).as("n"))
          .collect()
        val next = books.map(_.map(_.clone()))
        sums.foreach { r =>
          next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
            (r.getLong(3).toDouble / r.getLong(4).toDouble) / 1e6
        } // empty codewords keep their previous value (trainCentroids' rule)
        books = next
      }
      books
    } finally if (sampled) train.unpersist(blocking = false)
  }

  /** PQ-flat approximate top-k by ASYMMETRIC DISTANCE (ADC): the
    * corpus side carries only its `m`-byte PQ codes — the projection
    * that drops the fp vector IS the win, as in [[ivfTopKInt8]] — and
    * each candidate scores as `cosine(reconstruction, query)` against
    * the FULL-PRECISION query (asymmetric: only the corpus side is
    * quantized, the standard recall-preserving form). The cosine of
    * the reconstruction decomposes into per-subspace query×codeword
    * dots — textbook ADC — while reusing the proven deterministic
    * cosine kernel. Same scale contract as [[bruteForceTopK]]:
    * queries broadcast, ONE corpus scan, bounded-heap map-side
    * partials, no Window; at corpus-side query scale, gate candidates
    * through the inverted lists instead — that composition is
    * [[ivfPqTopKAdc]]/[[ivfPqTopK]] (q_ann_ivfpq).
    * Ranking ties break by ascending neighbor id. */
  def pqTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, k: Int,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val enc = graft.functions.Centroids.pq_encode(col(vecCol), codebooks)
    // the stored rows: id + codes ONLY; reconstruction happens at
    // scoring time from the broadcast codebooks
    val c = corpus.select(col(idCol), enc.as("codes"))
    val q = renamedQueries(corpus, queries, qidCol, qvecCol)
    val scored = c.crossJoin(broadcast(q))
      .select(col(QId).as("query_id"), col(idCol).as("neighbor_id"),
        cosine(
          graft.functions.Centroids.pq_decode(col("codes"), codebooks),
          col(QVec).cast(ArrayType(DoubleType))).as("score"))
      .where(col("score").isNotNull)
    topKPerKey(scored, "query_id", "neighbor_id", "score", k)
  }

  /** The standard PQ SERVING architecture: [[pqTopK]]'s ADC pass
    * shortlists `shortlist` candidates from codes alone, then ONLY the
    * shortlist re-ranks on the exact stored vector — the fp vectors
    * stay on cold storage and are touched `|queries|·shortlist` times
    * total, never corpus-scanned. Measured on this corpus: 8-byte
    * codes (m=8, ks=16 — a 32× cut vs fp32) with shortlist=100
    * recover recall@5 ≈ 0.92 vs ADC-only ≈ 0.44; the shortlist join is
    * a broadcast-sized frame against the corpus scan. */
  def pqTopKReranked(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, k: Int,
      shortlist: Int, codebooks: Array[Array[Array[Double]]]): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist must be >= k=$k")
    val sl = pqTopK(corpus, idCol, vecCol, queries, qidCol, qvecCol,
      shortlist, codebooks)
    val q = renamedQueries(corpus, queries, qidCol, qvecCol)
    val exact = broadcast(sl.select(col("query_id"), col("neighbor_id")))
      .join(corpus.select(col(idCol).cast(LongType).as("neighbor_id"),
        col(vecCol).as("__nvec")), "neighbor_id")
      .join(broadcast(q.select(col(QId).as("query_id"), col(QVec))),
        "query_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__nvec"), col(QVec)).as("score"))
      .where(col("score").isNotNull)
    topKPerKey(exact, "query_id", "neighbor_id", "score", k)
  }

  /** IVF-PQ COMPOSED SERVING, ADC stage (Jégou et al. 2011 §IV-B) —
    * the production ANN layout at 100 TB: corpus rows are stored as
    * `(coarse cluster, m-byte PQ code)` inverted lists, queries probe
    * their `nprobe` nearest coarse centroids, and ADC scores ONLY the
    * probed lists' codes — the layout that works when neither the fp32
    * vectors NOR a flat code table can be scanned per query. Serve
    * cost: `~ corpus * nprobe / k_coarse` m-byte code reads per query
    * (vs [[pqTopK]]'s full code scan, vs [[ivfTopK]]'s fp-vector list
    * scan). The probe frame is explicitly broadcast, so the corpus
    * codes never shuffle — each list partition filters in place.
    *
    * With `residual = true` the codes encode the COARSE RESIDUAL
    * `x/|x| − centroid(x)` instead of the raw vector — Jégou 2011's
    * IVF-ADC formulation: when the coarse quantizer explains variance
    * (clustered corpora), residuals carry less energy than the unit
    * vectors, the same m-byte budget quantizes a tighter distribution,
    * and recall improves at IDENTICAL serve cost (SimilaritySpec pins
    * this with a controlled clustered corpus). The win is NOT
    * unconditional: a unit residual's energy is `2 − 2·cos(x, c)`,
    * which EXCEEDS the unit vector's 1 whenever cos(x, c) < 0.5 — on a
    * structureless corpus (this repo's synthetic embeddings: mean
    * assigned-centroid cosine 0.27) residual codes measurably lose to
    * raw codes; q_ann_ivfpq (raw) vs q_ann_ivfpq_residual publishes
    * that head-to-head. The reconstruction adds the assigned centroid
    * back (`pq_decode(codes) + centroid`), an elementwise `zip_with`
    * over two short arrays — codebooks for the residual path must be
    * trained on [[ivfResiduals]]' output.
    * A (query, neighbor) pair appears at most once (one list per
    * corpus row, distinct probes). Ranking ties break by ascending
    * neighbor id. */
  def ivfPqTopKAdc(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, k: Int,
      centroids: Array[Array[Double]], nprobe: Int,
      codebooks: Array[Array[Array[Double]]],
      residual: Boolean = false): DataFrame =
    ivfPqServeAdc(
      ivfPqIndex(corpus, idCol, vecCol, centroids, codebooks, residual),
      idCol, queries, qidCol, qvecCol, k, centroids, nprobe, codebooks,
      residual)

  /** The PERSISTED IVF-PQ INDEX artifact: `(id, cluster, codes)` — one
    * row per corpus vector, its coarse inverted-list assignment plus
    * its m-byte PQ code. This frame (written to parquet, partitioned
    * by `cluster`) IS the production ANN index at 100 TB: serving
    * ([[ivfPqServeAdc]]) touches only the probed lists' codes, and a
    * NIGHTLY SNAPSHOT folds in via [[ivfPqIndexAppend]] — encode the
    * delta against the STORED centroids/codebooks, append; the old
    * rows are never re-read, let alone re-encoded. Encoding is a pure
    * deterministic per-row function of (vector, artifacts), so
    * `index(A) ∪ index(B) == index(A ∪ B)` exactly — incremental
    * maintenance loses nothing vs a from-scratch rebuild with the same
    * trained artifacts (q_ann_incr's oracle proves this end to end;
    * what CAN drift is the artifacts' fit to the new data, which is
    * what [[embeddingShift]] monitors — the reuse-or-retrain gate).
    * With `residual = true` codes quantize the coarse residual
    * ([[ivfPqTopKAdc]]'s contract; codebooks must be trained on
    * [[ivfResiduals]] output). */
  /** FNV-1a-style 64-bit fold over the exact double BITS of a trained
    * artifact — deterministic across JVMs/engines, computed driver-side
    * (the artifacts are local arrays), so index provenance can be
    * checked at PLAN time with zero Spark work. */
  private def artifactFp(values: Iterator[Double]): Long =
    values.foldLeft(0xcbf29ce484222325L)((h, d) =>
      (h ^ java.lang.Double.doubleToLongBits(d)) * 0x100000001b3L)

  /** The [[ArtifactStamp]] parameter set binding an [[ivfPqIndex]] to
    * the EXACT trained artifacts and geometry it was encoded with:
    * shape params plus content fingerprints of the centroids and
    * codebooks — the wrong-codebook merge/serve (confident nonsense
    * scores) becomes a plan-time raise instead of a caller contract. */
  private def ivfPqStampParams(centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      residual: Boolean): Seq[(String, Long)] = Seq(
    "ivf_k" -> centroids.length.toLong,
    "dim" -> centroids.headOption.map(_.length.toLong).getOrElse(0L),
    "m" -> codebooks.length.toLong,
    "ks" -> codebooks.headOption.map(_.length.toLong).getOrElse(0L),
    "residual" -> (if (residual) 1L else 0L),
    "cents_fp" -> artifactFp(centroids.iterator.flatten),
    "books_fp" -> artifactFp(codebooks.iterator.flatMap(_.iterator.flatten)))

  def ivfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      residual: Boolean = false): DataFrame = {
    val cl = graft.functions.Centroids.centroid_assign(col(vecCol),
      centroids)
    // the stored inverted-list rows: id + coarse cluster + codes ONLY
    // (the fp vector column ends at this projection — that drop IS the
    // win, as in pqTopK/ivfTopKInt8)
    val encoded =
      if (residual)
        withResidual(
          corpus.select(col(idCol), col(vecCol), cl.as("cluster")),
          vecCol, "cluster", centroids, "__resid")
          .select(col(idCol), col("cluster"),
            graft.functions.Centroids.pq_encode(col("__resid"), codebooks)
              .as("codes"))
      else
        corpus.select(col(idCol), cl.as("cluster"),
          graft.functions.Centroids.pq_encode(col(vecCol), codebooks)
            .as("codes"))
    ArtifactStamp.stamp(encoded, "codes", "ivf_pq",
      ivfPqStampParams(centroids, codebooks, residual): _*)
  }

  /** Fold a new snapshot into a STORED [[ivfPqIndex]]: encode ONLY the
    * arriving rows against the stored centroids/codebooks and append.
    * The index side passes through untouched — no retrain, no rescan
    * of old vectors; nightly cost is O(|delta|), the
    * [[graft.ops.Dedup.screenAgainstLshIndex]] discipline for ANN.
    * Contract: snapshot ids must be disjoint from the index's (an
    * upsert needs an anti-join first — [[graft.ops.Merge]] territory);
    * `centroids`/`codebooks`/`residual` must be the artifacts the
    * index was built with, or the union mixes incompatible codes. */
  def ivfPqIndexAppend(index: DataFrame, snapshot: DataFrame,
      idCol: String, vecCol: String, centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      residual: Boolean = false): DataFrame = {
    require(index.columns.toSeq == Seq(idCol, "cluster", "codes"),
      s"index must be an ivfPqIndex frame ($idCol, cluster, codes); " +
        s"got ${index.columns.mkString(", ")}")
    // plan-time provenance: the stored index must have been encoded
    // with THESE artifacts (content fingerprints) or the union mixes
    // incompatible codes — previously only a docstring contract
    ArtifactStamp.check(index, "codes", "ivf_pq", "ivfPqIndexAppend",
      ivfPqStampParams(centroids, codebooks, residual): _*)
    index.unionByName(
      ivfPqIndex(snapshot, idCol, vecCol, centroids, codebooks, residual))
  }

  /** UPSERT a snapshot into a stored [[ivfPqIndex]] — the re-embedding
    * path [[ivfPqIndexAppend]]'s disjoint-id contract excludes: a doc
    * whose vector CHANGED (re-run encoder, corrected content) arrives
    * with an id the index already holds, so its old code row must
    * retire first or the index would serve both versions. One
    * anti-join on the (small, broadcast-able) arriving id set retires
    * the stale rows, then the append encodes the snapshot against the
    * STORED artifacts — still no retrain, still O(|snapshot|) encode
    * work, old untouched rows never re-read. Because encoding is a
    * pure per-row function of (vector, artifacts), the result EQUALS
    * the from-scratch index of the FINAL vector per id
    * (q_ann_upsert's oracle is that independent rebuild). Pure
    * deletions are the degenerate case: [[ivfPqIndexRetract]]. */
  def ivfPqIndexUpsert(index: DataFrame, snapshot: DataFrame,
      idCol: String, vecCol: String, centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      residual: Boolean = false): DataFrame = {
    require(index.columns.toSeq == Seq(idCol, "cluster", "codes"),
      s"index must be an ivfPqIndex frame ($idCol, cluster, codes); " +
        s"got ${index.columns.mkString(", ")}")
    ivfPqIndexAppend(
      index.join(snapshot.select(col(idCol)).distinct(),
        Seq(idCol), "left_anti"),
      snapshot, idCol, vecCol, centroids, codebooks, residual)
  }

  /** RETIRE ids from a stored [[ivfPqIndex]] — the ANN member of the
    * deletion story: the index is one self-contained row per vector
    * (codes are pure per-row functions of (vector, artifacts)), so a
    * takedown is ONE anti-join against the tombstone set and the
    * result equals the from-scratch index of the surviving corpus
    * exactly. Serving from the retracted index can never return a
    * removed id. Unknown ids are ignored (idempotent — the
    * [[graft.ops.Dedup.lshIndexRetract]] convention). What retraction
    * does NOT do is re-fit the artifacts: centroids/codebooks trained
    * on a corpus that since shrank may drift from the survivors —
    * [[embeddingShift]] stays the reuse-or-retrain gate. */
  def ivfPqIndexRetract(index: DataFrame, removedIds: DataFrame,
      idCol: String): DataFrame = {
    // presence-only (any build may retract); the anti-join preserves
    // the stamp for downstream appends/serves
    ArtifactStamp.check(index, "codes", "ivf_pq", "ivfPqIndexRetract")
    val rm = removedIds
      .select(col(removedIds.columns.head).as(idCol)).distinct()
    index.join(rm, Seq(idCol), "left_anti")
  }

  /** COMPACT a stored [[ivfPqIndex]] after N nightly folds: appends
    * and upserts fragment the artifact (each fold unions another
    * snapshot's files, so a year of nightlies is 365 small-file
    * unions whose cluster rows scatter across all of them), while the
    * serve path ([[ivfPqServeAdc]]) wants each probed cluster's codes
    * CO-LOCATED. This rewrite range-partitions by `cluster` and sorts
    * `(cluster, id)` within partitions — write the result back as THE
    * index (parquet, partitioned by cluster) and a probe touches only
    * its clusters' files with one row group each instead of every
    * fold's. Pure layout: the row SET is untouched, so
    * compact(fold(...)) == fold(...) exactly and serving from the
    * compacted index is byte-identical (SimilaritySpec proves both;
    * q_ann_compact serves the oracle-gated query from it). */
  def ivfPqIndexCompact(index: DataFrame, idCol: String): DataFrame = {
    require(index.columns.toSeq == Seq(idCol, "cluster", "codes"),
      s"index must be an ivfPqIndex frame ($idCol, cluster, codes); " +
        s"got ${index.columns.mkString(", ")}")
    ArtifactStamp.check(index, "codes", "ivf_pq", "ivfPqIndexCompact")
    index.repartitionByRange(col("cluster"), col(idCol))
      .sortWithinPartitions(col("cluster"), col(idCol))
  }

  /** ADC serving straight from a stored [[ivfPqIndex]] frame — the
    * probe/score/top-k stage of [[ivfPqTopKAdc]] without the encode
    * (the index already holds codes): queries probe `nprobe` coarse
    * lists, candidates score as cosine(PQ reconstruction, query), a
    * bounded heap keeps per-query top-k. The probe frame broadcasts,
    * so index partitions filter in place and codes never shuffle. */
  def ivfPqServeAdc(index: DataFrame, idCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, k: Int,
      centroids: Array[Array[Double]], nprobe: Int,
      codebooks: Array[Array[Array[Double]]],
      residual: Boolean = false): DataFrame = {
    // plan-time provenance: decoding with codebooks that differ from
    // the encode's returns confidently-wrong scores — raise instead
    ArtifactStamp.check(index, "codes", "ivf_pq", "ivfPqServeAdc",
      ivfPqStampParams(centroids, codebooks, residual): _*)
    val q = renamedQueries(index, queries, qidCol, qvecCol)
      .select(col(QId), col(QVec),
        explode(graft.functions.Centroids.centroid_probes(
          col(QVec), centroids, nprobe)).as("cluster"))
    val dec = graft.functions.Centroids.pq_decode(col("codes"), codebooks)
    val recon =
      if (residual)
        zip_with(dec, element_at(
            typedlit(centroids.map(_.toSeq).toSeq), col("cluster") + 1),
          (r, cc) => r + cc)
      else dec
    val cand = index.join(broadcast(q), "cluster")
      .select(col(QId).as("query_id"), col(idCol).as("neighbor_id"),
        cosine(recon, col(QVec).cast(ArrayType(DoubleType))).as("score"))
      .where(col("score").isNotNull)
    topKPerKey(cand, "query_id", "neighbor_id", "score", k)
  }

  /** Append `outCol` = coarse residual `vec/|vec| − centroids(cluster)`
    * (array<double>) to `df` — the PQ training/encode input for
    * residual IVF-PQ. The vector is normalized FIRST: the coarse
    * quantizer is spherical (unit-norm centroids) and the serve metric
    * is cosine (scale-invariant), so the unit vector is what the
    * centroid approximates — subtracting a unit centroid from an
    * arbitrary-magnitude vector would ADD energy instead of removing
    * it. Staged withColumns so every HOF lambda only references BOUND
    * columns (the q_skipgram projection lesson); IEEE ops in index
    * order, so the chain replays verbatim in the oracle's
    * `list_transform`; zero vectors pass through unnormalized (the
    * oracle's CASE-guard precedent — ANSI `/` would throw). */
  private def withResidual(df: DataFrame, vecCol: String,
      clusterCol: String, centroids: Array[Array[Double]],
      outCol: String): DataFrame =
    df.withColumn("__rv", col(vecCol).cast(ArrayType(DoubleType)))
      .withColumn("__rnrm",
        sqrt(aggregate(col("__rv"), lit(0.0), (acc, x) => acc + x * x)))
      .withColumn("__runit",
        when(col("__rnrm") > 0,
          transform(col("__rv"), x => x / col("__rnrm")))
          .otherwise(col("__rv")))
      .withColumn(outCol,
        zip_with(col("__runit"),
          element_at(typedlit(centroids.map(_.toSeq).toSeq),
            col(clusterCol) + 1),
          (x, cc) => x - cc))
      .drop("__rv", "__rnrm", "__runit")

  /** `(idCol, resid)` frame for residual-PQ codebook training: each
    * vector's coarse residual under `centroids` ([[ivfPqTopKAdc]]'s
    * `residual = true` contract — train [[pqCodebooks]] on THIS frame
    * so codes and codebooks quantize the same distribution). */
  def ivfResiduals(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame =
    withResidual(
      df.select(col(idCol),
        graft.functions.Centroids.centroid_assign(col(vecCol), centroids)
          .as("cluster"), col(vecCol)),
      vecCol, "cluster", centroids, "resid")
      .select(col(idCol), col("resid"))

  /** [[ivfPqTopKAdc]] + the standard exact re-rank ([[pqTopKReranked]]
    * precedent): ADC shortlists `shortlist` candidates from the probed
    * lists' codes alone, then ONLY the shortlist touches the stored fp
    * vectors — `|queries| * shortlist` point lookups total, never a
    * corpus scan. Measured on this corpus (m=8, ks=16 codes, coarse
    * k=16): see the q_ann_ivfpq registration for the nprobe × shortlist
    * recall curve that picks the serving point. */
  def ivfPqTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, k: Int,
      centroids: Array[Array[Double]], nprobe: Int,
      codebooks: Array[Array[Array[Double]]], shortlist: Int,
      residual: Boolean = false): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist must be >= k=$k")
    val sl = ivfPqTopKAdc(corpus, idCol, vecCol, queries, qidCol, qvecCol,
      shortlist, centroids, nprobe, codebooks, residual)
    val q = renamedQueries(corpus, queries, qidCol, qvecCol)
    val exact = broadcast(sl.select(col("query_id"), col("neighbor_id")))
      .join(corpus.select(col(idCol).cast(LongType).as("neighbor_id"),
        col(vecCol).as("__nvec")), "neighbor_id")
      .join(broadcast(q.select(col(QId).as("query_id"), col(QVec))),
        "query_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__nvec"), col(QVec)).as("score"))
      .where(col("score").isNotNull)
    topKPerKey(exact, "query_id", "neighbor_id", "score", k)
  }

  /** Approximate top-k: candidates are corpus rows sharing an LSH bucket
    * with the query in ANY table; exact cosine re-ranks candidates.
    * The join shuffles by `(table, bucket)` — bucket cardinality is
    * `numTables * 2^planesPerTable`, so no all-pairs blow-up; raise
    * `planesPerTable` to shrink buckets at larger corpus sizes. */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, dim: Int, numTables: Int = 4, planesPerTable: Int = 12,
      seed: Long = 42L): DataFrame = {
    val c = withLshBuckets(corpus.select(col(idCol), col(vecCol)), vecCol,
      dim, numTables, planesPerTable, seed)
    val q = withLshBuckets(renamedQueries(corpus, queries, qidCol, qvecCol),
      QVec, dim, numTables, planesPerTable, seed)
      .withColumnRenamed("lsh_table", "q_table")
      .withColumnRenamed("lsh_bucket", "q_bucket")
    val cand = c.join(q,
        c("lsh_table") === q("q_table") && c("lsh_bucket") === q("q_bucket"))
      .select(col(QId).as("query_id"), col(idCol).as("neighbor_id"),
        cosine(col(vecCol), col(QVec)).as("score"))
      .where(col("score").isNotNull)
      .dropDuplicates("query_id", "neighbor_id") // same pair from several tables
    topKPerKey(cand, "query_id", "neighbor_id", "score", k)
  }

  /** Farthest-point sampling (greedy k-center, Gonzalez 1985): pick `k`
    * vectors one at a time, each round taking the candidate LEAST
    * similar to every center chosen so far — max-coverage diversity
    * selection, the opposite pole from [[graft.ops.Dedup.semDedup]]
    * (which REMOVES the over-covered region; this SELECTS the spread).
    * The training-data use is seed-set / eval-set construction: k
    * probes that span the embedding space instead of following the
    * corpus density the way every hash sample does.
    *
    * Deterministic end to end: the seed is the min-id vector, round r
    * takes argmin over candidates of max-cosine-to-centers with ties
    * to the smaller id, and the cosines run through the same codegen'd
    * kernel as the ANN family (sequential double folds), so the DuckDB
    * oracle replays every selection bit-for-bit as a CTE chain.
    *
    * Output: `(sel, idCol, ms)` — selection order 1..k, the chosen id,
    * and the max similarity to the prior centers at selection time
    * (null for the seed): `ms` is the k-center coverage radius curve,
    * the "how much diversity is left" diagnostic.
    *
    * Scale shape: k rounds, each ONE narrow corpus scan (id, vec
    * columns only) with `k-1` kernel cosines per row feeding a
    * map-side bounded top-1 (TakeOrderedAndProject) — O(n*k*dim) work,
    * k rows ever reach the driver, nothing shuffles. The corpus is
    * deliberately re-scanned per round, same trade as
    * [[trainCentroids]]' full-corpus branch: at 100 TB, caching the
    * vector column to save k columnar scans evicts everything else.
    * Stops early (fewer than k rows) if the corpus runs out. */
  def farthestPointSample(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(idCol).cast(LongType).as("id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("v"))
    val seed = v.orderBy(col("id")).limit(1).collect()
    require(seed.nonEmpty, "farthestPointSample on an empty frame")
    var centers = Vector((seed(0).getLong(0),
      seed(0).getSeq[Double](1).toArray))
    var out = Vector((1, seed(0).getLong(0), Option.empty[Double]))
    var exhausted = false
    for (r <- 2 to k if !exhausted) {
      val sims = centers.map { case (_, c) =>
        cosine(col("v"), typedLit(c.toSeq)) }
      val ms = if (sims.size == 1) sims.head else greatest(sims: _*)
      val picked = v.where(!col("id").isin(centers.map(_._1): _*))
        .select(col("id"), col("v"), ms.as("ms"))
        .orderBy(col("ms").asc, col("id").asc)
        .limit(1).collect()
      if (picked.isEmpty) exhausted = true
      else {
        val row = picked(0)
        centers :+= ((row.getLong(0), row.getSeq[Double](1).toArray))
        out :+= ((r, row.getLong(0), Some(row.getDouble(2))))
      }
    }
    out.toDF("sel", idCol, "ms")
  }

  /** DETERMINISTIC PCA of the embedding corpus — the top principal
    * components by fixed-round power iteration with deflation, on an
    * EXACT fixed-point covariance matrix: the embedding-analytics
    * artifact (dominant directions, eigenvalue spectrum share) that
    * tells you whether a corpus' embedding space has collapsed before
    * anyone trusts a cosine threshold on it.
    *
    * Determinism recipe (the fsEmWeights pattern at matrix scale):
    * each coordinate quantizes to `floor(x * 2^scaleBits)` (float →
    * double widening and the power-of-two multiply are both EXACT IEEE
    * ops), so every covariance input is an integer; the (dim x dim)
    * product-sum matrix is exact Long arithmetic — order-free on any
    * partitioning — and a LOUD guard keeps every sum under 2^53
    * (`n * maxQ^2 <= 2^53` with maxQ the OBSERVED max |quantized
    * coordinate|, so unnormalized embeddings can't void the bound;
    * raise the sums to DECIMAL past that, documented, not silent).
    * Only dim + dim^2 + 1 slim rows
    * reach the driver (the <= 2^12-cell collect contract). The power
    * rounds are fixed-order driver arithmetic: matvec rows fold over k
    * ascending, norms fold over j ascending, all 0.0-seeded — the
    * exact operand sequences the oracle replays via list_reduce over
    * list(... ORDER BY ...); sqrt is correctly-rounded IEEE (allowed;
    * the log/pow ban does not cover it). Eigenvalue estimate is the
    * final round's pre-normalization norm ||C v||; deflation is
    * `c - (lambda * v_j) * v_k` in that operand order.
    *
    * Output: one row per (component, coord 1-based): loading, the
    * component's eigenvalue estimate, and its share of total variance
    * (trace). Returns `components * dim` rows.
    *
    * Scale shape: ONE narrow pass over the corpus quantizes; the
    * pair-sum explode shuffles (j, k, partial sum) rows with map-side
    * partials — dim^2 cells regardless of corpus size; rounds are
    * driver-local. At 100 TB nothing changes but the (guarded) Long →
    * DECIMAL sum width. */
  def pcaTopComponents(df: DataFrame, vecCol: String, dim: Int,
      components: Int = 2, rounds: Int = 8, scaleBits: Int = 14)
      : DataFrame = {
    val (_, comps, trace) =
      pcaFit(df, vecCol, dim, components, rounds, scaleBits)
    val out = for {
      (c, (v, lambda)) <- (1 to components).zip(comps)
      j <- 0 until dim
    } yield (c, j + 1, v(j), lambda, lambda / trace)
    df.sparkSession.createDataFrame(out)
      .toDF("component", "coord", "loading", "lambda", "share")
  }

  /** Driver-side PCA fit — the training half of [[pcaTopComponents]]
    * exposed for serving ([[pcaProject]]): returns (per-coordinate
    * means, (loading vector, eigenvalue) per component, total
    * variance). Same arithmetic, same guards, same determinism
    * contract. */
  def pcaFit(df: DataFrame, vecCol: String, dim: Int,
      components: Int = 2, rounds: Int = 8, scaleBits: Int = 14)
      : (Array[Double], Seq[(Array[Double], Double)], Double) = {
    require(dim >= 2 && dim <= 512,
      s"pcaTopComponents: dim must be in [2, 512], got $dim")
    require(components >= 1 && components <= 8,
      s"pcaTopComponents: components must be in [1, 8], got $components")
    require(rounds >= 1 && rounds <= 64,
      s"pcaTopComponents: rounds must be in [1, 64], got $rounds")
    require(scaleBits >= 4 && scaleBits <= 20,
      s"pcaTopComponents: scaleBits must be in [4, 20], got $scaleBits")
    val scaleD = (1L << scaleBits).toDouble
    val q = df
      .where(assert_true(size(col(vecCol)) === lit(dim),
        concat(lit(s"pcaTopComponents: vector of length "),
          size(col(vecCol)).cast(StringType),
          lit(s" != declared dim $dim"))).isNull)
      .select(transform(col(vecCol), x =>
        floor(x.cast(DoubleType) * lit(scaleD)).cast(LongType)).as("q"))
      .localCheckpoint()
    val n = q.count()
    require(n >= 2, s"pcaTopComponents: need >= 2 vectors, got $n")
    // Exactness bound derived from the OBSERVED max |quantized
    // coordinate| (not from an assumed |x| <= 1, which unnormalized
    // embeddings void): every product term is <= maxQ^2, so the
    // (dim x dim) product sums stay exact Longs iff n * maxQ^2 <= 2^53
    // (the per-dimension sums n * maxQ <= 2^53 follow a fortiori).
    // BigInt sidesteps overflow in the check itself.
    val maxQ = math.max(1L,
      q.select(max(array_max(transform(col("q"), x => abs(x)))))
        .head().getLong(0))
    require(BigInt(n) * BigInt(maxQ) * BigInt(maxQ) <= (BigInt(1) << 53),
      s"pcaTopComponents: $n rows with max |quantized coordinate| " +
        s"$maxQ would push product sums past the 2^53 exactness bound " +
        s"at scaleBits=$scaleBits — lower scaleBits, normalize the " +
        "vectors, or raise the sums to DECIMAL")
    val sj = Array.ofDim[Long](dim)
    q.select(posexplode(col("q")).as(Seq("j", "x")))
      .groupBy(col("j")).agg(sum(col("x")).as("s"))
      .collect().foreach(r => sj(r.getInt(0)) = r.getLong(1))
    val sjk = Array.ofDim[Long](dim, dim)
    q.select(posexplode(col("q")).as(Seq("j", "x")), col("q"))
      .select(col("j"), col("x"), posexplode(col("q")).as(Seq("k", "y")))
      .groupBy(col("j"), col("k")).agg(sum(col("x") * col("y")).as("s"))
      .collect().foreach(r => sjk(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    // exact casts (all magnitudes < 2^53), then the one fixed formula
    val nD = n.toDouble
    val sq = scaleD * scaleD
    var cov = Array.tabulate(dim, dim) { (j, k) =>
      (sjk(j)(k).toDouble / nD -
        (sj(j).toDouble / nD) * (sj(k).toDouble / nD)) / sq
    }
    val trace = (0 until dim).foldLeft(0.0)((a, j) => a + cov(j)(j))
    require(trace > 0.0,
      "pcaTopComponents: zero total variance (constant vectors) — " +
        "nothing to decompose")
    val init = 1.0 / math.sqrt(dim.toDouble)
    val means = Array.tabulate(dim)(j => (sj(j).toDouble / nD) / scaleD)
    val comps = Seq.newBuilder[(Array[Double], Double)]
    for (c <- 1 to components) {
      var v = Array.fill(dim)(init)
      var lambda = 0.0
      for (_ <- 1 to rounds) {
        val u = Array.tabulate(dim) { j =>
          (0 until dim).foldLeft(0.0)((a, k) => a + cov(j)(k) * v(k)) }
        val nrm = math.sqrt(
          (0 until dim).foldLeft(0.0)((a, j) => a + u(j) * u(j)))
        require(nrm > 0.0,
          s"pcaTopComponents: power iteration degenerated on component " +
            s"$c (Cv = 0) — the start vector sits in the null space")
        lambda = nrm
        v = u.map(_ / nrm)
      }
      comps += ((v, lambda))
      val vv = v
      val lam = lambda
      cov = Array.tabulate(dim, dim) { (j, k) =>
        cov(j)(k) - (lam * vv(j)) * vv(k) }
    }
    (means, comps.result(), trace)
  }

  /** Serving half of the PCA pair: project every vector onto trained
    * components — score_c = fold over coordinates ASC of
    * `(x_j - mean_j) * v_c[j]`, 0.0-seeded, one codegen'd
    * zip_with/aggregate chain per component, per row, NO shuffle
    * (document embeddings never leave their partition; the projection
    * is the dimensionality-reduced view downstream dedup/ANN can run
    * on). Means/loadings are [[pcaFit]]'s driver artifacts. */
  def pcaProject(df: DataFrame, idCol: String, vecCol: String,
      means: Seq[Double], comps: Seq[Seq[Double]]): DataFrame = {
    require(comps.nonEmpty, "pcaProject: need at least one component")
    require(comps.forall(_.size == means.size),
      "pcaProject: component length != means length")
    val dim = means.size
    val mlit = array(means.map(lit): _*)
    val pcs = comps.zipWithIndex.map { case (v, i) =>
      val vlit = array(v.map(lit): _*)
      aggregate(
        zip_with(
          zip_with(col(vecCol), mlit, (x, m) => x.cast(DoubleType) - m),
          vlit, (d, w) => d * w),
        lit(0.0), (acc, e) => acc + e).as(s"pc${i + 1}")
    }
    df.where(assert_true(size(col(vecCol)) === lit(dim),
        concat(lit("pcaProject: vector of length "),
          size(col(vecCol)).cast(StringType),
          lit(s" != trained dim $dim"))).isNull)
      .select(col(idCol) +: pcs: _*)
  }
}

/** Bounded-heap top-k aggregate: keeps the `k` largest (score, id) pairs,
  * ordered by (score DESC, id ASC) for determinism. Partial aggregation
  * runs map-side (each partition reduces to <= k pairs before the
  * shuffle), which is what makes brute-force scoring viable at scale —
  * the alternative (Window rank over all scored pairs) shuffles the full
  * score matrix. SURVEY §7.3 planned exactly this shape.
  */
case class TopKByScore(id: Expression, score: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"k must be positive, got $k")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (id.dataType == LongType && score.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (long id, double score) inputs, got " +
        s"(${id.dataType.simpleString}, ${score.dataType.simpleString}); cast the columns")

  override def children: Seq[Expression] = Seq(id, score)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("score", DoubleType))))

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val i = id.eval(input)
    val s = score.eval(input)
    if (i != null && s != null)
      buf.offer(i.asInstanceOf[Long], s.asInstanceOf[Double])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.foreach((i, s) => buf.offer(i, s))
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sortedDesc.map { case (i, s) =>
      InternalRow(i, s)
    })

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer =
    TopKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(id = newChildren(0), score = newChildren(1))
  override def prettyName: String = "graft_top_k_by_score"
}

/** Min-heap of (score, id) bounded at k elements; the root is the WORST
  * kept pair so `offer` is O(log k) and memory is O(k) regardless of
  * input size. Order for "worse": smaller score, then LARGER id (so the
  * kept set is the top-k by (score DESC, id ASC)). */
final class TopKBuffer(k: Int) {
  // parallel arrays as a binary min-heap
  private val scores = new Array[Double](k)
  private val ids    = new Array[Long](k)
  private var size   = 0

  private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def offer(id: Long, score: Double): Unit = {
    // A NaN compares false against everything, so a NaN root would block
    // every future eviction and freeze the heap on the first k rows seen.
    // A NaN similarity is "undefined", not "best" — drop it, mirroring
    // the score.isNotNull guards on the scoring paths.
    if (score.isNaN) return
    if (size < k) {
      var i = size
      scores(i) = score; ids(i) = id; size += 1
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown(0)
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    var continue = true
    while (continue) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) continue = false else { swap(i, m); i = m }
    }
  }

  def foreach(f: (Long, Double) => Unit): Unit = {
    var i = 0
    while (i < size) { f(ids(i), scores(i)); i += 1 }
  }

  /** (id, score) pairs by (score DESC, id ASC). */
  def sortedDesc: Array[(Long, Double)] = {
    val out = new Array[(Long, Double)](size)
    var i = 0
    while (i < size) { out(i) = (ids(i), scores(i)); i += 1 }
    out.sortBy { case (id, s) => (-s, id) }
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + size * 16)
    bb.putInt(size)
    var i = 0
    while (i < size) { bb.putLong(ids(i)); bb.putDouble(scores(i)); i += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { val id = bb.getLong; val s = bb.getDouble; buf.offer(id, s); i += 1 }
    buf
  }
}
