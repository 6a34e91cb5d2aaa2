package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact set-similarity self-join via prefix filtering (Bayardo,
  * Ma & Srikant, "Scaling Up All Pairs Similarity Search", WWW 2007;
  * Chaudhuri et al.'s SSJoin prefix filter, ICDE 2006): every document
  * pair whose DISTINCT-token Jaccard similarity reaches `threshold`,
  * WITHOUT an all-pairs comparison — the exact complement to the
  * repo's probabilistic near-dup stack (MinHash-LSH trades recall for
  * speed; this trades nothing: output == brute-force all-pairs, with
  * the quadratic work pruned by a completeness-preserving filter).
  *
  * The filter: order every token set by a GLOBAL rarest-first canonical
  * order and take each set's first `n - ceil(t*n) + 1` tokens as its
  * prefix. J(A,B) >= t implies |A∩B| >= t·|A| (and symmetrically
  * t·|B|), and two sets whose overlap is that large MUST share at
  * least one token inside both prefixes — so joining on prefix tokens
  * generates a candidate superset, and the exact Jaccard verify makes
  * the final output exactly the brute-force answer.
  *
  * Scale shape (the reason this beats all-pairs at 100 TB):
  *  - the canonical order is the (df, token) PAIR compared
  *    lexicographically — no global rank assignment, no
  *    single-partition window: each document array-sorts its own
  *    (df, token) structs after one slim join against the df frame;
  *  - prefixes are rarest-first, so the candidate join's buckets are
  *    keyed by RARE tokens — high-df stopwords sort last and fall out
  *    of prefixes, exactly the keys that would have exploded a naive
  *    token-join; bucket sizes track token rarity, not corpus size;
  *  - a size filter rides the candidate join (J >= t forces
  *    t·max(n_a,n_b) <= min(n_a,n_b)), pruning cross-length pairs
  *    before the verify join ships any token array;
  *  - only (id, token)-slim frames shuffle until the verify join; the
  *    verify joins are keyed on doc id.
  *
  * Numeric care: the overlap bound ceil(t*n) is computed as
  * `ceil(t*n - 1e-9)` — if the IEEE product t*n lands a hair ABOVE the
  * exact rational (e.g. 0.7*10), a plain ceil would overshoot the
  * bound and shorten the prefix below the completeness guarantee; the
  * epsilon can only LENGTHEN the prefix (more candidates, never fewer),
  * so completeness survives any rounding direction and the exact
  * verify keeps soundness regardless.
  *
  * Output: (`id_a`, `id_b`, `n_a`, `n_b`, `overlap`, `jaccard`) with
  * id_a < id_b; `jaccard` is ONE IEEE division of exact ints —
  * bit-exact across engines, which is why the DuckDB oracle can be the
  * brute-force all-pairs definition itself (the strongest possible
  * check: it replays the SEMANTICS, not this algorithm). */
object SetSimJoin {

  /** All pairs of `df` rows whose distinct-element Jaccard >= `threshold`
    * over word `shingle`-grams ([[graft.functions.TextHashes
    * .word_ngrams]]; `shingle = 1` is the plain lowercased-word set).
    * Empty-set docs can match nothing and are dropped.
    *
    * Pick the shingle width so the SETS discriminate: on a corpus with
    * a small closed vocabulary, unigram sets all overlap (every doc
    * holds most of the vocabulary, every pairwise Jaccard is high, and
    * prefix filtering cannot prune because every "rare" token is still
    * frequent) — measured as a 20x blowup at sf0.1. Word 3-grams give
    * a combinatorial element space where near-dups share elements and
    * unrelated docs share none, which is the same reason the MinHash
    * cascade shingles before hashing. */
  def jaccardJoinPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingle: Int = 1): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    require(shingle >= 1, s"shingle width must be >= 1, got $shingle")
    val toks = df.select(col(idCol).as("id"),
        array_distinct(graft.functions.TextHashes.word_ngrams(
          col(textCol), shingle)).as("toks"))
      .where(size(col("toks")) > 0)
    val exploded = toks.select(col("id"), explode(col("toks")).as("tok"))
    val dfreq = exploded.groupBy("tok").agg(count(lit(1)).as("df"))
    // rarest-first canonical order: ascending (df, token); each doc
    // sorts its OWN struct array — no global rank, no 1-partition window
    val sorted = exploded.join(dfreq, "tok")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("tok"))))
        .as("by_rarity"))
      .select(col("id"),
        transform(col("by_rarity"), s => s.getField("tok")).as("toks"),
        size(col("by_rarity")).as("n"))
    // prefix = first n - ceil(t*n) + 1 rarest tokens (epsilon keeps the
    // IEEE ceil from overshooting the exact bound — see scaladoc)
    val prefixLen = greatest(lit(1),
      col("n") - ceil(col("n") * lit(threshold) - lit(1e-9))
        .cast(IntegerType) + lit(1))
    val pref = sorted
      .select(col("id"), col("n"),
        explode(slice(col("toks"), lit(1), prefixLen)).as("tok"))
    val cand = pref.as("a").join(pref.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          // size filter: J >= t forces the shorter set to hold at least
          // t x the longer one
          col("a.n") * lit(threshold) <= col("b.n") + lit(1e-9) &&
          col("b.n") * lit(threshold) <= col("a.n") + lit(1e-9))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val sets = sorted.select(col("id"), col("toks"), col("n"))
    cand
      .join(sets.select(col("id").as("id_a"), col("toks").as("toks_a"),
        col("n").as("n_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("toks").as("toks_b"),
        col("n").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"),
        size(array_intersect(col("toks_a"), col("toks_b"))).as("overlap"))
      .withColumn("jaccard", col("overlap").cast(DoubleType) /
        (col("n_a") + col("n_b") - col("overlap")).cast(DoubleType))
      .where(col("jaccard") >= threshold)
  }
}
