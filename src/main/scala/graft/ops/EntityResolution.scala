package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (entity resolution): find records whose NAMES
  * are within a small edit distance, without an all-pairs scan — the
  * classic blocking-key design (Fellegi–Sunter era): records are
  * grouped by a cheap deterministic key (a field, a phonetic code, a
  * name token), and the quadratic comparison runs only WITHIN blocks.
  *
  * The training-data version of this is canonicalizing near-identical
  * titles/authors/product names before dedup: exact dedup misses
  * "red widgets" vs "red widget", MinHash shingles are too coarse for
  * 6-character strings — bounded edit distance on a blocked pair scan
  * is the right tool at this granularity.
  */
object EntityResolution {

  /** `(id_a, id_b, dist)` for every same-block pair at Levenshtein
    * distance <= `maxDist` (id_a < id_b). The distance runs through
    * Spark's codegen'd 3-arg `levenshtein` with the threshold pushed
    * IN (it abandons a row as soon as the running distance exceeds
    * `maxDist` — O(maxDist * len) instead of O(len^2) per pair).
    *
    * Scale shape: ONE exchange on the block key; work is
    * sum-over-blocks of block^2, never corpus^2 — the caller picks a
    * block key whose occupancy is bounded (a name token against a
    * closed vocabulary here; length-band or phonetic keys in general).
    * A skewed block key is the same hazard as any hot join key —
    * compose with the [[Dedup]] bucket-cap pattern or [[SkewJoin]]
    * salting if the key can't guarantee a bound. Pairs compose with
    * [[Dedup.nearDupClusters]] for transitive merge groups. */
  def fuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, maxDist: Int): DataFrame = {
    val base = df.select(blockKey.as("block"), col(idCol).as("id"),
      col(nameCol).as("name"))
    val l = base.select(col("block"), col("id").as("id_a"),
      col("name").as("name_a"))
    val r = base.select(col("block"), col("id").as("id_b"),
      col("name").as("name_b"))
    l.join(r, Seq("block"))
      .where(col("id_a") < col("id_b"))
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist))
      .where(col("dist") >= 0) // 3-arg levenshtein yields -1 above maxDist
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Per-record merge-candidate summary over [[fuzzyPairs]]:
    * `(id, canon, n_cands)` where `canon` is the smallest id among the
    * record's LOWER-id fuzzy matches (the record itself when none) and
    * `n_cands` counts those matches — the deterministic one-hop keeper
    * assignment, same min-id convention as [[Dedup.exactDedup]]. One
    * slim aggregate over the pair frame plus a key-join back to the
    * corpus (the match frame carries ids only — names never reshuffle).
    * For full transitive canonicalization feed the pairs through
    * [[Dedup.nearDupClusters]] instead; one-hop is the audit artifact
    * (per-record: does anything look mergeable, and with what). */
  def fuzzyCanonical(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, maxDist: Int): DataFrame = {
    val lower = fuzzyPairs(df, idCol, nameCol, blockKey, maxDist)
      .groupBy(col("id_b").as(idCol))
      .agg(min(col("id_a")).as("lo"), count(lit(1)).as("n"))
    df.select(col(idCol)).join(lower, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("lo"), col(idCol)).as("canon"),
        coalesce(col("n"), lit(0L)).as("n_cands"))
  }
}
