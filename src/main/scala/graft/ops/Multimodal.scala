package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing: media travel as
  * opaque `binary` columns next to typed metadata, exactly how a 100 TB
  * training-data pipeline carries them (bytes stay columnar in parquet,
  * metadata is pushdown-/prune-friendly).
  *
  * The decode step is STUBBED (this container has no image/audio libs):
  * [[FakeCodec]] derives deterministic "decoded" properties from the
  * bytes alone, clearly marked. Everything AROUND the stub — schema,
  * typed surface, per-partition batch shape, expression-level metadata —
  * is real and is the part that matters for the engine.
  *
  * Two execution paths, mirroring the engine's general design rule:
  *  - expression path ([[withMediaMeta]], [[frameOffsets]]): pure
  *    Catalyst, codegen'd, for anything derivable without a codec;
  *  - batch-decode path ([[decodeMeta]]): `mapPartitions` over a typed
  *    Dataset — the Scala analogue of `mapInPandas` (iterator-of-batches
  *    per partition, codec instantiated ONCE per partition, not per row —
  *    the shape a real JNI/FFmpeg codec binding needs).
  */
object Multimodal {

  /** Typed metadata record produced by the (stubbed) decoder. */
  final case class MediaMeta(
      media_id: Long,
      media_type: String,
      byte_len: Long,
      sha256: String,
      width: Int,
      height: Int,
      n_frames: Int)

  /** STUB CODEC — deterministic fake. A real build replaces `decode`
    * with an image/audio library call; the signature (bytes in, typed
    * meta out) and the per-partition instantiation pattern are the
    * contract. */
  final class FakeCodec extends Serializable {
    def decode(id: Long, mediaType: String, bytes: Array[Byte]): MediaMeta = {
      val len = if (bytes == null) 0L else bytes.length.toLong
      val sha = if (bytes == null) "" else
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(bytes).map("%02x".format(_)).mkString
      MediaMeta(id, mediaType, len, sha,
        width = (640 + len % 1280).toInt,
        height = (360 + len % 720).toInt,
        n_frames = (1 + len % 30).toInt)
    }
  }

  /** Expression-path metadata: everything derivable from the bytes with
    * built-in codegen'd functions. The width/height/n_frames formulas are
    * the SAME deterministic fake as [[FakeCodec]] so both paths agree
    * (and the fake is oracle-checkable in plain SQL). A null payload is
    * normalized to the codec's explicit null handling (len 0, empty sha)
    * — `length(null)` would otherwise propagate null meta and the two
    * paths would diverge exactly where the scaladoc promises parity. */
  def withMediaMeta(df: DataFrame, idCol: String, typeCol: Column,
      binCol: Column): DataFrame = {
    val len = coalesce(length(binCol).cast(LongType), lit(0L))
    df.select(
      col(idCol).as("media_id"),
      typeCol.as("media_type"),
      len.as("byte_len"),
      coalesce(sha2(binCol, 256), lit("")).as("sha256"),
      (lit(640) + pmod(len, lit(1280L))).cast(IntegerType).as("width"),
      (lit(360) + pmod(len, lit(720L))).cast(IntegerType).as("height"),
      (lit(1) + pmod(len, lit(30L))).cast(IntegerType).as("n_frames"))
  }

  /** Batch-decode path: per-partition iterator, one codec per partition.
    * Input frame must carry (idCol: long, typeCol: string, binCol:
    * binary). Opaque to Catalyst by design — use only when a real codec
    * is genuinely needed; prefer [[withMediaMeta]] otherwise. */
  def decodeMeta(df: DataFrame, idCol: String, typeCol: String,
      binCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(typeCol), col(binCol))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val codec = new FakeCodec // once per partition, not per row
        it.map { case (id, tpe, bytes) => codec.decode(id, tpe, bytes) }
      }
  }

  /** Content feature vector for an opaque media payload: L2-normalized
    * byte-value histogram (codegen'd single pass). This is the honest
    * deterministic stand-in where a real pipeline plugs a learned
    * encoder (CLIP/wav2vec); everything DOWNSTREAM — the array<double>
    * column, Similarity.bruteForceTopK/lshTopK/ivfTopK, Dedup
    * embedding near-dup — is the identical production plumbing. */
  def featureVector(binCol: Column, bins: Int = 64): Column =
    graft.functions.VectorHashes.byte_histogram(binCol, bins)

  /** PERCEPTUAL 64-BIT SIGNATURE of a media feature vector: the
    * random-hyperplane sign pattern (Charikar 2002 — SimHash for
    * vectors) of the feature under 64 seeded planes, via the proven
    * [[graft.functions.VectorHashes.plane_signs]] kernel (one codegen'd
    * pass; planes are driver literals, executors do zero RNG). Two
    * payloads whose features sit at cosine ~1 — the re-encoded
    * duplicate image — differ in O(angle) bits; unrelated payloads
    * land ~32 bits apart. Production swaps the byte-histogram feature
    * for a learned encoder (CLIP/wav2vec) and the signature carries
    * over unchanged — the sign pattern only sees the vector. */
  def perceptualHash(featCol: Column, dim: Int = 64,
      seed: Long = 42L): Column =
    graft.functions.VectorHashes.plane_signs(featCol,
      graft.ops.Similarity.hyperplanes(dim, 1, 64, seed)(0))

  /** MULTIMODAL NEAR-DUP PAIRS — "find the re-encoded duplicate
    * image" with zero codec dependency: payload → stored feature
    * vector ([[featureVector]]) → corpus-mean CENTERING →
    * [[perceptualHash]] → the proven Charikar chunk-bucket hamming
    * machinery ([[Dedup.hammingNearDupPairs]]: pigeonhole-complete
    * candidate generation, never all-pairs).
    *
    * Centering is load-bearing, not cosmetic: raw content histograms
    * share one dominant direction (for text bytes, the language's
    * letter distribution; for images, global brightness), so RAW
    * vectors all sit at cosine ≈ 1 and every random pair hashes a few
    * bits apart — the signature degenerates (measured on this corpus:
    * ~0.99 raw pairwise cosine). Subtracting the corpus mean hashes
    * the DEVIATIONS: unrelated payloads land ~32/64 bits apart,
    * re-encodes stay at ~0 — the standard fix (it is rank-1
    * whitening). Done in exact fixed point for determinism: features
    * quantize to floor(x·2^20) longs, the per-bin mean is one exact
    * integer `sum div n`, and the centered values are exact integer
    * differences — order-free on any partitioning, replayed verbatim
    * by the oracle.
    *
    * Scale shape: one narrow pass quantizes; the mean is a bins-sized
    * aggregate riding a 1-row broadcast back; signatures + the chunk
    * join are [[Dedup.hammingNearDupPairs]]'s bounded machinery.
    * Returns (id_a, id_b, hamming), hamming <= maxDistance. */
  def mediaNearDupPairs(df: DataFrame, idCol: String, binCol: Column,
      maxDistance: Int = 3, bins: Int = 64, seed: Long = 42L): DataFrame = {
    val feats = df.select(col(idCol).as("id"),
      transform(featureVector(binCol, bins),
        x => floor(x * lit((1L << 20).toDouble)).cast(LongType)).as("qf"))
    val meanRow = feats
      .select(posexplode(col("qf")).as(Seq("i", "x")))
      .groupBy(col("i")).agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .select(struct(col("i"), expr("s div n").as("m")).as("im"))
      .agg(array_sort(collect_list(col("im"))).as("ms"))
      .select(transform(col("ms"), s => s.getField("m")).as("__mean_fp"))
    val fp = feats.crossJoin(broadcast(meanRow))
      .select(col("id"),
        perceptualHash(zip_with(col("qf"), col("__mean_fp"),
          (x, m) => (x - m).cast(DoubleType)), bins, seed).as("fp"))
    Dedup.hammingNearDupPairs(fp, maxDistance)
  }

  /** Frame-sample plan: byte offsets of `n` evenly spaced samples — the
    * "which frames would we decode" step, pure expressions. */
  def frameOffsets(binCol: Column, n: Int): Column = {
    // n = 0 would build sequence(0, -1) = [0, -1] (Spark infers step -1)
    // and divide by zero under ANSI; fail loudly like packSequences does
    require(n > 0, s"frame sample count must be positive, got $n")
    val len = length(binCol).cast(LongType)
    when(len > 0,
      transform(sequence(lit(0), lit(n - 1)),
        i => floor(i.cast(LongType) * len / n).cast(LongType)))
      .otherwise(array().cast(ArrayType(LongType)))
  }

  /** Deterministic fake media corpus from the documents table (text bytes
    * stand in for media payloads) — the plumbing-test input. */
  def fakeMediaFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("media_type"),
      col("text").cast(BinaryType).as("payload"))
  }
}
