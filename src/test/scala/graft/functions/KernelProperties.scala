package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Property-based checks of the pure JVM kernels (no Spark session):
  * invariants (bounds, symmetry, determinism) plus independent MODELS —
  * the text-stats kernel against the Java-regex phrasing it replaced,
  * and the rolling hash against a BigInt mod-2^64 model (the same model
  * the DuckDB HUGEINT oracle implements). */
object KernelProperties extends Properties("graft.kernels") {

  private val charPool: Gen[String] = Gen.frequency(
    8 -> Gen.alphaNumChar.map(_.toString),
    3 -> Gen.oneOf(" ", "\t", "\n", ".", ",", "!", "?", ";", ":"),
    2 -> Gen.oneOf("é", "ß", "中", "文", "Ж", "ا"),
    1 -> Gen.oneOf("🙂", "🍕")) // proper surrogate pairs
  private val texts: Gen[String] =
    Gen.chooseNum(0, 200).flatMap(n => Gen.listOfN(n, charPool).map(_.mkString))

  private def u(s: String) = UTF8String.fromString(s)

  property("ngramJaccard: self=1, symmetric, bounded") =
    forAll(texts, texts) { (a, b) =>
      val self = VectorHashes.ngramJaccard(u(a), u(a), 5)
      val j1 = VectorHashes.ngramJaccard(u(a), u(b), 5)
      val j2 = VectorHashes.ngramJaccard(u(b), u(a), 5)
      self == 1.0 && j1 == j2 && j1 >= 0.0 && j1 <= 1.0
    }

  property("ngramCount bounds ngramJaccard: J <= min/max (the cascade's " +
      "lossless prefilter invariant)") =
    forAll(texts, texts) { (a, b) =>
      val na = VectorHashes.ngramCount(u(a), 5)
      val nb = VectorHashes.ngramCount(u(b), 5)
      val j = VectorHashes.ngramJaccard(u(a), u(b), 5)
      // counts come from the same distinct-hash sets as the jaccard, so
      // |A ∩ B| <= min and |A ∪ B| >= max give J <= min/max exactly;
      // this is what lets min >= t*max prune without losing a true pair
      val minN = math.min(na, nb).toDouble
      val maxN = math.max(na, nb).toDouble
      na >= 1 && nb >= 1 && j <= minN / maxN + 1e-15
    }

  property("hash_jaccard over ngramHashes IS ngramJaccard (the confirm " +
      "stage's text-free rewrite is bit-exact)") =
    forAll(texts, texts, Gen.chooseNum(1, 8)) { (a, b, k) =>
      val viaArrays = VectorHashes.sortedHashJaccard(
        VectorHashes.ngramHashes(u(a), k), VectorHashes.ngramHashes(u(b), k))
      // == not approx: same intersection counts, same final division
      viaArrays == VectorHashes.ngramJaccard(u(a), u(b), k)
    }

  property("ngramHashes: sorted, distinct, length == ngramCount") =
    forAll(texts, Gen.chooseNum(1, 8)) { (s, k) =>
      val h = VectorHashes.ngramHashes(u(s), k)
      val arr = (0 until h.numElements()).map(h.getLong)
      arr == arr.sorted && arr.distinct == arr &&
        arr.length == VectorHashes.ngramCount(u(s), k)
    }

  property("minhash: deterministic, fixed length, self-agreement 1") =
    forAll(texts) { s =>
      val s1 = VectorHashes.minhashSig(u(s), 5, 64, 42L)
      val s2 = VectorHashes.minhashSig(u(s), 5, 64, 42L)
      s1.numElements() == 64 &&
        VectorHashes.sigAgreement(s1, s2) == 1.0
    }

  property("minhash agreement: symmetric and bounded") =
    forAll(texts, texts) { (a, b) =>
      val sa = VectorHashes.minhashSig(u(a), 5, 64, 42L)
      val sb = VectorHashes.minhashSig(u(b), 5, 64, 42L)
      val g1 = VectorHashes.sigAgreement(sa, sb)
      g1 == VectorHashes.sigAgreement(sb, sa) && g1 >= 0.0 && g1 <= 1.0
    }

  property("simhash: self-hamming 0; token order irrelevant") =
    forAll(Gen.listOf(Gen.alphaNumStr)) { toks =>
      def arr(ts: Seq[String]) =
        new GenericArrayData(ts.map(t => u(t): Any).toArray)
      val h1 = TextHashes.simhashOf(arr(toks))
      val h2 = TextHashes.simhashOf(arr(scala.util.Random.shuffle(toks)))
      h1 == h2 // bit votes are a sum over tokens: order-free
    }

  property("rollingHash matches the BigInt mod-2^64 model") =
    forAll(texts) { s =>
      val norm = s // model works on raw bytes, any string
      val bytes = norm.getBytes("UTF-8")
      val mod = BigInt(2).pow(64)
      val model = bytes.foldLeft(BigInt(0))((h, b) =>
        (h * 1000003 + (b & 0xff)) mod mod)
      val signed =
        if (model >= BigInt(2).pow(63)) (model - mod).toLong else model.toLong
      TextHashes.rollingHashOf(u(norm)) == signed
    }

  property("wordNgrams matches the lower+regex-split+sliding model") =
    forAll(texts, Gen.chooseNum(1, 4)) { (s, n) =>
      val arr = TextHashes.wordNgramsOf(u(s), n)
      val got = (0 until arr.numElements())
        .map(i => arr.getUTF8String(i).toString)
      // the model lowers via the SAME UTF8String method Spark's lower()
      // calls, then java-regex splits exactly like Spark's split()
      val toks = u(s).toLowerCase.toString
        .split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq
      val want = if (toks.length < n) Seq.empty
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      got == want
    }

  property("planeSigns bit j == sign of dot(vec, plane_j)") = {
    val vecGen = Gen.chooseNum(1, 32).flatMap(d =>
      Gen.listOfN(d, Gen.chooseNum(-5.0, 5.0)))
    forAll(vecGen, Gen.chooseNum(1, 8), Gen.long) { (v, nPlanes, seed) =>
      val rng = new scala.util.Random(seed)
      val planes = Array.fill(nPlanes, v.length)(rng.nextDouble() * 2 - 1)
      val arr = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(v.toArray)
      val bits = VectorHashes.planeSigns(arr, planes, floatIn = false)
      (0 until nPlanes).forall { j =>
        val dot = v.toArray.zip(planes(j)).map { case (x, p) => x * p }
          .foldLeft(0.0)(_ + _)
        ((bits >> j) & 1L) == (if (dot > 0.0) 1L else 0L)
      }
    }
  }

  property("textStats matches the Java-regex model") = forAll(texts) { s =>
    val lowered = s.toLowerCase
    val row = TextStatsKernel.textStats(u(s), u(lowered))
    val nChars = s.codePointCount(0, s.length).toLong
    val nWs = s.split("\\s+").count(_.nonEmpty).toLong
    val nSub = {
      val m = java.util.regex.Pattern
        .compile("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]").matcher(s)
      var c = 0L; while (m.find()) c += 1; c
    }
    val toks = lowered.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
    val meanTok =
      if (toks.nonEmpty)
        toks.map(t => t.codePointCount(0, t.length).toLong).sum.toDouble / toks.length
      else 0.0
    val stopSet = Set("the", "a", "an", "and", "or", "of", "to", "in", "is",
      "it", "that", "on", "for", "with", "as", "at", "by")
    val stopRatio =
      if (toks.nonEmpty) toks.count(stopSet).toDouble / toks.length else 0.0
    row.getLong(0) == nChars && row.getLong(1) == nWs &&
      row.getLong(2) == nSub && row.getDouble(3) == meanTok &&
      row.getDouble(5) == stopRatio &&
      row.getDouble(6) >= 0.0 && row.getDouble(6) <= 1.0
  }

  // ------------------------------------------------ Kafka long wire codec

  property("binary long codec: round-trip identity and big-endian wire " +
      "order (Kafka LongSerde contract) for arbitrary longs") =
    forAll { (v: Long) =>
      val wire = BinaryCodec.longToBytes(v)
      val ref = java.nio.ByteBuffer.allocate(8).putLong(v).array()
      wire.length == 8 &&
        java.util.Arrays.equals(wire, ref) &&
        BinaryCodec.bytesToLong(wire) == v
    }

  // ------------------------------------------------- winnowing signature

  property("winnow: sorted, distinct, non-negative, and equal to the " +
      "positional window-min model") =
    forAll(texts, Gen.chooseNum(1, 12), Gen.chooseNum(1, 8)) { (s, k, w) =>
      val got = {
        val a = TextHashes.winnowOf(u(s), k, w)
        (0 until a.numElements()).map(a.getLong).toVector
      }
      // independent model on codepoints
      val cps = s.codePoints().toArray
      def gram(j: Int): Long = {
        var h = 0xcbf29ce484222325L
        (j until math.min(j + k, cps.length)).foreach { t =>
          h ^= cps(t).toLong; h *= 0x100000001b3L
        }
        h >>> 1
      }
      val grams = (0 until math.max(cps.length - k + 1, 1)).map(gram)
      val want = (0 until math.max(grams.length - w + 1, 1))
        .map(i => grams.slice(i, i + w).min).distinct.sorted.toVector
      got == want && got.forall(_ >= 0) && got == got.distinct.sorted
    }

  property("cpNgramHashes IS winnow at w=1 (every window's min is the " +
      "gram itself — the complete shingle set), and is the sorted " +
      "distinct gram model") =
    forAll(texts, Gen.chooseNum(1, 12)) { (s, k) =>
      def arr(a: org.apache.spark.sql.catalyst.util.ArrayData): Vector[Long] =
        (0 until a.numElements()).map(a.getLong).toVector
      val got = arr(TextHashes.cpNgramHashesOf(u(s), k))
      val viaWinnow = arr(TextHashes.winnowOf(u(s), k, 1))
      val cps = s.codePoints().toArray
      def gram(j: Int): Long = {
        var h = 0xcbf29ce484222325L
        (j until math.min(j + k, cps.length)).foreach { t =>
          h ^= cps(t).toLong; h *= 0x100000001b3L
        }
        h >>> 1
      }
      val want = (0 until math.max(cps.length - k + 1, 1))
        .map(gram).distinct.sorted.toVector
      got == viaWinnow && got == want
    }

  property("winnow guarantee: docs sharing a substring of k+w-1 " +
      "codepoints share a fingerprint") =
    forAll(texts, texts, texts, Gen.chooseNum(2, 8), Gen.chooseNum(2, 6)) {
      (a, b, shared0, k, w) =>
        // pad/trim the shared run to exactly k+w-1 CODEPOINTS (substring
        // counts chars and would split surrogate pairs / undershoot)
        val need = k + w - 1
        val sharedCps = (shared0 + "x" * need).codePoints().toArray.take(need)
        val shared = new String(sharedCps, 0, need)
        val d1 = a + shared + b
        val d2 = b + "y" + shared + a
        def fps(s: String) = {
          val arr = TextHashes.winnowOf(u(s), k, w)
          (0 until arr.numElements()).map(arr.getLong).toSet
        }
        fps(d1).intersect(fps(d2)).nonEmpty
    }

  // --------------------------------------------- bounded top-k heap model

  private val offers: Gen[List[(Long, Double)]] = {
    val score: Gen[Double] = Gen.frequency(
      8 -> Gen.chooseNum(-5, 5).map(_ / 4.0), // dense ties
      // normalize -0.0 -> 0.0: the heap compares primitively (-0.0 == 0.0
      // ties on id) while the model's Ordering[Double] sorts -0.0 below
      // 0.0 — the production paths never produce -0.0 scores
      2 -> Gen.chooseNum(-1.0, 1.0).map(s => if (s == 0.0) 0.0 else s),
      1 -> Gen.oneOf(Double.PositiveInfinity, Double.NegativeInfinity,
        Double.NaN))
    Gen.chooseNum(0, 120).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 40L), score)))
  }

  property("TopKBuffer == sort-based top-k under random partition splits " +
      "+ serde round-trip (ties, infinities, NaN)") =
    forAll(offers, Gen.chooseNum(1, 12), Gen.chooseNum(1, 5)) {
      (xs, k, nParts) =>
        // scatter offers over nParts partial buffers, round-trip each
        // through the aggregate's wire format, then merge — the exact
        // partial/shuffle/final path TopKByScore drives
        val parts = Array.fill(nParts)(new graft.ops.TopKBuffer(k))
        xs.zipWithIndex.foreach { case ((id, s), i) =>
          parts(i % nParts).offer(id, s)
        }
        val merged = new graft.ops.TopKBuffer(k)
        parts.foreach(p =>
          graft.ops.TopKBuffer.fromBytes(k, p.toBytes)
            .foreach((id, s) => merged.offer(id, s)))
        val got = merged.sortedDesc.toList
        val want = xs.filterNot(_._2.isNaN)
          .sortBy { case (id, s) => (-s, id) }.take(k)
        got == want
    }

  property("charDiversity == naive codepoint-count model (incl. " +
      "supplementary-plane chars); invariants n<=sum_sq<=n^2") =
    forAll(texts) { s =>
      val row = CharDiversityKernel.diversity(u(s))
      val (n, distinct, sumSq) =
        (row.getLong(0), row.getLong(1), row.getLong(2))
      // model: count code points the boring way
      val counts = s.codePoints().toArray.groupBy(identity)
        .map { case (_, v) => v.length.toLong }
      val mN = counts.sum
      val mSq = counts.map(c => c * c).sum
      val simpsonOk =
        if (mN == 0) row.getDouble(3) == 0.0
        else row.getDouble(3) == mSq.toDouble / (mN.toDouble * mN.toDouble)
      n == mN && distinct == counts.size && sumSq == mSq && simpsonOk &&
        (mN == 0 || (sumSq >= n && sumSq <= n * n))
    }

  property("charDiversity extremes: single repeated char -> simpson 1; " +
      "all-distinct -> simpson 1/n") =
    forAll(Gen.chooseNum(1, 50)) { n =>
      val same = CharDiversityKernel.diversity(u("a" * n))
      val allDiff = CharDiversityKernel.diversity(
        u((0 until n).map(i => ('a' + i % 26).toChar).mkString.distinct))
      val m = allDiff.getLong(0)
      same.getDouble(3) == 1.0 &&
        allDiff.getDouble(3) == m.toDouble / (m.toDouble * m.toDouble)
    }

  property("token_ngrams over word_ngrams(·, 1) IS word_ngrams(·, n) — " +
      "the r21 tokenize-once law (repetitionSignals / lmScore derive " +
      "every order from one token array)") =
    forAll(texts, Gen.chooseNum(1, 6)) { (s, n) =>
      val direct = TextHashes.wordNgramsOf(u(s), n)
      val viaArr = TextHashes.tokenNgramsOf(
        TextHashes.wordNgramsOf(u(s), 1), n)
      val d = (0 until direct.numElements()).map(direct.getUTF8String)
      val v = (0 until viaArr.numElements()).map(viaArr.getUTF8String)
      d == v
    }
}
