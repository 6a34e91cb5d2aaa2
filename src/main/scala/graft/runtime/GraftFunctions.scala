package graft.runtime

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions._

/** SQL-surface registration of graft's custom expressions, so runtime
  * scripts (and plain `spark.sql`) can call them by name. Usable two
  * ways:
  *
  *  - `SparkSession.builder.withExtensions(new GraftExtensions)` —
  *    the standard Spark extension hook (what [[Main]] does);
  *  - `GraftFunctions.registerAll(spark)` — direct registration on an
  *    existing session (tests, notebooks).
  *
  * The reference exposes its scalar environment to scripts the same
  * way, by injecting `timecvt`/`log` tables into the Lua globals
  * (LuaEnvironment.scala:6-36); here the "globals" are Catalyst's
  * FunctionRegistry and every function is codegen'd.
  */
object GraftFunctions {

  private def one(f: Expression => Expression): Seq[Expression] => Expression = {
    case Seq(a) => f(a)
    case args => throw new IllegalArgumentException(s"expected 1 argument, got ${args.length}")
  }
  private def two(f: (Expression, Expression) => Expression): Seq[Expression] => Expression = {
    case Seq(a, b) => f(a, b)
    case args => throw new IllegalArgumentException(s"expected 2 arguments, got ${args.length}")
  }

  /** name -> (class, builder). */
  val all: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("graft_binary_to_long", classOf[BinaryToLong], one(BinaryToLong)),
    ("graft_long_to_binary", classOf[LongToBinary], one(LongToBinary)),
    ("graft_simhash64", classOf[SimHash64], one(SimHash64)),
    ("graft_rolling_hash64", classOf[RollingHash64], one(RollingHash64)),
    ("graft_cosine_sim", classOf[CosineSim], two(CosineSim(_, _))),
    ("graft_ngram_jaccard", classOf[NgramJaccard],
      two(NgramJaccard(_, _, 5))),
    ("graft_ngram_count", classOf[NgramCount], one(NgramCount(_, 5))),
    ("graft_minhash_sig", classOf[MinHashSig],
      one(MinHashSig(_, 5, 64, 42L))),
    ("graft_sig_agreement", classOf[SigAgreement], two(SigAgreement(_, _))),
    ("graft_text_stats", classOf[TextStats], two(TextStats(_, _))),
    ("graft_char_diversity", classOf[CharDiversity], one(CharDiversity)),
    ("graft_repetition_ratio", classOf[RepetitionRatio],
      one(RepetitionRatio(_, 5))),
    ("graft_winnow", classOf[Winnow], one(Winnow(_, 8, 4))),
    ("graft_word_ngrams", classOf[WordNgrams], one(WordNgrams(_, 2))),
    ("graft_splitmix64", classOf[SplitMix64], one(SplitMix64)),
    ("graft_quantize_vec", classOf[QuantizeVec], one(QuantizeVec)),
    ("graft_dequantize_vec", classOf[DequantizeVec], two(DequantizeVec(_, _))),
    // the merge table must be a FOLDABLE array<array<string>> literal
    // (each inner array one (l, r) pair, round order) — it is interned
    // to the kernel's id tables at plan time, like Centroids' codebooks
    ("graft_bpe_apply", classOf[graft.functions.BpeApply], {
      case Seq(syms, rules) if rules.foldable &&
          rules.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] =>
        val arr = rules.eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val merges = (0 until arr.numElements()).map { i =>
          val p = arr.getArray(i)
          require(p != null && p.numElements() == 2,
            s"graft_bpe_apply: rule $i must be a 2-element array (l, r)")
          (p.getUTF8String(0).toString, p.getUTF8String(1).toString)
        }
        graft.functions.BpeApply(syms, merges)
      case _ => throw new IllegalArgumentException(
        "graft_bpe_apply(syms, rules) requires a foldable " +
          "array(array(l, r), ...) merge table literal")
    }),
    // k must be an int literal: it sizes the estimator's numerator and
    // must equal the sketch's build k (the same-k contract)
    ("graft_kmv_estimate", classOf[graft.ops.KmvEstimateFromKth], {
      case Seq(kth, Literal(k: Int, IntegerType)) =>
        graft.ops.KmvEstimateFromKth(kth, k)
      case _ => throw new IllegalArgumentException(
        "graft_kmv_estimate(kth_bits, k) requires a literal int k")
    })
  )

  def register(ext: SparkSessionExtensions): Unit =
    all.foreach { case (name, cls, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name), builder))
    }

  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, cls, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name), builder)
    }
}

/** Extension entry point: `--conf spark.sql.extensions=graft.runtime.GraftExtensions`
  * or `SparkSession.builder.withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.register(ext)
}
