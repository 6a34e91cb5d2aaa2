package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Coarse-quantizer kernels for IVF-style ANN: assign a vector to its
  * nearest centroid (spherical k-means: max cosine = max dot against
  * unit-norm centroids) and list the `nprobe` nearest centroids to
  * probe at query time. Both are single-pass codegen'd expressions with
  * the centroid matrix as a codegen reference object — no plan-literal
  * matrices, no per-centroid norm recomputation (centroids are
  * pre-normalized once on the driver; the row vector's norm cancels in
  * an argmax so it is never computed at all). */
object Centroids {

  /** array<float|double> -> int: index of the max-dot centroid. */
  def centroid_assign(vec: Column, centroids: Array[Array[Double]]): Column =
    GraftColumnBridge.column(CentroidAssign(
      GraftColumnBridge.expression(vec), centroids.map(_.toSeq).toSeq))

  /** array<float|double> -> array<int>: indices of the `nprobe`
    * max-dot centroids, best first. */
  def centroid_probes(vec: Column, centroids: Array[Array[Double]],
      nprobe: Int): Column =
    GraftColumnBridge.column(CentroidProbes(
      GraftColumnBridge.expression(vec), centroids.map(_.toSeq).toSeq, nprobe))

  // ------------------------------------------------------ static kernels

  private def dot(v: ArrayData, c: Array[Double], floatIn: Boolean): Double = {
    val m = math.min(v.numElements(), c.length)
    var d = 0.0
    var i = 0
    if (floatIn) while (i < m) { d += v.getFloat(i).toDouble * c(i); i += 1 }
    else while (i < m) { d += v.getDouble(i) * c(i); i += 1 }
    d
  }

  /** Argmax-dot centroid index; ties break to the LOWER index. */
  def assign(v: ArrayData, cs: Array[Array[Double]], floatIn: Boolean): Int = {
    var best = 0
    var bestDot = Double.NegativeInfinity
    var j = 0
    while (j < cs.length) {
      val d = dot(v, cs(j), floatIn)
      if (d > bestDot) { bestDot = d; best = j }
      j += 1
    }
    best
  }

  /** array<float|double> -> array<int>: per-subspace nearest-codeword
    * indices (PRODUCT QUANTIZATION encode, Jégou et al. 2011). One code
    * per codebook, assignment by MIN squared L2 (ties to the lower
    * index) — PQ codebooks are plain (non-spherical) k-means, magnitudes
    * matter for the reconstruction. */
  def pq_encode(vec: Column,
      codebooks: Array[Array[Array[Double]]]): Column =
    GraftColumnBridge.column(PqEncode(GraftColumnBridge.expression(vec),
      codebooks.map(_.map(_.toSeq).toSeq).toSeq))

  /** array<int> -> array<double>: concatenated codewords — the PQ
    * RECONSTRUCTION. `cosine(pq_decode(codes), query)` IS asymmetric
    * distance computation (ADC): the sum decomposes into per-subspace
    * query x codeword dots, with the reconstruction's own norm in the
    * denominator. */
  def pq_decode(codes: Column,
      codebooks: Array[Array[Array[Double]]]): Column =
    GraftColumnBridge.column(PqDecode(GraftColumnBridge.expression(codes),
      codebooks.map(_.map(_.toSeq).toSeq).toSeq))

  /** Per-subspace argmin-L2 codes; vector elements past the input's
    * length read as 0.0 (mirrors [[dot]]'s clamp). */
  def pqEncode(v: ArrayData, books: Array[Array[Array[Double]]],
      floatIn: Boolean): ArrayData = {
    val m = books.length
    val n = v.numElements()
    val codes = new Array[Int](m)
    var j = 0
    var off = 0
    while (j < m) {
      val cb = books(j)
      val sub = cb(0).length
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var d = 0.0
        var i = 0
        while (i < sub) {
          val xi = off + i
          val x = (if (xi >= n) 0.0
                   else if (floatIn) v.getFloat(xi).toDouble
                   else v.getDouble(xi)) - cent(i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      off += sub
      j += 1
    }
    new GenericArrayData(codes)
  }

  /** Concatenated codewords for a code array; out-of-range or missing
    * codes fall back to codeword 0 (total function, never throws). */
  def pqDecode(codes: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    var dim = 0
    var jj = 0
    while (jj < m) { dim += books(jj)(0).length; jj += 1 }
    val out = new Array[Double](dim)
    var j = 0
    var off = 0
    while (j < m) {
      val cb = books(j)
      val sub = cb(0).length
      val raw = if (j < codes.numElements()) codes.getInt(j) else 0
      val cent = cb(if (raw >= 0 && raw < cb.length) raw else 0)
      var i = 0
      while (i < sub) { out(off + i) = cent(i); i += 1 }
      off += sub
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Top-`nprobe` centroid indices by dot, best first; ties break to
    * the lower index (stable insertion). */
  def probes(v: ArrayData, cs: Array[Array[Double]], nprobe: Int,
      floatIn: Boolean): ArrayData = {
    val n = math.min(nprobe, cs.length)
    val idx = new Array[Int](n)
    val ds = new Array[Double](n)
    java.util.Arrays.fill(ds, Double.NegativeInfinity)
    var j = 0
    while (j < cs.length) {
      val d = dot(v, cs(j), floatIn)
      if (d > ds(n - 1)) {
        // insertion into the sorted top-n (n is tiny: <= ~16)
        var p = n - 1
        while (p > 0 && ds(p - 1) < d) { ds(p) = ds(p - 1); idx(p) = idx(p - 1); p -= 1 }
        ds(p) = d; idx(p) = j
      }
      j += 1
    }
    new GenericArrayData(idx)
  }
}

trait CentroidExpression extends UnaryExpression {
  def centroids: Seq[Seq[Double]]
  @transient protected lazy val centroidArr: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  protected def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> input, got ${child.dataType}")
  protected def floatIn: Boolean = elemType.contains(FloatType)
}

/** array<float|double> -> int nearest-centroid index (codegen'd). */
case class CentroidAssign(child: Expression, centroids: Seq[Seq[Double]])
  extends CentroidExpression {
  require(centroids.nonEmpty)
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any): Any =
    Centroids.assign(v.asInstanceOf[ArrayData], centroidArr, floatIn)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroidArr, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Centroids.assign($c, $ref, $floatIn)")
  }
  override protected def withNewChildInternal(newChild: Expression): CentroidAssign =
    copy(child = newChild)
  override def prettyName: String = "graft_centroid_assign"
}

/** array<float|double> -> array<int> per-subspace PQ codes. */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
  extends CentroidExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty))
  override def centroids: Seq[Seq[Double]] = codebooks.head
  @transient private lazy val bookArr: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    Centroids.pqEncode(v.asInstanceOf[ArrayData], bookArr, floatIn)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", bookArr, "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Centroids.pqEncode($c, $ref, $floatIn)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
  override def prettyName: String = "graft_pq_encode"
}

/** array<int> -> array<double> concatenated-codeword reconstruction. */
case class PqDecode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
  extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty))
  @transient private lazy val bookArr: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int> input, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    Centroids.pqDecode(v.asInstanceOf[ArrayData], bookArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", bookArr, "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Centroids.pqDecode($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqDecode =
    copy(child = newChild)
  override def prettyName: String = "graft_pq_decode"
}

/** array<float|double> -> array<int> top-nprobe centroid indices. */
case class CentroidProbes(child: Expression, centroids: Seq[Seq[Double]],
    nprobe: Int) extends CentroidExpression {
  require(centroids.nonEmpty && nprobe > 0)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    Centroids.probes(v.asInstanceOf[ArrayData], centroidArr, nprobe, floatIn)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroidArr, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Centroids.probes($c, $ref, $nprobe, $floatIn)")
  }
  override protected def withNewChildInternal(newChild: Expression): CentroidProbes =
    copy(child = newChild)
  override def prettyName: String = "graft_centroid_probes"
}
