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
