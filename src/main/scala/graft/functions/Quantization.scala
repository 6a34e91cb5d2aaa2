package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Symmetric int8 scalar quantization for embedding columns — 4x (fp32)
  * to 8x (fp64) storage/bandwidth reduction for ANN candidate scans at
  * 100 TB, with exact-rescore on the fp originals for the final top-k.
  *
  * Contract (pinned so an external engine can reproduce it bit-for-bit):
  * `scale = max_i |x_i| / 127` (double arithmetic over widened floats);
  * `code_i = clamp(floor(x_i / scale + 0.5), -127, 127)` — floor-based
  * half-up rounding, NOT banker's/half-away, because floor has identical
  * semantics in every engine; a zero vector quantizes to scale 0, all
  * codes 0. Dequantization is `code_i * scale`, so per-element error is
  * at most scale/2. */
object Quantization {

  /** array<float|double> -> struct(scale: double, codes: array<tinyint>). */
  def quantize(vec: Column): Column =
    GraftColumnBridge.column(QuantizeVec(GraftColumnBridge.expression(vec)))

  /** (scale, codes) -> array<double> reconstruction. */
  def dequantize(scale: Column, codes: Column): Column =
    GraftColumnBridge.column(DequantizeVec(
      GraftColumnBridge.expression(scale), GraftColumnBridge.expression(codes)))

  val quantizedType: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("codes", ArrayType(ByteType, containsNull = false), nullable = false)))

  // ------------------------------------------------------ static kernels

  def quantizeKernel(v: ArrayData, floatIn: Boolean): InternalRow = {
    val n = v.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = if (floatIn) v.getFloat(i).toDouble else v.getDouble(i)
      val a = math.abs(x)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127.0
    val codes = new Array[Byte](n)
    if (scale > 0.0) {
      i = 0
      while (i < n) {
        val x = if (floatIn) v.getFloat(i).toDouble else v.getDouble(i)
        val c = math.floor(x / scale + 0.5)
        codes(i) = math.max(-127.0, math.min(127.0, c)).toByte
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](scale,
      new GenericArrayData(codes.map(b => b: Any))))
  }

  def dequantizeKernel(scale: Double, codes: ArrayData): ArrayData = {
    val n = codes.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = codes.getByte(i) * scale; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** array<float|double> -> struct(scale, codes) int8 quantization. */
case class QuantizeVec(child: Expression) extends UnaryExpression {
  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${child.dataType}")
  private def floatIn: Boolean = elemType.contains(FloatType)
  override def dataType: DataType = Quantization.quantizedType
  override protected def nullSafeEval(v: Any): Any =
    Quantization.quantizeKernel(v.asInstanceOf[ArrayData], floatIn)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Quantization.quantizeKernel($c, $floatIn)")
  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
  override def prettyName: String = "graft_quantize_vec"
}

/** (double scale, array<tinyint> codes) -> array<double>. */
case class DequantizeVec(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, ArrayType(ByteType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, array<tinyint>), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(s: Any, c: Any): Any =
    Quantization.dequantizeKernel(s.asInstanceOf[Double], c.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, c) =>
      s"graft.functions.Quantization.dequantizeKernel($s, $c)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DequantizeVec =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dequantize_vec"
}
