package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka's LongSerde encodes a long as exactly 8 big-endian bytes
  * (reference serde surface: TypeConversions.scala:32). Spark has no
  * built-in binary<->long conversion, so these are custom Catalyst
  * expressions with `doGenCode` — they stay inside whole-stage codegen
  * rather than falling back to a Scala UDF.
  */
object BinaryCodec {
  /** 8-byte big-endian -> signed long. Null/short input -> null. */
  def bytesToLong(b: Array[Byte]): java.lang.Long =
    if (b == null || b.length != 8) null else ByteBuffer.wrap(b).getLong

  def longToBytes(v: Long): Array[Byte] =
    ByteBuffer.allocate(8).putLong(v).array()

  def binary_to_long(c: Column): Column =
    GraftColumnBridge.column(BinaryToLong(GraftColumnBridge.expression(c)))

  def long_to_binary(c: Column): Column =
    GraftColumnBridge.column(LongToBinary(GraftColumnBridge.expression(c)))

  /** Confluent Schema Registry wire format = 1 magic byte (0x00) + 4-byte
    * schema id + avro body (public Confluent wire-format spec; the
    * reference consumes it via KafkaAvroDeserializer,
    * GenericAvroSerializer.scala:52-73). Offline we strip the 5-byte
    * header to reach the Avro body. Malformed frames (wrong magic byte or
    * shorter than the header) surface as NULL rather than a corrupt Avro
    * body that fails mysteriously downstream. A ZERO-byte body is legal
    * (avro `null` type and empty records both serialize to 0 bytes), so
    * an exactly-5-byte frame passes: >= 5, not > 5. */
  def strip_confluent_header(c: Column): Column =
    when(length(c) >= 5 && substring(c, 1, 1) === lit(Array[Byte](0)),
        substring(c, 6, Int.MaxValue))
      .otherwise(lit(null).cast(BinaryType))

  /** The 5-byte Confluent wire-format header for schema `id`: magic
    * 0x00 + the id as a 4-byte big-endian int (ids are positive ints in
    * the registry protocol). Computed once at PLAN time — the framed
    * encode is a plain `concat` of a 5-byte literal. */
  def confluentHeader(id: Int): Array[Byte] = {
    require(id >= 0, s"Confluent schema ids are non-negative ints, got $id")
    ByteBuffer.allocate(5).put(0: Byte).putInt(id).array()
  }

  /** Frame an Avro body in the Confluent wire format (encode-side dual
    * of [[strip_confluent_header]]). */
  def add_confluent_header(c: Column, schemaId: Int): Column =
    concat(lit(confluentHeader(schemaId)), c)

  /** Schema id carried by a wire-format frame, as a long (null when the
    * frame isn't Confluent-framed). Routes through the codegen'd
    * [[binary_to_long]] by zero-padding the 4 id bytes to 8 — long, not
    * int, because the 4 bytes are UNSIGNED in [0, 2^32) and an ANSI
    * int cast would throw on ids >= 2^31. */
  def confluent_schema_id(c: Column): Column =
    when(length(c) >= 5 && substring(c, 1, 1) === lit(Array[Byte](0)),
        binary_to_long(concat(lit(Array[Byte](0, 0, 0, 0)),
          substring(c, 2, 4))))
      .otherwise(lit(null).cast(LongType))
}

/** binary(8, big-endian) -> long; non-8-byte input yields null (SQL-safe
  * analogue of Kafka's SerializationException). */
case class BinaryToLong(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary input, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    BinaryCodec.bytesToLong(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c.length == 8) {
         |  ${ev.value} = java.nio.ByteBuffer.wrap($c).getLong();
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin)
  override protected def withNewChildInternal(newChild: Expression): BinaryToLong =
    copy(child = newChild)
  override def prettyName: String = "graft_binary_to_long"
}

/** long -> binary(8, big-endian). */
case class LongToBinary(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires long input, got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(v: Any): Any =
    BinaryCodec.longToBytes(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = java.nio.ByteBuffer.allocate(8).putLong($c).array();")
  override protected def withNewChildInternal(newChild: Expression): LongToBinary =
    copy(child = newChild)
  override def prettyName: String = "graft_long_to_binary"
}
