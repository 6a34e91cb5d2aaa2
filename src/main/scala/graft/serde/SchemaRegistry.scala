package graft.serde

import org.apache.avro.Schema

/** Confluent Schema Registry abstraction for wire-format Avro serdes
  * (reference: GenericAvroSerializer.scala:29-73, which delegates to
  * KafkaAvroDeserializer against a live registry).
  *
  * Spark-first split: the WIRE FORMAT (magic 0x00 + 4-byte big-endian
  * schema id + Avro body — the public Confluent framing) is handled
  * entirely in codegen'd Column expressions
  * ([[graft.functions.BinaryCodec]]); the registry itself is only a
  * schema-id -> schema lookup consulted at PLAN time, never per row.
  * That keeps the hot path identical whether schemas come from a live
  * registry or a checked-in directory: an HTTP-backed implementation of
  * this trait (GET /schemas/ids/{id}) plugs in without touching any
  * expression — this sandbox has no egress, so the shipped
  * implementations are static.
  */
trait SchemaRegistryClient {
  /** Writer schema registered under `id`, if known. */
  def schemaById(id: Int): Option[Schema]
}

/** In-memory id -> schema binding (test and fixed-topology use). */
final case class StaticSchemaRegistry(schemas: Map[Int, Schema])
    extends SchemaRegistryClient {
  def schemaById(id: Int): Option[Schema] = schemas.get(id)
}

/** Directory of `<id>.avsc` files as a registry snapshot — the offline
  * mirror pattern for air-gapped clusters: dump each subject's schema to
  * `<id>.avsc` once, ship the directory with the job. Files are parsed
  * eagerly so a malformed schema fails at CONSTRUCTION (driver, plan
  * time), not mid-job. */
object FileSchemaRegistry {
  def apply(dir: String): StaticSchemaRegistry = {
    val d = new java.io.File(dir)
    require(d.isDirectory, s"not a directory: $dir")
    val entries = d.listFiles().toSeq
      .filter(_.getName.endsWith(".avsc"))
      .flatMap { f =>
        f.getName.stripSuffix(".avsc").toIntOption.map { id =>
          id -> new Schema.Parser().parse(f)
        }
      }
    StaticSchemaRegistry(entries.toMap)
  }
}
