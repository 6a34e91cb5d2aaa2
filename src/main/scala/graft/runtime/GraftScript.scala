package graft.runtime

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.GraftColumnBridge

import graft.pipeline.Pipeline

/** The user-facing pipeline declaration: a text script, one step per
  * line, compiled to a [[Pipeline]] of Column expressions.
  *
  * The reference's script surface is a Lua chain evaluated per record by
  * an embedded interpreter (StreamProcessOperations.scala:24-70, 72-80);
  * the Spark-first equivalent makes CATALYST the script engine — steps
  * are Spark SQL expressions over the columns `key` and `value`, so a
  * runtime-supplied script still compiles into fused, codegen'd plan
  * nodes instead of an interpreter loop.
  *
  * Grammar (one step per line; blank lines and `#`/`--` comments
  * ignored):
  * {{{
  *   filter    <boolean expr over key, value>
  *   mapValues <expr over value>
  *   map       <key expr> => <value expr>
  * }}}
  * `mapValues` must not reference `key` (the reference's mapValues
  * receives only the value, StreamProcessOperations.scala:64-67);
  * violations fail at parse time, mirroring the reference's eager script
  * validation (:77).
  */
object GraftScript {

  final case class ScriptError(line: Int, msg: String)
    extends RuntimeException(s"script line $line: $msg")

  def parse(text: String): Pipeline = {
    val steps = text.linesIterator.zipWithIndex
      .map { case (l, i) => (l.trim, i + 1) }
      .filterNot { case (l, _) => l.isEmpty || l.startsWith("#") || l.startsWith("--") }
      .toVector
    steps.foldLeft(Pipeline()) { case (pipe, (line, ln)) =>
      val (op, rest) = line.span(!_.isWhitespace)
      val body = rest.trim
      if (body.isEmpty) throw ScriptError(ln, s"operator '$op' needs an expression")
      op match {
        case "filter" =>
          val e = parseExpr(body, ln)
          pipe.filter((_, _) => e)
        case "mapValues" =>
          val e = parseExpr(body, ln)
          if (references(e).contains("key"))
            throw ScriptError(ln, "mapValues sees only `value`, not `key` " +
              "(use `map` to transform the key)")
          pipe.mapValues(_ => e)
        case "map" =>
          val parts = body.split("=>", 2)
          if (parts.length != 2)
            throw ScriptError(ln, "map needs `<key expr> => <value expr>`")
          val ke = parseExpr(parts(0).trim, ln)
          val ve = parseExpr(parts(1).trim, ln)
          pipe.map((_, _) => (ke, ve))
        case other =>
          throw ScriptError(ln,
            s"unknown operator '$other' (expected filter|mapValues|map)")
      }
    }
  }

  def parseFile(path: String): Pipeline =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  /** Parse EAGERLY with the Catalyst parser (`functions.expr` defers
    * parsing to analysis time in Spark 4, which would turn script typos
    * into late runtime errors — the reference validates scripts at load,
    * StreamProcessOperations.scala:76-77). */
  private def parseExpr(s: String, ln: Int): Column =
    try GraftColumnBridge.column(CatalystSqlParser.parseExpression(s))
    catch { case e: Exception =>
      throw ScriptError(ln, s"cannot parse expression: ${e.getMessage}")
    }

  /** Unresolved attribute names referenced by an expression (lowercased;
    * nested refs like `value.person.name` root at `value`). */
  private def references(c: Column): Set[String] =
    GraftColumnBridge.expression(c).collect {
      case ua: UnresolvedAttribute => ua.nameParts.head.toLowerCase
    }.toSet
}
