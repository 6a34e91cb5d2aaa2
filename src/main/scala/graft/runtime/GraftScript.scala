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
  *   let       <name> = <expr>
  *   filter    <boolean expr over key, value>
  *   mapValues <expr over value>
  *   map       <key expr> => <value expr>
  *   udf       <registered-name>
  * }}}
  * `mapValues` must not reference `key` (the reference's mapValues
  * receives only the value, StreamProcessOperations.scala:64-67);
  * violations fail at parse time, mirroring the reference's eager script
  * validation (:77).
  *
  * `udf <name>` is the ESCAPE HATCH for per-record logic that is not
  * expressible as a SQL expression — the analogue of the reference's
  * arbitrary Lua step closures (StreamProcessOperations.scala:140-146).
  * The embedding application registers a named `(key, value) => value'`
  * Column transform via [[GraftScript.registerUdf]] — typically
  * wrapping a Scala lambda with `org.apache.spark.sql.functions.udf`,
  * which runs distributed like any Spark UDF (opaque to Catalyst, so
  * prefer expression steps where possible). The key passes through
  * unchanged; reshape with a following `map` if needed. An unknown name
  * fails at parse time, like every other script error.
  *
  * `let` gives multi-statement scripts named intermediates (the
  * analogue of locals in the reference's Lua step closures,
  * examples/csv/example.lua:3-5). It is a MACRO: the bound expression
  * is substituted into later steps at the AST level, so `value` inside
  * a binding always means the value AS OF THE STEP USING IT — bind and
  * use adjacently, as the Lua locals were. Catalyst's subexpression
  * elimination de-duplicates repeated expansions at execution time.
  */
object GraftScript {

  final case class ScriptError(line: Int, msg: String)
    extends RuntimeException(s"script line $line: $msg")

  /** Named `(key, value) => value'` transforms callable from scripts via
    * the `udf <name>` step. Registration is application-side Scala (the
    * place arbitrary logic must come from in a compiled engine; the
    * reference inlines Lua because it SHIPS an interpreter). */
  private val udfRegistry =
    new java.util.concurrent.ConcurrentHashMap[String, (Column, Column) => Column]()

  def registerUdf(name: String, f: (Column, Column) => Column): Unit =
    udfRegistry.put(name.toLowerCase, f)

  def unregisterUdf(name: String): Unit =
    udfRegistry.remove(name.toLowerCase)

  def parse(text: String): Pipeline = {
    val steps = text.linesIterator.zipWithIndex
      .map { case (l, i) => (l.trim, i + 1) }
      .filterNot { case (l, _) => l.isEmpty || l.startsWith("#") || l.startsWith("--") }
      .toVector
    var bindings = Map.empty[String, Column]
    def expand(c: Column): Column = substitute(c, bindings)
    steps.foldLeft(Pipeline()) { case (pipe, (line, ln)) =>
      val (op, rest) = line.span(!_.isWhitespace)
      val body = rest.trim
      if (body.isEmpty) throw ScriptError(ln, s"operator '$op' needs an expression")
      op match {
        case "let" =>
          val parts = body.split("=", 2)
          if (parts.length != 2 || parts(0).trim.isEmpty)
            throw ScriptError(ln, "let needs `<name> = <expr>`")
          val name = parts(0).trim.toLowerCase
          if (!name.forall(ch => ch.isLetterOrDigit || ch == '_') || !name.head.isLetter)
            throw ScriptError(ln, s"invalid let name '$name'")
          if (name == "key" || name == "value")
            throw ScriptError(ln, "cannot rebind `key`/`value`")
          bindings += name -> expand(parseExpr(parts(1).trim, ln))
          pipe
        case "filter" =>
          val e = expand(parseExpr(body, ln))
          pipe.filter((_, _) => e)
        case "mapValues" =>
          val e = expand(parseExpr(body, ln))
          if (references(e).contains("key"))
            throw ScriptError(ln, "mapValues sees only `value`, not `key` " +
              "(use `map` to transform the key)")
          pipe.mapValues(_ => e)
        case "map" =>
          val parts = body.split("=>", 2)
          if (parts.length != 2)
            throw ScriptError(ln, "map needs `<key expr> => <value expr>`")
          val ke = expand(parseExpr(parts(0).trim, ln))
          val ve = expand(parseExpr(parts(1).trim, ln))
          pipe.map((_, _) => (ke, ve))
        case "udf" =>
          val name = body.toLowerCase
          if (!name.forall(ch => ch.isLetterOrDigit || ch == '_'))
            throw ScriptError(ln, s"udf needs a single registered name, got '$body'")
          val f = Option(udfRegistry.get(name)).getOrElse(
            throw ScriptError(ln, s"unknown udf '$name' — register it with " +
              "GraftScript.registerUdf(name, (key, value) => ...)"))
          pipe.map((k, v) => (k, f(k, v)))
        case other =>
          throw ScriptError(ln,
            s"unknown operator '$other' (expected let|filter|mapValues|map|udf)")
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

  /** Replace references to `let`-bound names with their expressions;
    * trailing name parts become field extractions (`parts.x` ->
    * extract(`<binding>`, 'x')). */
  private def substitute(c: Column, bindings: Map[String, Column]): Column = {
    if (bindings.isEmpty) return c
    import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
    import org.apache.spark.sql.catalyst.expressions.Literal
    val out = GraftColumnBridge.expression(c).transformUp {
      case ua: UnresolvedAttribute
          if bindings.contains(ua.nameParts.head.toLowerCase) =>
        val root = GraftColumnBridge.expression(
          bindings(ua.nameParts.head.toLowerCase))
        ua.nameParts.tail.foldLeft(root)((e, f) =>
          UnresolvedExtractValue(e, Literal(f)))
    }
    GraftColumnBridge.column(out)
  }
}
