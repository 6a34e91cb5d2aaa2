package graft.runtime

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{BinaryType, StringType}

import graft.serde.KeyValueMapping

/** The engine's CLI — the reference's flag surface re-expressed for a
  * Spark runtime (reference: Plumber.scala:88-145, checkConfig
  * :137-142):
  *
  * {{{
  * graft.runtime.Main
  *   -i <path>          source (parquet | json | csv | text by extension
  *                      or graft.input.format property)
  *   -o <path>          sink (format by extension / graft.output.format)
  *   -d <serde>         decode declaration over a Kafka-shaped binary
  *                      frame: long|string|void|avro=<file>, as "v" or
  *                      "k,v" (TypeConversions.scala:42-51 semantics)
  *   -s <serde>         encode declaration for the sink (same syntax)
  *   -l <script>        pipeline script (REQUIRED; see [[GraftScript]])
  *   -p <props>         properties file(s), later files win; `spark.*`
  *                      keys -> session conf, `graft.*` -> runtime opts
  *                      (PropertiesHelpers.scala:9-41 semantics)
  *   -t <golden.json>   golden pre-pass; mismatch refuses startup
  *                      (Plumber.scala:41-50)
  *   -D                 dry-run: verify goldens and exit
  *                      (Plumber.scala:53-55)
  *   --stream           Structured Streaming (file source) instead of
  *                      batch; needs --checkpoint for restartability
  *   --once             streaming trigger AvailableNow: process what's
  *                      there, then stop (CI/backfill mode)
  *   --checkpoint <dir> streaming checkpoint location
  * }}}
  *
  * Divergence from the reference, by design: sources/sinks are files
  * (parquet/json/csv/text) — the environment has no Kafka broker; the
  * serde layer (`-d`/`-s`) still speaks the Kafka-shaped
  * `(key: binary, value: binary)` frame, so a Kafka source drops in by
  * swapping `spark.read` for `spark.readStream.format("kafka")` with no
  * change to any other layer.
  */
object Main {

  final case class Args(
      input: Option[String] = None,
      output: Option[String] = None,
      inputSerde: Option[String] = None,
      outputSerde: Option[String] = None,
      script: Option[String] = None,
      props: Seq[String] = Nil,
      test: Option[String] = None,
      dryRun: Boolean = false,
      stream: Boolean = false,
      once: Boolean = false,
      checkpoint: Option[String] = None)

  def parseArgs(argv: Array[String]): Either[String, Args] = {
    @annotation.tailrec
    def go(rest: List[String], a: Args): Either[String, Args] = rest match {
      case Nil => Right(a)
      case ("-i" | "--input") :: v :: t => go(t, a.copy(input = Some(v)))
      case ("-o" | "--output") :: v :: t => go(t, a.copy(output = Some(v)))
      case ("-d" | "--input-serde") :: v :: t => go(t, a.copy(inputSerde = Some(v)))
      case ("-s" | "--output-serde") :: v :: t => go(t, a.copy(outputSerde = Some(v)))
      case ("-l" | "--script") :: v :: t => go(t, a.copy(script = Some(v)))
      case ("-p" | "--properties") :: v :: t => go(t, a.copy(props = a.props :+ v))
      case ("-t" | "--test") :: v :: t => go(t, a.copy(test = Some(v)))
      case ("-D" | "--dry-run") :: t => go(t, a.copy(dryRun = true))
      case "--stream" :: t => go(t, a.copy(stream = true))
      case "--once" :: t => go(t, a.copy(once = true))
      case "--checkpoint" :: v :: t => go(t, a.copy(checkpoint = Some(v)))
      case other :: _ => Left(s"unknown or incomplete flag: $other")
    }
    go(argv.toList, Args()).flatMap { a =>
      // checkConfig (Plumber.scala:137-142): script always required;
      // source+sink required unless dry-run.
      if (a.script.isEmpty) Left("-l <script> is required")
      else if (!a.dryRun && (a.input.isEmpty || a.output.isEmpty))
        Left("-i and -o are required unless --dry-run")
      else if (a.dryRun && a.test.isEmpty)
        Left("--dry-run needs -t <golden.json>")
      else Right(a)
    }
  }

  /** Load + merge properties files in order, later wins
    * (PropertiesHelpers.scala:15-25 semantics). */
  def loadProperties(paths: Seq[String]): Properties = {
    val p = new Properties()
    paths.foreach { path =>
      val in = new java.io.FileInputStream(path)
      try p.load(in) finally in.close()
    }
    p
  }

  /** Read the source as a canonical (key, value) frame. */
  private def readFrame(spark: SparkSession, path: String,
      serde: Option[String], format: Option[String]): DataFrame = {
    val fmt = format.getOrElse(formatOf(path))
    val raw = fmt match {
      case "parquet" => spark.read.parquet(path)
      case "json" => spark.read.json(path)
      case "csv" => spark.read.option("header", "true").csv(path)
      case "text" => spark.read.text(path)
      case other => throw new IllegalArgumentException(s"unknown input format $other")
    }
    frameify(raw, serde)
  }

  private[runtime] def frameify(raw: DataFrame, serde: Option[String]): DataFrame =
    serde match {
      case Some(decl) =>
        // Kafka-shaped binary frame expected; absent key column = void key.
        val kv = KeyValueMapping.fromString(decl)
        val withKey =
          if (raw.columns.contains("key")) raw
          else raw.withColumn("key", lit(null).cast(BinaryType))
        kv.decode(withKey)
      case None =>
        if (raw.columns.toSeq == Seq("key", "value")) raw
        else if (raw.columns.contains("value") && !raw.columns.contains("key"))
          raw.select(lit(null).cast(StringType).as("key"), col("value"))
        else raw.select(lit(null).cast(StringType).as("key"),
          struct(raw.columns.map(col).toIndexedSeq: _*).as("value"))
    }

  private def formatOf(path: String): String = {
    def byExt(p: String): Option[String] = {
      val l = p.toLowerCase
      if (l.endsWith(".json") || l.endsWith(".jsonl")) Some("json")
      else if (l.endsWith(".csv")) Some("csv")
      else if (l.endsWith(".txt") || l.endsWith(".text")) Some("text")
      else if (l.endsWith(".parquet")) Some("parquet")
      else None
    }
    byExt(path).getOrElse {
      // Directory: sniff the first data file's extension.
      val f = new java.io.File(path)
      val candidates =
        if (f.isDirectory)
          f.listFiles().toSeq.filterNot(_.getName.startsWith(".")).filterNot(_.getName.startsWith("_"))
            .flatMap(c => byExt(c.getName))
        else Nil
      candidates.headOption.getOrElse("parquet")
    }
  }

  /** Run with an existing session; returns a process exit code
    * (0 ok, 1 golden mismatch / runtime failure, 2 usage). */
  def run(spark: SparkSession, argv: Array[String]): Int =
    parseArgs(argv) match {
      case Left(err) =>
        System.err.println(s"[graft] $err"); 2
      case Right(args) => runParsed(spark, args)
    }

  private def runParsed(spark: SparkSession, args: Args): Int = {
    val props = loadProperties(args.props)
    props.stringPropertyNames().forEach { k =>
      if (k.startsWith("spark.")) spark.conf.set(k, props.getProperty(k))
    }
    def opt(key: String): Option[String] = Option(props.getProperty(key))

    val pipeline = GraftScript.parseFile(args.script.get)

    // Golden pre-pass gates startup (Plumber.scala:41-55 semantics).
    args.test.foreach { goldenPath =>
      GoldenFile.verify(spark, pipeline, goldenPath) match {
        case Left(msg) =>
          System.err.println(s"[graft] golden verification FAILED:\n$msg")
          return 1
        case Right(n) =>
          System.err.println(s"[graft] golden verification passed ($n records)")
      }
    }
    if (args.dryRun) return 0

    val inPath = args.input.get
    val outPath = args.output.get
    val outFmt = opt("graft.output.format").getOrElse(formatOf(outPath))

    if (!args.stream) {
      val frame = readFrame(spark, inPath, args.inputSerde,
        opt("graft.input.format"))
      val out = encode(pipeline.compile(frame), args.outputSerde)
      writeBatch(out, outFmt, outPath)
      0
    } else {
      // Streaming: file source with the batch-inferred schema (the
      // FileStreamSource needs one), same pipeline, checkpointed sink,
      // graceful shutdown (Plumber.scala:77-85 semantics).
      val fmt = opt("graft.input.format").getOrElse(formatOf(inPath))
      val schema = (fmt match {
        case "parquet" => spark.read.parquet(inPath)
        case "json" => spark.read.json(inPath)
        case "csv" => spark.read.option("header", "true").csv(inPath)
        case "text" => spark.read.text(inPath)
      }).schema
      val raw = (fmt match {
        case "parquet" => spark.readStream.schema(schema).parquet(inPath)
        case "json" => spark.readStream.schema(schema).json(inPath)
        case "csv" => spark.readStream.schema(schema)
          .option("header", "true").csv(inPath)
        case "text" => spark.readStream.schema(schema).text(inPath)
      })
      val out = encode(pipeline.compile(frameify(raw, args.inputSerde)),
        args.outputSerde)
      val query = out.writeStream
        .format(outFmt)
        .option("path", outPath)
        .option("checkpointLocation",
          args.checkpoint.getOrElse(outPath.stripSuffix("/") + "_checkpoint"))
        .trigger(if (args.once) Trigger.AvailableNow() else
          Trigger.ProcessingTime(0))
        .start()
      val hook = sys.addShutdownHook { query.stop() } // SIGTERM drains
      try { query.awaitTermination(); 0 }
      finally hook.remove()
    }
  }

  private def encode(df: DataFrame, serde: Option[String]): DataFrame =
    serde.map(d => KeyValueMapping.fromString(d).encode(df)).getOrElse(df)

  private def writeBatch(df: DataFrame, fmt: String, path: String): Unit =
    fmt match {
      case "parquet" => df.write.mode("overwrite").parquet(path)
      case "json" => df.write.mode("overwrite").json(path)
      case "csv" => df.write.mode("overwrite").option("header", "true").csv(path)
      case other => throw new IllegalArgumentException(s"unknown output format $other")
    }

  def main(argv: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val code = try run(spark, argv) finally spark.stop()
    if (code != 0) sys.exit(code)
  }
}
