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
  * Kafka parity (reference Plumber.scala:62-74): `-i kafka:<topic>` /
  * `-o kafka:<topic>` select the Spark Kafka connector, configured via
  * properties — `graft.kafka.brokers` (required; maps to
  * `kafka.bootstrap.servers`), `graft.kafka.starting.offsets`
  * (default `earliest`), `graft.kafka.fail.on.data.loss`. The connector
  * frame already carries `(key: binary, value: binary)`, which is
  * exactly what the serde layer (`-d`/`-s`) speaks, so no other layer
  * changes. NOTE: this sandbox has neither a broker nor the
  * spark-sql-kafka connector jar, so the Kafka path is covered by
  * option/plan-construction tests only; on a real cluster the connector
  * jar on the classpath is the one missing piece (Spark raises its
  * standard "Failed to find data source: kafka" guidance otherwise).
  * File sources/sinks (parquet/json/csv/text) remain the default.
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

  private val fileFormats = Set("parquet", "json", "csv", "text")

  /** `kafka:<topic>` / `kafka://<topic>` source-or-sink declaration. */
  private[runtime] def kafkaTopic(path: String): Option[String] =
    if (path.startsWith("kafka:"))
      Some(path.stripPrefix("kafka:").stripPrefix("//"))
    else None

  /** Connector options for a Kafka source (reference Plumber.scala:62-65
    * semantics: one subscribed topic, brokers from properties). */
  private[runtime] def kafkaSourceOptions(topic: String,
      props: Properties): Either[String, Map[String, String]] =
    Option(props.getProperty("graft.kafka.brokers")) match {
      case None => Left("kafka source needs graft.kafka.brokers=<host:port,...> in -p properties")
      case Some(brokers) => Right(Map(
        "kafka.bootstrap.servers" -> brokers,
        "subscribe" -> topic,
        "startingOffsets" ->
          Option(props.getProperty("graft.kafka.starting.offsets")).getOrElse("earliest"),
        "failOnDataLoss" ->
          Option(props.getProperty("graft.kafka.fail.on.data.loss")).getOrElse("true")))
    }

  /** Connector options for a Kafka sink (Plumber.scala:71-74). */
  private[runtime] def kafkaSinkOptions(topic: String,
      props: Properties): Either[String, Map[String, String]] =
    Option(props.getProperty("graft.kafka.brokers")) match {
      case None => Left("kafka sink needs graft.kafka.brokers=<host:port,...> in -p properties")
      case Some(brokers) => Right(Map(
        "kafka.bootstrap.servers" -> brokers,
        "topic" -> topic))
    }

  /** Read a file source as a canonical (key, value) frame. `fmt` has
    * been validated against [[fileFormats]] by the caller. */
  private def readFrame(spark: SparkSession, path: String,
      serde: Option[String], fmt: String): DataFrame = {
    val raw = fmt match {
      case "parquet" => spark.read.parquet(path)
      case "json" => spark.read.json(path)
      case "csv" => spark.read.option("header", "true").csv(path)
      case "text" => spark.read.text(path)
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
    val inKafka = kafkaTopic(inPath)
    val outKafka = kafkaTopic(outPath)

    // Validate file formats up front so misconfiguration is a clean
    // usage error (exit 2), not a MatchError deep in a branch.
    def usage(msg: String): Int = { System.err.println(s"[graft] $msg"); 2 }
    val inFmt = opt("graft.input.format").getOrElse(formatOf(inPath))
    if (inKafka.isEmpty && !fileFormats(inFmt))
      return usage(s"unknown input format `$inFmt` (expected ${fileFormats.mkString("|")})")
    val outFmt = opt("graft.output.format").getOrElse(formatOf(outPath))
    if (outKafka.isEmpty && !fileFormats(outFmt))
      return usage(s"unknown output format `$outFmt` (expected ${fileFormats.mkString("|")})")

    if (!args.stream) {
      val frame = inKafka match {
        case Some(topic) =>
          kafkaSourceOptions(topic, props) match {
            case Left(err) => return usage(err)
            case Right(o) => frameify(
              spark.read.format("kafka").options(o).load()
                .select(col("key"), col("value")), args.inputSerde)
          }
        case None => readFrame(spark, inPath, args.inputSerde, inFmt)
      }
      val out = encode(pipeline.compile(frame), args.outputSerde)
      outKafka match {
        case Some(topic) =>
          kafkaSinkOptions(topic, props) match {
            case Left(err) => return usage(err)
            case Right(o) => out.write.format("kafka").options(o).save()
          }
        case None => writeBatch(out, outFmt, outPath)
      }
      0
    } else {
      // Streaming: same pipeline over readStream, checkpointed sink,
      // graceful shutdown (Plumber.scala:77-85 semantics). File sources
      // use the batch-inferred schema (the FileStreamSource needs one);
      // the Kafka source has a fixed frame schema.
      val raw = inKafka match {
        case Some(topic) =>
          kafkaSourceOptions(topic, props) match {
            case Left(err) => return usage(err)
            case Right(o) => spark.readStream.format("kafka").options(o)
              .load().select(col("key"), col("value"))
          }
        case None =>
          val schema = (inFmt match {
            case "parquet" => spark.read.parquet(inPath)
            case "json" => spark.read.json(inPath)
            case "csv" => spark.read.option("header", "true").csv(inPath)
            case "text" => spark.read.text(inPath)
          }).schema
          inFmt match {
            case "parquet" => spark.readStream.schema(schema).parquet(inPath)
            case "json" => spark.readStream.schema(schema).json(inPath)
            case "csv" => spark.readStream.schema(schema)
              .option("header", "true").csv(inPath)
            case "text" => spark.readStream.schema(schema).text(inPath)
          }
      }
      val out = encode(pipeline.compile(frameify(raw, args.inputSerde)),
        args.outputSerde)
      val writer = outKafka match {
        case Some(topic) =>
          kafkaSinkOptions(topic, props) match {
            case Left(err) => return usage(err)
            case Right(o) => out.writeStream.format("kafka").options(o)
          }
        case None =>
          val base = (if (outFmt == "text") forTextSink(out) else out)
            .writeStream.format(outFmt)
          base.option("path", outPath)
      }
      // A kafka:<topic> output is not a filesystem path — deriving a
      // default checkpoint from it would crash at start with a scheme
      // error; require an explicit one instead.
      if (outKafka.isDefined && args.checkpoint.isEmpty)
        return usage("streaming to a kafka sink needs --checkpoint <dir>")
      val query = writer
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

  /** Spark's text sink takes exactly one string column: write `value`
    * (cast to string), mirroring a value-only Kafka producer. */
  private def forTextSink(df: DataFrame): DataFrame = {
    require(df.columns.contains("value"),
      "text output needs a `value` column in the pipeline result")
    df.select(col("value").cast(StringType).as("value"))
  }

  private def writeBatch(df: DataFrame, fmt: String, path: String): Unit =
    fmt match {
      case "parquet" => df.write.mode("overwrite").parquet(path)
      case "json" => df.write.mode("overwrite").json(path)
      case "csv" => df.write.mode("overwrite").option("header", "true").csv(path)
      case "text" => forTextSink(df).write.mode("overwrite").text(path)
    }

  def main(argv: Array[String]): Unit = {
    val builder = SparkSession.builder()
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit injects spark.master; default to local[*] when absent
    // so the CLI also runs standalone (sbt runMain / java -cp).
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master("local[*]")).getOrCreate()
    val code = try run(spark, argv) finally spark.stop()
    if (code != 0) sys.exit(code)
  }
}
