package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** The reference exposes exactly two scalar time conversions to scripts,
  * `timecvt.iso8601ToUnixTimestamp` and `timecvt.unixTimestampToIso8601`
  * (reference: LuaEnvironment.scala:29-36, Joda-backed, millisecond
  * precision, unix time as seconds-in-a-double). Spark-first: these are
  * compositions of built-in codegen'd functions — no UDF.
  *
  * ISO-8601 parsing accepts offsets (`+01:00`), `Z`, and fractional
  * seconds (the reference's golden vectors cover all three:
  * examples/time/example.test.lua:1-14), which Spark's timestamp cast
  * handles natively under the session time zone (UTC).
  */
object TimeFunctions {

  /** ISO-8601 string -> unix seconds as double (ms precision), the exact
    * reference signature. Unparsable input -> null (the reference script
    * pattern then drops it — examples/time/example.lua:6-12). Spark 4
    * defaults ANSI mode on, where a plain cast THROWS on unparsable
    * input; `try_to_timestamp` restores the cast-or-null contract
    * without disabling ANSI session-wide. */
  def iso8601ToUnixTimestamp(c: Column): Column =
    parseIso(c).cast(DoubleType)

  /** ISO-8601 string -> unix epoch milliseconds as long, exact (no
    * double rounding: `unix_millis` is integral end-to-end; the
    * reference gets ms via `math.floor(seconds * 1000)`,
    * examples/time/example.lua:11). */
  def iso8601ToUnixMillis(c: Column): Column =
    unix_millis(parseIso(c))

  /** ANSI-safe ISO-8601 parse: unparsable -> null. `try_to_timestamp`
    * without a format uses the same ISO-8601-friendly parsing as the
    * timestamp cast (offsets, `Z`, fractional seconds). */
  private def parseIso(c: Column): Column =
    try_to_timestamp(c.cast(StringType))

  /** unix seconds (double, ms precision) -> ISO-8601 string with ms and
    * UTC offset, mirroring the reference's Joda `ISODateTimeFormat`
    * output shape (LuaEnvironment.scala:33). */
  def unixTimestampToIso8601(c: Column): Column =
    date_format(
      timestamp_millis(round(c.cast(DoubleType) * 1000).cast("long")),
      "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
}
