package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pay a dataset's shuffle ONCE at write time
  * and remember it in the catalog, so every later join or aggregation
  * on the bucket keys runs with NO exchange.
  *
  * This is the standing answer to "this pipeline joins the same two
  * 10 TB tables every day": `df.write.bucketBy(n, keys).saveAsTable`
  * hash-partitions rows into `n` buckets per partition directory, and
  * Spark's scan reports that layout as a `HashPartitioning` output, so
  * a join of two tables bucketed on the same keys with the same count
  * — or a groupBy on the bucket keys — satisfies its required
  * distribution straight off the scan (verified by BucketingSpec: the
  * executed plans contain zero shuffle exchanges, and `sortBy` lets
  * the sort-merge join skip its per-task sorts too when each bucket
  * holds one file).
  *
  * Sizing: pick `numBuckets` so one bucket of the LARGER table fits an
  * executor's task comfortably (~128-512 MB compressed); both sides
  * must use the same count for a shuffle-free join (Spark can
  * coalesce mismatched counts when one divides the other, at reduced
  * parallelism). The reference engine has no storage layer at all
  * (stateless Kafka transformer — SURVEY §2.3); this module is part
  * of the Spark-native scale surface.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
      keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "need at least one bucket key")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (scan reports the bucket layout). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
