package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpecBase

/** Proves the bucketed-layout contract: a join of two tables bucketed
  * on the same key/count, and a groupBy on the bucket key, both run
  * with ZERO shuffle exchanges — the write-time shuffle is the only
  * one ever paid. */
class BucketingSpec extends SparkSpecBase with Matchers {
  import spark.implicits._

  /** Broadcast would hide the exchange question entirely on these tiny
    * frames — disable it so the join must prove bucket co-location. */
  private def withoutBroadcast[T](f: => T): T = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val olds = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "-1"))
    try f
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def dropTables(names: String*): Unit =
    names.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("join of co-bucketed tables plans no shuffle exchange") {
    withoutBroadcast {
      try {
        val orders = (1L to 1000L).map(i => (i % 100, i, i * 2.0))
          .toDF("custkey", "orderkey", "price")
        val custs = (0L until 100L).map(i => (i, s"cust_$i"))
          .toDF("custkey", "name")
        Bucketing.writeBucketed(orders, "bkt_orders", 8, Seq("custkey"))
        Bucketing.writeBucketed(custs, "bkt_custs", 8, Seq("custkey"))

        val joined = Bucketing.readBucketed(spark, "bkt_orders")
          .join(Bucketing.readBucketed(spark, "bkt_custs"), "custkey")
        joined.collect().length shouldBe 1000
        val plan = joined.queryExecution.executedPlan.toString
        plan should include("SortMergeJoin")
        plan should not include "Exchange hashpartitioning"
        // the unbucketed phrasing of the same join DOES shuffle
        val plain = orders.join(custs, "custkey")
        plain.collect()
        plain.queryExecution.executedPlan.toString should
          include("Exchange hashpartitioning")
      } finally dropTables("bkt_orders", "bkt_custs")
    }
  }

  test("groupBy on the bucket key aggregates without an exchange") {
    try {
      val orders = (1L to 1000L).map(i => (i % 100, i * 2.0))
        .toDF("custkey", "price")
      Bucketing.writeBucketed(orders, "bkt_orders_agg", 8, Seq("custkey"))
      val agg = Bucketing.readBucketed(spark, "bkt_orders_agg")
        .groupBy("custkey").agg(sum("price").as("rev"))
      agg.collect().length shouldBe 100
      agg.queryExecution.executedPlan.toString should
        not include "Exchange hashpartitioning"
    } finally dropTables("bkt_orders_agg")
  }

  test("bucketed results equal the unbucketed ones") {
    try {
      val df = (1L to 500L).map(i => (i % 37, i)).toDF("k", "v")
      Bucketing.writeBucketed(df, "bkt_eq", 4, Seq("k"))
      val got = Bucketing.readBucketed(spark, "bkt_eq")
        .groupBy("k").agg(sum("v").as("s"))
        .orderBy("k").as[(Long, Long)].collect()
      val want = df.groupBy("k").agg(sum("v").as("s"))
        .orderBy("k").as[(Long, Long)].collect()
      got shouldBe want
    } finally dropTables("bkt_eq")
  }
}
