package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement tool (guide §1): run named queries
  * through the noop sink and report, per query, WHERE the wall time
  * goes — number of driver-synchronous jobs, stages, tasks, and the
  * summed executor task time. At bench scale (sf0.1, hundreds of
  * thousands of rows) a query whose wall time far exceeds its summed
  * task time divided by parallelism is bound by JOB COUNT (sequential
  * driver loops, eager pins, collect-backed training iterations) and
  * per-job scheduling/codegen latency, not by data — the signature
  * that decides which guide section applies. One JSON line per query. */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryProfile <sfDir> <query ...>")
    val sfDir = args.head
    val names = args.tail.toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null)
          taskMs.addAndGet(t.taskInfo.duration)
      }
    })

    // Generic warm-up outside the measured set (Bench's convention)
    try spark.read.parquet(s"$sfDir/events.parquet").count()
    catch { case _: Throwable => () }

    // JSON-safe interpolation: strip quote/backslash/control chars and
    // guard a null getMessage — an unescaped newline or quote in an
    // error (or a hostile query name) breaks the per-query JSON line
    def jsonSafe(s: String): String =
      String.valueOf(s).replaceAll("[\"\\\\\\n\\r\\t]", " ").take(120)
    for (n <- names) {
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0L)
      spark.sparkContext.setJobDescription(n)
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val wallSec = (System.nanoTime() - t0) / 1e9
        // give straggler listener events a beat to drain
        Thread.sleep(200)
        println(f"""{"query":"${jsonSafe(n)}","wall_sec":$wallSec%.3f,""" +
          s""""jobs":${jobs.get},"stages":${stages.get},""" +
          s""""tasks":${tasks.get},"task_time_sec":${taskMs.get / 1000.0}}""")
      } catch { case e: Throwable =>
        println(s"""{"query":"${jsonSafe(n)}","error":"${jsonSafe(e.getMessage)}"}""")
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
