package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: headline queries on SPARK_GRAFT_SF_DIR, one
  * JSON result line. Each query is forced through the `noop` sink so
  * every output column is actually computed (a bare `count()` would let
  * the optimizer prune the projections being measured). One warm-up run
  * of the first query pays JVM/codegen warm-up outside the timings. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      try df.write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.benchQueries.filter(SparkEntry.queries.contains)
    if (names.nonEmpty) run(names.head) // warm-up, untimed
    val results = names.map(n => n -> run(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
