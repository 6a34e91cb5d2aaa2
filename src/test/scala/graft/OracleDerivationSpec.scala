package graft

import org.scalatest.matchers.should.Matchers

/** The iterative graph oracles (q_kcore / q_ktruss / q_sssp /
  * q_coreness) derive their unroll depth from the OBSERVED round
  * schedule of the Spark run in this JVM (Verify dumps oracleSql after
  * running every query), with the sf0.01 pin only as a fallback and an
  * in-SQL error() convergence assertion either way — an under-sized
  * unroll fails loudly and self-diagnosably in DuckDB (verified by
  * hand-running a 3-round kcoreSql: 'unroll depth under-sized' raises)
  * instead of surfacing as a bare parity mismatch. This spec pins the
  * derivation: run the query, then check the generated SQL's depth
  * equals the recorded schedule + 1 and carries the loud assert. */
class OracleDerivationSpec extends SparkSpecBase with Matchers {

  private def unrollDepth(sql: String, prefix: String): Int =
    s"\\b$prefix(\\d+)\\b".r.findAllMatchIn(sql).map(_.group(1).toInt).max

  test("q_kcore oracle unrolls to the observed round count + 1 and " +
      "asserts convergence in-SQL") {
    SparkEntry.queries("q_kcore")(spark, sf("sf0.001")).collect()
    val sql = SparkEntry.oracleSql("q_kcore")
    sql should include("unroll depth under-sized")
    unrollDepth(sql, "e") shouldBe SparkEntry.Observed.kcore.get.last + 1
  }

  test("q_sssp oracle unrolls to the observed improving rounds + 1 " +
      "and asserts the last round changed nothing") {
    SparkEntry.queries("q_sssp")(spark, sf("sf0.001")).collect()
    val sql = SparkEntry.oracleSql("q_sssp")
    sql should include("still improved distances")
    unrollDepth(sql, "d") shouldBe SparkEntry.Observed.sssp.get.last + 1
  }

  test("q_ktruss oracle unrolls to the observed rounds + 1 and " +
      "asserts convergence") {
    SparkEntry.queries("q_ktruss")(spark, sf("sf0.001")).collect()
    val sql = SparkEntry.oracleSql("q_ktruss")
    sql should include("unroll depth under-sized")
    unrollDepth(sql, "e") shouldBe SparkEntry.Observed.ktruss.get.last + 1
  }

  test("q_curate_coreness oracle derives its embedded coreness replay " +
      "from its OWN recorder") {
    SparkEntry.queries("q_curate_coreness")(spark, sf("sf0.001")).collect()
    val sql = SparkEntry.oracleSql("q_curate_coreness")
    sql should include("phase/round budgets under-sized")
    "th(\\d+) AS".r.findAllMatchIn(sql).size shouldBe
      SparkEntry.Observed.corenessGatePhases.get.size
  }

  test("q_coreness oracle derives one budget per OBSERVED phase " +
      "(observed removals + 1 each) and keeps the convergence error") {
    SparkEntry.queries("q_coreness")(spark, sf("sf0.001")).collect()
    val sql = SparkEntry.oracleSql("q_coreness")
    sql should include("phase/round budgets under-sized")
    val phases = "th(\\d+) AS".r.findAllMatchIn(sql).size
    phases shouldBe SparkEntry.Observed.corenessPhases.get.size
    // each phase's rm CTE count = observed removals + 1
    val rmPerPhase = "rm(\\d+)_(\\d+) AS".r.findAllMatchIn(sql)
      .map(_.group(1).toInt).toSeq.groupBy(identity).view
      .mapValues(_.size).toMap
    SparkEntry.Observed.corenessPhases.get.zipWithIndex.foreach {
      case (obs, p) => rmPerPhase(p) shouldBe obs + 1
    }
  }
}
