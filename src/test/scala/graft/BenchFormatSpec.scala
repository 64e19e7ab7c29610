package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Bench stdout-line degradation contract (pure string logic — no
  * Spark session needed). Round 7's driver artifact degraded all the way to
  * `"queries":{}` because a 23-entry error blob was kept at full fidelity
  * while every timing was evicted; the contract now is: precision degrades
  * first, then error DETAILS (count + first-5 names survive), and the top-10
  * slowest per-query timings are never sacrificed.
  */
class BenchFormatSpec extends AnyFunSuite {

  private def synthetic(nOk: Int, nErr: Int): Seq[(String, Double, Option[String])] = {
    val ok = (1 to nOk).map(i => (f"q$i%03d_some_longish_query_name", i * 0.37, None))
    val bad = (1 to nErr).map(i =>
      (f"e$i%03d_failing_query_name", 0.01,
       Some("org.apache.spark.sql.catalyst.ExtendedAnalysisException")))
    ok ++ bad
  }

  test("many-errors run keeps the top-10 slowest timings within budget") {
    val results = synthetic(nOk = 119, nErr = 23) // the round-7 shape
    val line = Bench.formatLine(results, "sf0.1", budget = 1900)
    assert(line.length <= 1900)
    // Top-10 slowest are the highest-numbered ok queries; all must be present.
    (110 to 119).foreach { i =>
      assert(line.contains(f"q$i%03d_some_longish_query_name"), s"missing slow query q$i")
    }
    assert(!line.contains("\"queries\":{}"), "timings must never be fully evicted")
    assert(line.contains("\"n_errors\":23"))
  }

  test("degraded error blob is a bounded sample, not the full map") {
    val results = synthetic(nOk = 119, nErr = 23)
    val line = Bench.formatLine(results, "sf0.1", budget = 1900)
    // With 23 errors the full class-name map cannot fit alongside timings;
    // the sample form lists names only, capped at 5.
    if (line.contains("error_sample")) {
      val sample = line.substring(line.indexOf("error_sample"))
      val names = "e\\d{3}_failing_query_name".r.findAllIn(sample).size
      assert(names <= 5, s"error sample should cap at 5 names, saw $names")
    }
    assert(line.contains("\"n_errors\":23"), "error count must always survive")
  }

  test("clean small run emits everything at full precision") {
    val results = synthetic(nOk = 20, nErr = 0)
    val line = Bench.formatLine(results, "sf0.01", budget = 1900)
    assert(line.length <= 1900)
    (1 to 20).foreach(i => assert(line.contains(f"q$i%03d_some_longish_query_name")))
    assert(!line.contains("q_omitted"))
    assert(!line.contains("\"errors\":{") && !line.contains("error_sample"))
    assert(line.contains("\"n_errors\":0"))
  }

  test("headline total is the single-pass sum even when per-query is best-of-2") {
    // Best-of-2 retiming shrinks per-query values; the driver-facing
    // "value" must stay the single-pass sum for round comparability.
    val results = synthetic(nOk = 5, nErr = 0) // best-of sum = 0.37*15 = 5.55
    val single = 9.99
    val line = Bench.formatLine(results, "sf0.1", budget = 1900, Some(single))
    assert(line.contains("\"value\":9.99"), line)
    val full = Bench.fullLine(results, "sf0.1", Some(single))
    assert(full.contains("\"value\":9.99"), full)
    // Without an override the sum of the per-query values is used.
    assert(Bench.formatLine(results, "sf0.1", budget = 1900)
      .contains("\"value\":5.55"))
  }

  test("full line retains every query and every error detail") {
    val results = synthetic(nOk = 119, nErr = 23)
    val full = Bench.fullLine(results, "sf0.1")
    (1 to 119).foreach(i => assert(full.contains(f"q$i%03d_some_longish_query_name")))
    (1 to 23).foreach(i => assert(full.contains(f"e$i%03d_failing_query_name")))
    assert(full.contains("ExtendedAnalysisException"))
  }
}
