package graft

/** Whole-registry hygiene: every registered query must (a) ANALYZE AND
  * PLAN against the smallest fixture — the cheap net that would have
  * caught the round-7 fixture-type drift as one failing test instead of
  * 23 opaque downstream errors — and (b) never plan a cartesian
  * product (CartesianGuard turns the accidental ones into plan-time
  * errors; this pins that no query ships with a deliberate hint
  * either). Also pins the queries↔oracle registry consistency: a
  * typo'd oracle key would otherwise silently demote a query to the
  * weaker rows-only check.
  */
class PlanHygieneSpec extends SparkTestBase {

  test("oracle registry matches the query registry; every query is oracled") {
    // r9: the last 5 rows-only entries were retired (each has a hash-green
    // derandomized twin), so the gate is 100% oracle-checked — any new
    // un-oracled registry entry is now a test failure, not a weaker check.
    val orphanOracles = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphanOracles.isEmpty,
      s"oracle SQL with no matching query (typo?): $orphanOracles")
    val unchecked = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unchecked.isEmpty,
      s"queries without oracle SQL: $unchecked")
  }

  test("every registered query plans on sf0.001 with no cartesian product") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct"))
          failures += s"$name: plans a CartesianProduct"
      } catch {
        case e: Throwable =>
          failures += s"$name: ${e.getClass.getSimpleName} " +
            e.getMessage.linesIterator.take(1).mkString.take(200)
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
