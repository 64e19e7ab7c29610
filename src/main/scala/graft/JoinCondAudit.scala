package graft
import org.apache.spark.sql.SparkSession

/** The single source of truth for the §R10.12 expensive-kernel sweep,
  * shared by [[JoinCondAudit]] (dev probe) and `PlanHygieneSpec` (the CI
  * gate) so the two lists can never drift (they had, r10: `zip_with(`
  * vs `zip_with`).
  */
object PlanKernels {
  /** Kernels that scan a whole array/string payload per call; cheap
    * integer/comparison ops are deliberately absent.
    */
  val expensive: Seq[String] = Seq(
    "long_dot", "long_sqdist", "ann_plane_dots", "ann_cos_verify",
    "cosine_similarity", "dot_product", "levenshtein", "array_intersect",
    "array_union", "aggregate", "zip_with", "minhash", "minhash_tokens",
    "simhash64", "repetition_counts")

  /** Call-sites of `kernel` in one plan line: occurrences of `kernel(`
    * whose preceding char is not an identifier char — so `minhash(`
    * does not count inside `minhash_tokens(`, and a bare substring hit
    * (`aggregate` inside `partial_aggregate`) does not count at all.
    */
  def callCount(line: String, kernel: String): Int = {
    val needle = kernel + "("
    var c = 0
    var i = line.indexOf(needle)
    while (i >= 0) {
      val boundary = i == 0 || {
        val ch = line.charAt(i - 1)
        !(Character.isLetterOrDigit(ch) || ch == '_')
      }
      if (boundary) c += 1
      i = line.indexOf(needle, i + 1)
    }
    c
  }

  /** Join-condition / filter lines where any expensive kernel appears as
    * ≥2 call sites — the alias-inlining shape: a filter over an
    * expensive projected column is substituted per occurrence into the
    * pushed join condition, and join-condition codegen has no
    * subexpression elimination (the pre-fix s17 paid THREE 64-element
    * dots per candidate this way).
    */
  def repeatedKernelLines(plan: String): Seq[String] =
    plan.linesIterator.filter { l =>
      val t = l.trim
      (t.contains("Join condition:") || t.contains("Filter ")) &&
        expensive.exists(k => callCount(t, k) >= 2)
    }.map(_.trim).toSeq
}

/** Dev-only sweep for the SURVEY §R10.12 lesson: a filter over an
  * expensive projected column gets alias-inlined PER OCCURRENCE into the
  * pushed join condition, and join-condition codegen has no
  * subexpression elimination — so a kernel appearing N times in one
  * "Join condition:" line runs N times per candidate row. Scans every
  * registered query's formatted plan and prints any join condition (or
  * post-join Filter) where an expensive kernel repeats. Exits nonzero
  * when anything is flagged OR any query fails to plan, so the probe can
  * gate a sweep directly.
  */
object JoinCondAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    var flagged = 0
    var planErrors = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString()
        val suspects = PlanKernels.repeatedKernelLines(plan)
        if (suspects.nonEmpty) {
          flagged += 1
          println(s"[audit] $name:")
          suspects.foreach(l => println(s"  ${l.take(300)}"))
        }
      } catch {
        case e: Throwable =>
          planErrors += 1
          val msg = Option(e.getMessage).getOrElse("")
            .linesIterator.take(1).mkString.take(200)
          println(s"[audit] $name PLAN-ERROR ${e.getClass.getSimpleName}: $msg")
      }
    }
    println(s"[audit] done: $flagged flagged, $planErrors plan errors " +
      s"of ${SparkEntry.queries.size}")
    spark.stop()
    if (flagged > 0 || planErrors > 0) sys.exit(1)
  }
}
