package graft
import org.apache.spark.sql.SparkSession

/** Dev-only sweep for the SURVEY §R10.12 lesson: a filter over an
  * expensive projected column gets alias-inlined PER OCCURRENCE into the
  * pushed join condition, and join-condition codegen has no
  * subexpression elimination — so a kernel appearing N times in one
  * "Join condition:" line runs N times per candidate row. Scans every
  * registered query's formatted plan and prints any join condition (or
  * post-join Filter) where an expensive kernel repeats.
  *
  * Expensive = array/string kernels that scan whole payloads per call;
  * cheap integer/comparison ops are ignored.
  */
object JoinCondAudit {
  private val kernels = Seq(
    "long_dot", "long_sqdist", "ann_plane_dots", "cosine_similarity",
    "dot_product", "levenshtein", "array_intersect", "array_union",
    "aggregate(", "zip_with", "minhash", "simhash64", "repetition_counts")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString()
        val suspects = plan.linesIterator.filter { l =>
          val t = l.trim
          (t.contains("Join condition:") || t.startsWith("+- Filter") ||
            t.startsWith(":- Filter") || t.startsWith("Filter")) &&
            kernels.exists(k => {
              var c = 0; var i = t.indexOf(k)
              while (i >= 0) { c += 1; i = t.indexOf(k, i + 1) }
              c >= 2
            })
        }.toSeq
        if (suspects.nonEmpty) {
          flagged += 1
          println(s"[audit] $name:")
          suspects.foreach(l => println(s"  ${l.trim.take(300)}"))
        }
      } catch {
        case e: Throwable =>
          println(s"[audit] $name PLAN-ERROR ${e.getClass.getSimpleName}")
      }
    }
    println(s"[audit] done: $flagged flagged of ${SparkEntry.queries.size}")
    spark.stop()
  }
}
