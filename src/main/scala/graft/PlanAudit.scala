package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: dump the physical plan of selected registered queries so the
  * shapes can be audited between rounds (shuffle count, pushed filters,
  * codegen spans). Not part of the driver contract.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("dq1_profile", "u4_union_missing", "w_gap_fill",
        "t12_doc_keywords", "t13_phrase_search", "e2_scd2_merge")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      println(s"\n===== $n =====")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Scan") ||
          l.contains("Filter") || l.contains("HashAggregate") ||
          l.contains("Window") || l.contains("Join") || l.contains("Expand"))
        .map(_.take(160)).mkString("\n"))
    }
    spark.stop()
  }
}
