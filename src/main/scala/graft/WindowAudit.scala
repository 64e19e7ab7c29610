package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec

/** Dev-only: enumerate every registered query whose physical plan contains
  * a partition-less Window (the single-reducer sort shape at scale), with
  * the window's direct input node — the evidence the PlanHygieneSpec
  * whitelist is built from. Not part of the driver contract.
  */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.sparkPlan
      val globals = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      if (globals.nonEmpty)
        println(s"GLOBALWIN $name ${globals.size}")
    }
    spark.stop()
  }
}
