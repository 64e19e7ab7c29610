package graft
import org.apache.spark.sql.SparkSession

/** Scratch plan/perf probe (not part of the driver contract): verifies the
  * candDocs semi join still goes broadcast AT RUNTIME via AQE now that the
  * static hint is gone (the hint was a scale hazard: candDocs grows with
  * the corpus dup rate).
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val pairs = operators.Dedup.nearDupPairs(docs, 0.5, materializeCandidates = true)
    time("d3 noop") {
      pairs.write.format("noop").mode("overwrite").save()
    }
    val finalPlan = pairs.queryExecution.executedPlan.toString
    val semiLines = finalPlan.linesIterator
      .filter(l => l.contains("Join LeftSemi") || l.contains("BroadcastHashJoin"))
      .mkString("\n")
    println("[probe] semi-join operators in FINAL adaptive plan:\n" + semiLines)
    spark.stop()
  }
}
