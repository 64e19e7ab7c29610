package graft
import org.apache.spark.sql.SparkSession

/** Dev scratch: execute queries and print the FINAL adaptive physical
  * plan (isFinalPlan=true) — the shape AQE actually ran, which is where
  * exchange-removal opportunities show (the initial plan hides coalesced
  * reads, runtime broadcasts, and which exchanges survived).
  * SPARK_GRAFT_QUERIES comma list; SPARK_GRAFT_CONF extra confs.
  */
object FinalPlanProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').map(_.trim)
      .filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "a5_rollup")
      .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, dir)
      df.collect()
      println(s"===== $n (final) =====")
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
