package graft
import org.apache.spark.sql.SparkSession

/** Scratch single-query probe (not part of the driver contract):
  * `runMain graft.QueryProbe <name> [<name>...]` — show each result +
  * warm timing (second run on the same JVM). Fixture dir from
  * SPARK_GRAFT_SF_DIR (default sf0.01).
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[qprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (name <- args) {
      SparkEntry.queries(name)(spark, dir).show(50, truncate = false)
      // cold/warm both measure the FULL noop write (show() may evaluate
      // only enough partitions for its 50 rows — not comparable)
      time(s"$name cold") {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"$name warm") {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
