package graft
import org.apache.spark.sql.SparkSession

/** Scratch perf probe (not part of the driver contract): times the
  * comma-separated SPARK_GRAFT_QUERIES twice each (cold then warm).
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    // Extra conf for A/B experiments: SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').map(_.trim)
      .filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "g1_pagerank")
      .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    names.filterNot(SparkEntry.queries.contains) match {
      case Seq() =>
      case bad => sys.error(s"unknown queries: ${bad.mkString(", ")}")
    }
    for (n <- names; pass <- Seq("cold", "warm"))
      time(s"$n $pass")(
        SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
