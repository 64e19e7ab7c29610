package graft
import org.apache.spark.sql.SparkSession

/** Dev scratch: decompose the per-job / per-query driver constant.
  * Times, on a warm session: (a) bare 1-task collect jobs on a
  * checkpointed 1-row frame (job-submit floor), (b) noop saves of a
  * trivial no-shuffle query (planning + codegen + 1 job), (c) noop saves
  * of a 1-exchange groupBy (adds AQE stage + shuffle), (d) noop saves of
  * an orderBy (adds range-sample pass), each N times — first iteration
  * cold, rest warm.
  */
object OverheadProbe {
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
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()
    val one = Seq(1L).toDF("x").localCheckpoint(true)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = 20
    def bench(name: String)(f: Int => Unit): Unit = {
      val t = new Array[Double](n)
      for (i <- 0 until n) {
        val t0 = System.nanoTime(); f(i); t(i) = (System.nanoTime() - t0) / 1e9
      }
      val warm = t.drop(2).sorted
      println(f"[ovh] $name cold=${t(0)}%.3f warm_med=${warm(warm.length / 2)}%.3f " +
        f"warm_min=${warm(0)}%.3f")
    }
    bench("collect_1row")(_ => one.collect())
    bench("noop_project")(i =>
      one.selectExpr(s"x + $i as y").write.format("noop").mode("overwrite").save())
    bench("noop_groupby_same")(_ =>
      spark.range(1000).groupBy(($"id" % 10).as("k")).count()
        .write.format("noop").mode("overwrite").save())
    bench("noop_groupby_fresh")(i =>
      spark.range(1000).groupBy(($"id" % (10 + i)).as("k")).count()
        .write.format("noop").mode("overwrite").save())
    bench("noop_orderby_fresh")(i =>
      spark.range(1000).selectExpr(s"id + $i as v").orderBy("v")
        .write.format("noop").mode("overwrite").save())
    bench("parquet_scan_agg")(i =>
      Tables.orders(spark, dir).selectExpr(s"sum(o_totalprice + $i)")
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
