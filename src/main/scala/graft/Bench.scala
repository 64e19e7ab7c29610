package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: every registered query against SPARK_GRAFT_SF_DIR,
  * one JSON metric line on stdout AND in ./bench_result.json (the file is
  * the robust channel — stdout is wrapped in sbt log noise).
  *
  * Queries are evaluated through the `noop` sink, which consumes every
  * output row/column without writing: `.count()` would let Catalyst prune
  * all columns of projection-only queries and time a bare scan+count
  * instead of the expressions under test.
  *
  * Failures are NOT swallowed into timings: a failed query records its
  * exception class in `errors` and bumps `n_errors`, so a broken query can
  * never lower total time unnoticed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (context init, codegen compiler, shuffle system)
    // so fixed JVM startup cost isn't attributed to the first query.
    spark.range(1000000).selectExpr("sum(id)").collect()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable => Some(e.getClass.getName) }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    // Centisecond precision keeps the whole line under the driver's stdout
    // tail window (~2000 chars) with headroom for the 81-query set —
    // full-precision floats overflowed it ("parsed": null, rounds 1-4) and
    // %.3f crossed 2000 bytes again at 81 queries. Run-to-run noise is
    // ±1 s, so 10 ms resolution loses nothing. %f never emits exponents.
    def sec3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + sec3(v) }
      .mkString("{", ",", "}")
    // errors object only when non-empty, sf as basename: every byte
    // counts against the ~2000-byte tail window at 83+ queries
    val nErr = results.count(_._3.isDefined)
    val errs =
      if (nErr == 0) ""
      else results.collect { case (k, _, Some(e)) => "\"" + k + "\":\"" + e + "\"" }
        .mkString(""""errors":{""", ",", "},")
    val total = results.map(_._2).sum
    val sfName = Paths.get(sfDir).getFileName.toString
    val line =
      s"""{"metric":"total","value":${sec3(total)},"unit":"sec","queries":$qs,$errs"n_errors":$nErr,"sf":"$sfName"}"""
    println(line)
    Files.writeString(Paths.get("bench_result.json"), line + "\n")
    spark.stop()
  }
}
