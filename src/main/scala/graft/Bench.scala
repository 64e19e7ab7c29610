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
      .config("spark.sql.extensions", "graft.GraftExtensions")
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
    // The consumer captures only the LAST ~2000 bytes of stdout and JSON-
    // parses them: a line longer than the window gets its head cut off and
    // parses as nothing (observed "parsed": null, rounds 1-4). Full fidelity
    // always goes to ./bench_result.json; the stdout line degrades
    // deterministically until it fits — first centisecond precision, then
    // decisecond, then a map of only the slowest queries (the performance-
    // relevant ones) with a "q_omitted" count so truncation is explicit.
    def fmt(v: Double, p: String): String =
      String.format(java.util.Locale.ROOT, p, Double.box(v))
    val nErr = results.count(_._3.isDefined)
    val errs =
      if (nErr == 0) ""
      else results.collect { case (k, _, Some(e)) => "\"" + k + "\":\"" + e + "\"" }
        .mkString(""""errors":{""", ",", "},")
    val total = results.map(_._2).sum
    val sfName = Paths.get(sfDir).getFileName.toString
    def line(prec: String, keep: Int): String = {
      val bySlow = results.sortBy(-_._2).take(keep).sortBy(_._1)
      val qs = bySlow.map { case (k, v, _) => "\"" + k + "\":" + fmt(v, prec) }
        .mkString("{", ",", "}")
      val omitted =
        if (keep >= results.size) "" else s""""q_omitted":${results.size - keep},"""
      s"""{"metric":"total","value":${fmt(total, "%.2f")},"unit":"sec","queries":$qs,$omitted$errs"n_errors":$nErr,"sf":"$sfName"}"""
    }
    val budget = 1900 // window is 2000; leave room for the newline + stray output
    val full = line("%.2f", results.size)
    val candidates =
      Iterator(full, line("%.1f", results.size)) ++
        Iterator.iterate(results.size - 5)(_ - 5).takeWhile(_ > 0).map(line("%.1f", _))
    println(candidates.find(_.length <= budget).getOrElse(line("%.1f", 0)))
    Files.writeString(Paths.get("bench_result.json"), full + "\n")
    spark.stop()
  }
}
