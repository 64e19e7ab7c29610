package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Dev-only micro-profiler for hot registered queries (not part of the
  * driver contract; run with `runMain graft.PerfProbe`).
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, sfDir)
    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"PERF $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("scan_text")(docs.select(col("doc_id"), length(col("text")).as("l")))
    time("tokens_size")(docs.select(col("doc_id"), size(tokens(col("text"))).as("n")))
    time("shingles_size")(docs.select(col("doc_id"), size(shingles3(col("text"))).as("n")))
    time("md5_text")(docs.select(col("doc_id"), md5(col("text")).as("m")))
    time("shingle_md5_min")(docs.select(col("doc_id"),
      minShingleFingerprint(col("text")).as("m")))
    time("t3_full")(operators.TextOps.fingerprints(docs))
    spark.stop()
  }
}
