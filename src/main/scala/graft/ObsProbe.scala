package graft
import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe (dev-only): does Observation fire on localCheckpoint? */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val obs = Observation("p")
    val df = spark.range(100000).toDF("src")
      .withColumn("dst", col("src") + 1)
      .observe(obs, count(lit(1)).as("n"), sum("src").as("ssrc"))
      .localCheckpoint(true)
    println(s"[obs] rows=${df.count()}")
    val t0 = System.nanoTime()
    val m = obs.getAsJava
    println(f"[obs] got metrics in ${(System.nanoTime() - t0) / 1e9}%.3f s: $m")
    spark.stop()
  }
}
