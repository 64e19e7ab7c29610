package graft
import org.apache.spark.sql.SparkSession

/** Scratch probe (dev-only): actual ADC recall of pqContract variants. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1");
         (kd, sl) <- Seq((16, 100), (32, 64), (32, 100), (48, 64))) {
      val r = graft.operators.IvfIndex.truncProbeRecall(
        Tables.embeddings(spark, dir), 0L until 16L, kd, 10, sl)
      println(s"[trunc] $dir keepDims=$kd shortlist=$sl recall=$r")
    }
    spark.stop()
  }
}
