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
         (m, kSub, sl) <- Seq((8, 16, 64), (8, 16, 100), (16, 16, 64),
           (16, 16, 100), (8, 64, 100))) {
      val r = graft.operators.IvfIndex.pqProbeRecall(
        Tables.embeddings(spark, dir), 0L until 16L, m, kSub, 10, sl)
      println(s"[pq] $dir m=$m kSub=$kSub shortlist=$sl recall=$r")
    }
    spark.stop()
  }
}
