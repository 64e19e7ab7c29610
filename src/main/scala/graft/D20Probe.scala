package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: d20 pigeonhole candidate volume at a given sfDir. */
object D20Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)
    val t0 = System.nanoTime()
    val n = graft.operators.Dedup.editDistancePrune(docs, 4, 32)._2.count()
    println(f"[d20probe] candidates=$n in ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
