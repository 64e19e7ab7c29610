package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    val sigs = time("signatures")(operators.Dedup.minhashSignatures(docs, 32).cache())
    time("signatures count")(sigs.count())
    val buckets = operators.Dedup.lshBuckets(sigs, 8, 4)
    val cand = time("candidates")(operators.Dedup.candidatePairs(buckets).cache())
    println("[probe] n_candidates: " + time("cand count")(cand.count()))
    time("full nearDupPairs")(println("[probe] pairs: " + operators.Dedup.nearDupPairs(docs, 0.5).count()))
    spark.stop()
  }
}
