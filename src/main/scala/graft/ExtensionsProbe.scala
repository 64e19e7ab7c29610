package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: prove the production registration path — a session built
  * with `spark.sql.extensions=graft.GraftExtensions` can call the custom
  * functions from plain SQL with NO runtime registerAll.
  */
object ExtensionsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = spark.sql(
      """SELECT simhash64(split('a b c', ' ')) AS sh,
        |       cosine_similarity(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS cs,
        |       minhash_tokens(split('x y z w', ' '), 8) AS mht""".stripMargin)
      .collect().head
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(r.getSeq[Long](2).length == 8)
    println(s"[extensions-probe] OK sh=${r.getLong(0)} cs=${r.getDouble(1)}")
    spark.stop()
  }
}
