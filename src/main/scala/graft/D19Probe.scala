package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch (r11 verdict ask 4): stage-level breakdown of
  * d19_containment's cost at a given sfDir. Mirrors
  * [[graft.operators.Dedup.containmentJoin]] stage by stage (4/5
  * threshold, materialize=true) and times each materialization
  * separately so the expensive stage is a measurement, not a guess:
  *   1. shingle explode + df aggregate + per-doc ordered regroup
  *      (the linear corpus-token part, ends in the localCheckpoint)
  *   2. prefix/full posexplode row volumes
  *   3. candidate equi-join + distinct (the suspected cost)
  *   4. verify: attach both shingle arrays, array_intersect, filter
  */
object D19Probe {
  def main(args: Array[String]): Unit = {
    import graft.functions.TextFunctions._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[d19probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup
    val (num, den) = (4L, 5L)
    val documents = Tables.documents(spark, dir)

    val tok = documents
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(array_distinct(shingles3Tokens(col("toks"), col("text")))).as("shingle"))
    val dfreq = tok.groupBy("shingle").agg(count(lit(1)).as("df"))
    val docsArr0 = tok.join(dfreq, "shingle")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("shingle")))).as("ord"),
        count(lit(1)).as("n"))
      .select(col("doc_id"), col("n"), col("ord"),
        expr("transform(ord, x -> x.shingle)").as("sh"))
      .withColumn("p", col("n") - expr(s"($num * n + ${den - 1}) div $den") + 1)
    val docsArr = time("1. docsArr (shingle+df+regroup, checkpoint)") {
      docsArr0.localCheckpoint(true)
    }

    val prefixes = docsArr
      .selectExpr("doc_id", "n",
        "posexplode(slice(ord, 1, CAST(p AS INT))) AS (pos, o)")
      .where("o.df >= 2")
      .selectExpr("doc_id", "n", "pos", "o.shingle AS shingle")
    val full = docsArr
      .selectExpr("doc_id", "n", "posexplode(ord) AS (pos, o)")
      .where("o.df >= 2")
      .selectExpr("doc_id", "n", "pos", "o.shingle AS shingle")
    val nPrefix = time("2a. prefix rows")(prefixes.count())
    val nFull = time("2b. full rows")(full.count())
    println(s"[d19probe] prefix rows=$nPrefix full rows=$nFull")

    // 3a: raw join output volume (pre-distinct), measured via count only
    val joined = prefixes.as("a").join(full.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") =!= col("b.doc_id") &&
          col("b.n") * den >= col("a.n") * num &&
          least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) * den >=
            col("a.n") * num)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
    val nJoined = time("3a. candidate join rows (pre-distinct)")(joined.count())
    val cand = joined.distinct()
    val candCk = time("3b. candidates distinct (checkpoint)")(cand.localCheckpoint(true))
    val nCand = candCk.count()
    println(s"[d19probe] join rows=$nJoined distinct candidates=$nCand")

    val verified = candCk
      .join(docsArr.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(docsArr.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("n_inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .filter(col("n_inter") * den >= col("na") * num)
    val nOut = time("4. verify (attach arrays + intersect + filter)")(verified.count())
    println(s"[d19probe] output pairs=$nOut")

    // end-to-end reference number for the same session
    time("5. end-to-end containmentJoin (count)") {
      graft.operators.Dedup.containmentJoin(documents, 4, 5, materialize = true).count()
    }
    spark.stop()
  }
}
