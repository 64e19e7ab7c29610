package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: print the a17 KMV estimates next to exact counts so the
  * contract bounds' safety margins are visible (not just the booleans).
  * Usage: runMain graft.KmvProbe [sfDir]
  */
object KmvProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val k = 1024
    val kmv = udaf(new graft.functions.KmvSketchAgg(k))
    val base = Tables.events(spark, sfDir).filter(col("user_id").isNotNull)
    val perType = base.groupBy("event_type")
      .agg(kmv(xxhash64(col("user_id"))).as("sk"),
        countDistinct(col("user_id")).as("n_exact"))
    def est(c: String) = when(size(col(c)) < k, size(col(c)).cast("double"))
      .otherwise(lit((k - 1).toDouble * math.pow(2.0, 64)) /
        (element_at(col(c), k).cast("double") + lit(math.pow(2.0, 63))))
    perType.select(col("event_type"), col("n_exact"),
      round(est("sk"), 1).as("est"),
      round(abs(est("sk") - col("n_exact")) / col("n_exact") * 100, 2)
        .as("rel_err_pct"))
      .orderBy("event_type").show(50, truncate = false)
    val d = base.select(col("event_type"), col("user_id")).distinct()
    val inter = d.as("x").join(d.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("et_a"), col("y.event_type").as("et_b"))
      .agg(countDistinct(col("x.user_id")).as("n_inter_exact"))
    val a = perType.select(col("event_type").as("et_a"), col("sk").as("sk_a"),
      col("n_exact").as("n_a"))
    val b = perType.select(col("event_type").as("et_b"), col("sk").as("sk_b"),
      col("n_exact").as("n_b"))
    inter.join(broadcast(a), Seq("et_a")).join(broadcast(b), Seq("et_b"))
      .withColumn("sk_u",
        slice(array_sort(array_union(col("sk_a"), col("sk_b"))), 1, k))
      .withColumn("n_union_exact", col("n_a") + col("n_b") - col("n_inter_exact"))
      .withColumn("est_u", est("sk_u"))
      .withColumn("n_common", size(array_intersect(col("sk_u"),
        array_intersect(col("sk_a"), col("sk_b")))).cast("double"))
      .withColumn("est_i", col("n_common") / size(col("sk_u")) * col("est_u"))
      .select(col("et_a"), col("et_b"), col("n_union_exact"),
        round(col("est_u"), 1).as("est_u"),
        round(abs(col("est_u") - col("n_union_exact")) /
          col("n_union_exact") * 100, 2).as("u_err_pct"),
        col("n_inter_exact"), round(col("est_i"), 1).as("est_i"),
        round(abs(col("est_i") - col("n_inter_exact")) /
          col("n_union_exact") * 100, 2).as("i_err_pct_of_union"))
      .orderBy("et_a", "et_b").show(50, truncate = false)
    spark.stop()
  }
}
