package graft

import org.apache.spark.sql.functions._
import graft.functions.KmvSketchAgg

/** KMV bottom-k sketch: exact-below-capacity, partition invariance, and
  * the union/intersection composition the a17 contract registers.
  */
class KmvSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("kmv below capacity is exhaustive: estimate and set ops are exact") {
    val kmv = udaf(new KmvSketchAgg(64))
    // groups A and B share users 10-19; A has 0-19, B has 10-29
    val rows = ((0L until 20L).map(("A", _)) ++ (10L until 30L).map(("B", _)))
    val df = rows.toDF("g", "u")
    val sk = df.groupBy("g").agg(kmv(xxhash64(col("u"))).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sk("A").length === 20 && sk("B").length === 20,
      "below capacity the sketch must keep every distinct hash")
    assert(sk("A") === sk("A").sorted, "sketch must be sorted")
    val union = (sk("A") ++ sk("B")).distinct.sorted
    assert(union.length === 30, "union of exhaustive sketches is exact")
    val inter = sk("A").toSet.intersect(sk("B").toSet)
    assert(inter.size === 10, "intersection of exhaustive sketches is exact")
  }

  test("kmv duplicates don't inflate the sketch; nulls are ignored") {
    val kmv = udaf(new KmvSketchAgg(64))
    val df = (0L until 10L).flatMap(u => Seq(u, u, u)).map(u => ("g", u))
      .toDF("g", "u")
      .union(Seq(("g", null.asInstanceOf[java.lang.Long])).toDF("g", "u"))
    val sk = df.groupBy("g")
      .agg(kmv(when(col("u").isNotNull, xxhash64(col("u")))).as("sk"))
      .collect()(0).getSeq[Long](1)
    assert(sk.length === 10, s"expected 10 distinct hashes, got ${sk.length}")
  }

  test("kmv sketch is partition-invariant (merge order can't change it)") {
    val kmv = udaf(new KmvSketchAgg(32))
    val df = (0L until 5000L).map(u => ("g", u)).toDF("g", "u")
    def sketch(parts: Int) = df.repartition(parts)
      .groupBy("g").agg(kmv(xxhash64(col("u"))).as("sk"))
      .collect()(0).getSeq[Long](1)
    assert(sketch(1) === sketch(8),
      "1-partition and 8-partition sketches must be identical")
  }

  test("kmv estimator engages past capacity and lands within its error band") {
    val k = 64
    val kmv = udaf(new KmvSketchAgg(k))
    val n = 5000L
    val df = (0L until n).map(u => ("g", u)).toDF("g", "u")
    val sk = df.groupBy("g").agg(kmv(xxhash64(col("u"))).as("sk"))
      .collect()(0).getSeq[Long](1)
    assert(sk.length === k, "past capacity the sketch holds exactly k values")
    val est = (k - 1).toDouble * math.pow(2.0, 64) /
      (sk(k - 1).toDouble + math.pow(2.0, 63))
    assert(est !== n.toDouble, "estimator must actually estimate, not count")
    // RSE = 1/sqrt(k-2) ~ 12.7%; 40% is > 3 sigma for this fixed seed
    assert(math.abs(est - n) <= 0.40 * n,
      s"estimate $est too far from $n for k=$k")
  }
}
