package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, Similarity}

/** IVF ANN index: centroid training determinism, inverted-list layout,
  * partition-pruned probes, recall vs exact brute force.
  */
class IvfIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def plantedVectors = {
    val rnd = new scala.util.Random(7)
    def unit(): Array[Float] = {
      val v = Array.fill(64)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    val a = unit()
    val aNear = a.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.02f else x }
    val rows = (a +: aNear +: Array.fill(48)(unit())).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
    rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("index build writes one parquet partition per inverted list + centroids sidecar") {
    val dir = tmpDir("ivf")
    val cents = IvfIndex.writeIndex(plantedVectors, dir, k = 8)
    assert(cents.length === 8)
    val lists = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("list_id="))
    assert(lists > 2, s"vectors must spread over lists, got $lists")
    // sidecar round-trips and is invisible to the data read
    val loaded = IvfIndex.loadCentroids(spark, dir)
    assert(loaded.map(_.toSeq).toSeq === cents.map(_.toSeq).toSeq)
    assert(spark.read.parquet(dir).count() === 50)
  }

  test("query probes a strict subset of lists (partition pruning) and finds the planted near-dup") {
    val dir = tmpDir("ivf2")
    val cents = IvfIndex.writeIndex(plantedVectors, dir, k = 8)
    val q = plantedVectors.filter(col("vec_id") === 0L)
      .collect().head.getSeq[Float](1).toArray
    val got = IvfIndex.queryIndex(spark, dir, q, cents, k = 3, nprobe = 2)
    assert(got.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    val ids = got.collect().map(_.getLong(0)).toSeq
    assert(ids.head === 0L, "the query vector itself must rank first")
    assert(ids.contains(1L), s"planted near-identical vector must be probed: $ids")
  }

  test("probing every list reproduces the exact brute-force top-k") {
    val dir = tmpDir("ivf3")
    val cents = IvfIndex.writeIndex(plantedVectors, dir, k = 8)
    val q = plantedVectors.filter(col("vec_id") === 0L)
      .collect().head.getSeq[Float](1).toArray
    val viaIndex = IvfIndex.queryIndex(spark, dir, q, cents, k = 6, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      .filter(_._1 != 0L) // brute force excludes the query vector
    val exact = Similarity.bruteForceTopK(plantedVectors, 0L, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaIndex === exact)
  }
}
