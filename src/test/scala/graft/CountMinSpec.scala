package graft

import org.apache.spark.sql.functions._
import graft.functions.CountMin.{cmsEstimate, cmsUnion}
import graft.operators.Aggregates

/** Count-min sketch surface: estimate/merge semantics on crafted counts
  * plus the a13 contract holding on the fixture.
  */
class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  private val sketchOf = (items: Seq[Long]) =>
    items.toDF("x").agg(
      count_min_sketch(col("x"), lit(0.001), lit(0.99), lit(42)).as("sk"))

  test("estimate never under-counts and is exact without collisions") {
    // 10 distinct keys, key k appearing k times — far below width 2/eps,
    // so estimates are exact
    val items = (1L to 10L).flatMap(k => Seq.fill(k.toInt)(k))
    val sk = sketchOf(items)
    val got = sk.select((1L to 10L).map(k =>
      cmsEstimate(col("sk"), lit(k)).as(s"e$k")): _*).head()
    (1L to 10L).foreach(k => assert(got.getLong(k.toInt - 1) === k, s"key $k"))
    // absent key estimates 0 (no collisions at this density)
    assert(sk.select(cmsEstimate(col("sk"), lit(999L))).head().getLong(0) === 0L)
  }

  test("sharded sketches merged with cmsUnion equal one direct sketch") {
    val all = (1L to 50L).flatMap(k => Seq.fill((k % 7 + 1).toInt)(k))
    val (h1, h2) = all.splitAt(all.length / 2)
    val direct = sketchOf(all).head().getAs[Array[Byte]](0)
    val merged = Seq(h1, h2)
      .map(h => sketchOf(h).head().getAs[Array[Byte]](0))
      .toDF("sk").agg(cmsUnion(col("sk"))).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, merged),
      "CMS shard-then-merge must be bit-identical to the direct sketch")
  }

  test("merging sketches with different geometry fails loudly, never corrupts") {
    // different eps → different width: mergeInPlace must throw
    // (IncompatibleMergeException wrapped by the aggregate), not
    // silently add misaligned counter tables
    val a = sketchOf(Seq(1L, 2L)).head().getAs[Array[Byte]](0)
    val b = Seq(3L).toDF("x").agg(
      count_min_sketch(col("x"), lit(0.01), lit(0.99), lit(42)))
      .head().getAs[Array[Byte]](0)
    val e = intercept[Exception] {
      Seq(a, b).toDF("sk").agg(cmsUnion(col("sk"))).head()
    }
    assert(e.getMessage.toLowerCase.contains("merge") ||
      e.getCause != null, e.toString)
  }

  test("cms_estimate rejects wrong input types at analysis time") {
    val e = intercept[Exception] {
      Seq(1L).toDF("x").select(cmsEstimate(col("x"), col("x"))).head()
    }
    assert(e.getMessage.contains("cms_estimate") ||
      e.getMessage.toLowerCase.contains("binary"), e.getMessage)
  }

  test("a13 contract booleans hold on the fixture") {
    val rows = Aggregates.cmsContract(Tables.events(spark, sf001)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"never_under violated: $r")
      assert(r.getBoolean(3), s"within_eps violated: $r")
      assert(r.getBoolean(4), s"merge_consistent violated: $r")
    }
  }
}
