package graft

import org.apache.spark.sql.functions._
import graft.functions.HeavyHittersAgg
import graft.operators.TextOps

/** Misra-Gries sketch guarantees under Spark's partial/merge aggregation
  * paths: exactness above the distinct-count, the N/(capacity+1)
  * undercount bound, heavy-hitter recall, and merge-tree invariance of
  * the bounds under different partitionings.
  */
class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  // skewed stream: "hot" 60x, "warm" 25x, 15 singletons; N = 100
  private def stream: Seq[String] =
    Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++
      (1 to 15).map(i => s"rare$i")

  private def summarize(capacity: Int, partitions: Int): Map[String, Long] = {
    val df = stream.toDF("tok").repartition(partitions)
    df.agg(HeavyHittersAgg.heavyHitters(col("tok"), capacity).as("top"))
      .select(explode(col("top")))
      .collect().map(r => r.getStruct(0).getString(0) ->
        r.getStruct(0).getLong(1)).toMap
  }

  test("exact when capacity >= distinct items, any partitioning") {
    for (p <- Seq(1, 7)) {
      val got = summarize(capacity = 32, partitions = p)
      assert(got("hot") === 60L && got("warm") === 25L, s"partitions=$p")
      assert(got.size === 17)
      assert((1 to 15).forall(i => got(s"rare$i") === 1L))
    }
  }

  test("undercount bounded by N/(capacity+1); true heavy hitters survive") {
    val n = stream.length
    for (p <- Seq(1, 4, 16)) {
      val cap = 4
      val got = summarize(cap, p)
      // bound is per merge step; the merge tree adds at most the same
      // total error, so global bound still n/(cap+1) per classic analysis
      val bound = n / (cap + 1) // 20
      // any item with true frequency > bound must be present
      assert(got.contains("hot"), s"partitions=$p: hot missed")
      assert(got.contains("warm"), s"partitions=$p: warm missed")
      got.foreach { case (t, c) =>
        val truth = stream.count(_ == t).toLong
        assert(c <= truth, s"$t overcounted: $c > $truth")
        assert(c >= truth - bound, s"$t undercounted past bound: $c < ${truth - bound}")
      }
    }
  }

  test("registered query shape: per-lang ranks are dense from 1, counts exact") {
    val out = TextOps.heavyHitterTerms(Tables.documents(spark, sf0001), 64, 5)
      .collect()
    val byLang = out.groupBy(_.getString(0))
    byLang.foreach { case (lang, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq === (1L to rows.length),
        s"$lang ranks not dense")
      // counts are non-increasing with rank
      val cnts = rows.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    }
  }
}
