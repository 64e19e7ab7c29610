package graft

import org.scalacheck.Gen

/** Property tests with raw ScalaCheck generators (the scalatest-scalacheck
  * bridge isn't in the offline cache): variation-formula invariants +
  * custom-expression kernel laws (SURVEY.md §5.3).
  */
class PropertySpec extends SparkTestBase {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  private def variation(cur: Double, prev: Double): Double =
    BigDecimal((cur - prev) / prev * 100)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val price = Gen.choose(1.0, 1000.0)
    .map(v => math.rint(v * 100) / 100)

  test("integer-cents money aggregation is partition-invariant and matches exact HALF_UP cents") {
    // The guarantee the r9 cents conversions (j2/j6/j8/a1) provide and
    // round(sum(double), 2) does not: the aggregate is a LONG sum of
    // per-row cents, so its value is independent of row order and
    // partition count, and equals a driver-side BigDecimal reference
    // computed with Spark's own Round semantics for doubles
    // (BigDecimal.valueOf(d).setScale(0, HALF_UP)).
    import org.apache.spark.sql.functions.{expr, lit, sum => fsum}
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(4000)((
      (rnd.nextInt(9999999) + 1) / 100.0,   // 2dp price in [0.01, 99999.99]
      rnd.nextInt(1001) / 10000.0))          // 4dp discount in [0, 0.1000]
    val expected = rows.map { case (p, d) =>
      java.math.BigDecimal.valueOf(p * (1 - d) * 100)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    }.sum
    val df = rows.toDF("l_extendedprice", "l_discount")
    val centsSum = expr(
      "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
    for (parts <- Seq(1, 7, 32)) {
      val got = df.repartition(parts)
        .agg((fsum(centsSum) / lit(100.0)).as("revenue"))
        .head().getDouble(0)
      assert(got === expected / 100.0,
        s"cents revenue diverged at $parts partitions")
    }
  }

  test("fused repetition kernel equals a naive gram-histogram model on random docs") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    // small alphabet forces repeated grams, runs, and ties
    val doc = Gen.choose(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "ab")))
    samples(doc, 300).foreach { toks =>
      val row = graft.functions.RepetitionCountsUtil.counts(
        ArrayData.toArrayData(toks.map(UTF8String.fromString).toArray))
      val grams = toks.zip(toks.drop(1)).map { case (x, y) => s"$x $y" }
      val hist = grams.groupBy(identity).view.mapValues(_.size).toMap
      val got = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      if (grams.isEmpty)
        assert(got === ((0L, 0L, 0L, 0L)), s"toks=$toks")
      else assert(got === ((
        grams.size.toLong,
        hist.size.toLong,
        hist.values.max.toLong,
        hist.values.filter(_ > 1).sum.toLong)), s"toks=$toks hist=$hist")
    }
  }

  test("Misra-Gries at exact capacity is partition-invariant on random streams") {
    import scala.collection.mutable
    val stream = Gen.choose(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("x", "y", "z", "w", "v")))
    samples(stream, 100).foreach { items =>
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // any split into partial buffers + merges must reproduce exact
      // counts when capacity >= distinct items (here alphabet = 5 <= 8)
      for (splitAt <- Seq(0, items.size / 3, items.size / 2)) {
        val agg = new graft.functions.HeavyHittersAgg(8)
        val (l, r) = items.splitAt(splitAt)
        val bufL = l.foldLeft(agg.zero)(agg.reduce)
        val bufR = r.foldLeft(mutable.Map.empty[String, Long])(agg.reduce)
        val merged = agg.finish(agg.merge(bufL, bufR))
          .map(tc => tc.term -> tc.cnt).toMap
        assert(merged === truth, s"items=$items splitAt=$splitAt")
      }
    }
  }

  test("variation sign agrees with price direction; zero for equal prices") {
    samples(Gen.zip(price, price)).foreach { case (cur, prev) =>
      val v = variation(cur, prev)
      if (math.abs(cur - prev) / prev >= 0.0001)
        assert(v.sign == (cur - prev).sign || v == 0.0, s"cur=$cur prev=$prev v=$v")
      assert(variation(prev, prev) === 0.0)
    }
  }

  test("variation is scale-invariant (to rounding)") {
    samples(Gen.zip(price, price, Gen.choose(1, 100))).foreach { case (cur, prev, k) =>
      assert(math.abs(variation(cur * k, prev * k) - variation(cur, prev)) <= 0.02,
        s"cur=$cur prev=$prev k=$k")
    }
  }

  test("simhash kernel: deterministic, order-insensitive to duplicates-free permutation sensitivity bound") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def sig(tokens: Seq[String]): Long =
      graft.functions.SimHashUtil.simhash(
        ArrayData.toArrayData(tokens.map(UTF8String.fromString).toArray))
    val tokGen = Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty))
    samples(tokGen, 100).foreach { toks =>
      assert(sig(toks) === sig(toks))
      // simhash is a bag fingerprint: order must not matter
      assert(sig(toks) === sig(scala.util.Random.shuffle(toks)))
    }
    assert(sig(Seq("aa", "bb", "cc")) !== sig(Seq("xx", "yy", "zz")))
  }

  test("cosine kernel: self-similarity 1, symmetric, bounded") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    def cos(a: Array[Float], b: Array[Float]): Double =
      graft.functions.VectorUtil.cosine(
        ArrayData.toArrayData(a), ArrayData.toArrayData(b))
    val vecGen = Gen.listOfN(8, Gen.choose(-1.0f, 1.0f))
      .map(_.toArray).suchThat(v => v.exists(x => math.abs(x) > 1e-3))
    samples(Gen.zip(vecGen, vecGen), 100).foreach { case (a, b) =>
      assert(math.abs(cos(a, a) - 1.0) < 1e-9)
      assert(cos(a, b) === cos(b, a))
      assert(cos(a, b) >= -1.0 - 1e-9 && cos(a, b) <= 1.0 + 1e-9)
    }
  }

  test("scd2 invariants hold under random update-batch sequences") {
    import org.apache.spark.sql.functions._
    import graft.operators.MergeOps
    import spark.implicits._
    // small key space forces change/no-op/insert collisions across batches
    val rowGen = Gen.zip(Gen.choose(1L, 6L), Gen.oneOf("A", "B", "C"))
    val batchGen = Gen.listOfN(4, rowGen)
      .map(_.groupBy(_._1).map(_._2.head).toSeq) // key-unique per batch
    samples(batchGen, 8).zipWithIndex.foldLeft(
      MergeOps.scd2Init(Seq((1L, "A")).toDF("k", "seg"))) {
      case (cur, (batch, i)) =>
        val prevRows = cur.collect()
        val next = MergeOps.scd2Merge(cur,
          batch.toDF("k", "seg"), Seq("k"), Seq("seg"), i + 1L)
          .localCheckpoint(true) // bound the 8-deep iterative lineage
        val rows = next.collect()
        val byKey = rows.groupBy(_.getLong(0))
        byKey.foreach { case (k, vs) =>
          // exactly one OPEN version per key, and it is the newest
          val open = vs.filter(_.getBoolean(4))
          assert(open.length === 1, s"key $k open=${open.length} after batch $i")
          assert(open.head.getLong(2) === vs.map(_.getLong(2)).max)
          // closed versions chain: valid_to is set and > valid_from
          vs.filterNot(_.getBoolean(4)).foreach { v =>
            assert(!v.isNullAt(3) && v.getLong(3) > v.getLong(2), v.toString)
          }
        }
        // versions only accumulate — history is never rewritten: every
        // already-CLOSED row survives byte-identical, and the row count
        // is monotone (an open row is either kept open or kept closed)
        val newSet = rows.map(_.toString).toSet
        prevRows.filterNot(_.getBoolean(4)).foreach { closed =>
          assert(newSet.contains(closed.toString),
            s"closed row rewritten after batch $i: $closed")
        }
        assert(rows.length >= prevRows.length)
        next
    }
  }

  test("audio decode on random PCM: normalized 16-bin histogram, exact bin placement") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def wav(samples: Array[Short]): Array[Byte] = {
      val bytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        bytes(2 * i) = (samples(i) & 0xFF).toByte
        bytes(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
        i += 1
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val in = new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val pcm = Gen.choose(1, 400).flatMap(n => Gen.listOfN(n,
      Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt).map(_.toShort)))
    samples(pcm, 60).foreach { s =>
      val arr = s.toArray
      val hist = graft.operators.Multimodal.audioDecode(wav(arr))
        .getOrElse(fail(s"decoder rejected a valid ${arr.length}-sample WAV"))
      assert(hist.length === 16)
      assert(math.abs(hist.sum - 1.0f) < 1e-3, s"sum=${hist.sum}")
      // decoded bins must equal the model computed from the raw samples
      val want = new Array[Float](16)
      arr.foreach { v =>
        want((math.min(math.abs(v.toInt), 32767) * 16) / 32768) += 1f / arr.length
      }
      hist.zip(want).zipWithIndex.foreach { case ((g, w), b) =>
        assert(math.abs(g - w) < 1e-4, s"bin $b: got $g want $w n=${arr.length}")
      }
    }
  }

  test("token-budget mix equals the naive window for any random budget") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions.tokenCount
    val docs = Tables.documents(spark, sf0001)
    // the naive single-window selection IS the spec: equality proves both
    // budget compliance and maximality for every random budget
    def naive(budget: Long) = docs.select(
        col("doc_id"), col("source"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("cum", sum("n_tokens").over(
        Window.partitionBy("source").orderBy("h", "doc_id")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum") <= budget)
      .select("doc_id", "source", "n_tokens")
      .orderBy("doc_id")
    samples(Gen.choose(0L, 3000L), 5).foreach { budget =>
      val picked = graft.operators.TrainingPipeline.tokenBudgetMix(docs, budget)
      assert(picked.collect().toSeq === naive(budget).collect().toSeq,
        s"budget $budget diverges from the naive window")
    }
  }

  test("fuzzy decontamination scores are valid Jaccards on random doc pairs") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // random docs over a tiny vocabulary force shared shingles
    val doc = Gen.choose(3, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    val train = samples(doc, 20).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val eval = samples(doc, 5).zipWithIndex.map { case (t, i) => (100L + i, t) }
      .toDF("doc_id", "text")
    val got = graft.operators.Decontam.fuzzyDecontaminate(train, eval, minJaccard = 0.0)
      .collect()
    assert(got.nonEmpty, "tiny-vocab corpora must collide")
    got.foreach { r =>
      val j = r.getDouble(2)
      assert(j > 0.0 && j <= 1.0, s"jaccard out of range: $r")
    }
    // identical texts across the corpora must score exactly 1.0
    val t0 = train.orderBy("doc_id").first().getString(1)
    val withCopy = eval.union(Seq((999L, t0)).toDF("doc_id", "text"))
    val exact = graft.operators.Decontam
      .fuzzyDecontaminate(train, withCopy, minJaccard = 0.0)
      .filter(col("train_doc") === 0L && col("eval_doc") === 999L)
      .collect()
    assert(exact.length === 1 && exact.head.getDouble(2) === 1.0)
  }

  test("quality score is always in [0, 4] and stopword count <= token count") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf0001)
    import graft.functions.TextFunctions._
    val r = docs.select(
      qualityScore(col("text")).as("q"),
      stopwordCount(col("text")).as("sw"),
      tokenCount(col("text")).as("nt")).collect()
    r.foreach { row =>
      assert(row.getInt(0) >= 0 && row.getInt(0) <= 4)
      assert(row.getInt(1) <= row.getInt(2))
    }
  }

  test("streaks equals a brute-force run scan on random integer walks") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    import spark.implicits._
    def brute(cents: Seq[Long]): (Long, Long) = {
      def longest(cmp: (Long, Long) => Boolean): Long = {
        var best = 0L; var cur = 0L
        cents.zip(cents.drop(1)).foreach { case (p, c) =>
          if (cmp(c, p)) { cur += 1; best = math.max(best, cur) } else cur = 0L
        }
        best
      }
      (longest(_ > _), longest(_ < _))
    }
    val walk = Gen.choose(1, 25).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1L, 5L))) // tiny range forces plateaus
    val walks = samples(walk, 60).zipWithIndex
    val rows = walks.flatMap { case (cents, u) =>
      cents.zipWithIndex.map { case (c, i) =>
        ((u * 1000 + i).toLong, i.toLong * 10, u.toLong, "t", c / 100.0 * 100)
      }
    }
    // value = cents directly (x100/100 keeps the round() exact)
    val df = rows.map { case (id, us, user, t, v) => (id, us, user, t, v) }
      .toDF("event_id", "usl", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("usl"))).drop("usl")
    val got = graft.operators.WindowOps.streaks(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    walks.foreach { case (cents, u) =>
      val (up, dn) = brute(cents.map(c => math.round(c / 100.0 * 100 * 100).toLong))
      assert(got(u.toLong) === ((up, dn)), s"user $u walk $cents")
    }
  }

  test("charClassProfile counts match plain Scala character scans") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val charGen = Gen.frequency(
      6 -> Gen.alphaChar, 2 -> Gen.numChar, 2 -> Gen.oneOf(' ', '.', ',', '!'),
      // BMP-only: Spark length() counts codepoints, Scala String.length
      // counts UTF-16 units - identical only below the surrogate range
      1 -> Gen.oneOf('é', 'ß', '中', 'ω'))
    val docGen = Gen.choose(1, 60).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))
    val docs = samples(docGen, 120).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = graft.operators.TextOps.charClassProfile(
        docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    docs.foreach { case (id, t) =>
      val n = t.length.toLong
      def pm(c: Long) = c * 1000 / n
      val r = got(id)
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === pm(t.count(ch => ch >= 'A' && ch <= 'Z')), s"upper in '$t'")
      assert(r.getLong(3) === pm(t.count(ch => ch >= '0' && ch <= '9')), s"digit in '$t'")
      assert(r.getLong(4) === pm(t.count(_ == ' ')), s"space in '$t'")
      assert(r.getLong(6) === pm(t.count(ch => ch < ' ' || ch > '~')), s"nonascii in '$t'")
    }
  }
}
