package graft

import graft.operators.VideoContainer
import graft.operators.VideoContainer.Mp4Layout

/** Codec-free ISO-BMFF parsing: sample-table round-trips through the
  * real box walk, layout generality (co64 / mdhd v1 / largesize /
  * uniform stsz / implicit all-sync / multi-run stts), per-item
  * isolation on junk, and the Spark keyframe surface.
  */
class VideoContainerSpec extends SparkTestBase {

  private val sizes = Array.tabulate(11)(i => 50 + 7 * i)
  private val sync = Array(1, 4, 9)
  private def fill(i: Int, j: Int): Int = (i * 37 + j * 5) % 251

  private def build(layout: Mp4Layout = Mp4Layout(), spc: Int = 4) =
    VideoContainer.buildMp4(timescale = 12000, delta = 600, sizes = sizes,
      sync = sync, samplesPerChunk = spc, sampleByte = fill, layout = layout)

  test("synthetic container round-trips: every table field and every located byte range") {
    for (id <- Seq(0L, 7L, 123L, 100000007L)) {
      val payload = VideoContainer.syntheticMp4(id)
      val st = VideoContainer.parseMp4(payload).get
      val n = (16 + id % 17).toInt
      val g = (4 + id % 3).toInt
      assert(st.sampleSizes.length === n)
      assert(st.timescale === 9000 + (id % 4) * 3000)
      assert(st.duration === n * (512 + (id % 5) * 128))
      assert(st.codec === "mp4v")
      assert(st.syncSamples.toSeq === (1 to n).filter(i => (i - 1) % g == 0))
      for (i <- 1 to n) {
        assert(st.sampleSizes(i - 1) === 64 + (id * 131 + i * 17) % 64)
        assert(st.decodeTimes(i - 1) === (i - 1) * (512 + (id % 5) * 128))
        // byte-identity: the located range must hold EXACTLY the fill
        // pattern the generator wrote for sample i — this is the check
        // that proves the stsc/stco/stsz offset arithmetic
        val off = st.sampleOffsets(i - 1).toInt
        val expected = Array.tabulate(st.sampleSizes(i - 1).toInt)(j =>
          ((id * 7 + i * 13 + j.toLong * 11) % 251).toByte)
        assert(payload.slice(off, off + expected.length).toSeq === expected.toSeq,
          s"sample $i of doc $id mislocated")
      }
    }
  }

  test("layout variants encode the same logical table: co64, mdhd v1, largesize mdat") {
    val base = VideoContainer.parseMp4(build()).get
    for (layout <- Seq(
        Mp4Layout(useCo64 = true),
        Mp4Layout(mdhdV1 = true),
        Mp4Layout(largesizeMdat = true),
        Mp4Layout(useCo64 = true, mdhdV1 = true, largesizeMdat = true))) {
      val payload = build(layout)
      val st = VideoContainer.parseMp4(payload).get
      assert(st.timescale === base.timescale && st.duration === base.duration)
      assert(st.sampleSizes.toSeq === base.sampleSizes.toSeq)
      assert(st.decodeTimes.toSeq === base.decodeTimes.toSeq)
      assert(st.syncSamples.toSeq === base.syncSamples.toSeq)
      // offsets differ (headers differ) but located CONTENT must not
      for (i <- 1 to sizes.length) {
        val off = st.sampleOffsets(i - 1).toInt
        val expected = Array.tabulate(sizes(i - 1))(j => fill(i, j).toByte)
        assert(payload.slice(off, off + sizes(i - 1)).toSeq === expected.toSeq,
          s"sample $i mislocated under $layout")
      }
    }
  }

  test("uniform stsz, absent stss (all sync), multi-run stts") {
    val uni = VideoContainer.buildMp4(12000, 600,
      sizes = Array.fill(9)(80), sync = Array(1, 5), samplesPerChunk = 3,
      sampleByte = fill, layout = Mp4Layout(uniformStsz = true))
    val stUni = VideoContainer.parseMp4(uni).get
    assert(stUni.sampleSizes.toSeq === Seq.fill(9)(80L))
    for (i <- 1 to 9) {
      val off = stUni.sampleOffsets(i - 1).toInt
      assert(uni.slice(off, off + 80).toSeq ===
        Array.tabulate(80)(j => fill(i, j).toByte).toSeq)
    }

    val noStss = VideoContainer.parseMp4(build(Mp4Layout(omitStss = true))).get
    assert(noStss.syncSamples.toSeq === (1 to sizes.length))

    val runs = Seq((4, 600L), (3, 900L), (4, 300L))
    val multi = VideoContainer.parseMp4(
      build(Mp4Layout(sttsRuns = Some(runs)))).get
    val expectedTimes = runs.flatMap { case (c, d) => Seq.fill(c)(d) }
      .scanLeft(0L)(_ + _).init
    assert(multi.decodeTimes.toSeq === expectedTimes)
  }

  test("single-chunk and non-dividing chunk layouts locate identically") {
    for (spc <- Seq(1, 2, 3, 5, 11, 100)) {
      val payload = build(spc = spc)
      val st = VideoContainer.parseMp4(payload).get
      for (i <- 1 to sizes.length) {
        val off = st.sampleOffsets(i - 1).toInt
        assert(payload.slice(off, off + sizes(i - 1)).toSeq ===
          Array.tabulate(sizes(i - 1))(j => fill(i, j).toByte).toSeq,
          s"sample $i mislocated at samplesPerChunk=$spc")
      }
    }
  }

  test("non-container payloads and truncations are isolated, never thrown") {
    assert(VideoContainer.parseMp4(null).isEmpty)
    assert(VideoContainer.parseMp4(Array.emptyByteArray).isEmpty)
    assert(VideoContainer.parseMp4("plain text, not a container".getBytes).isEmpty)
    val good = build()
    // truncate INSIDE moov: the sample tables can't bind
    assert(VideoContainer.parseMp4(good.take(60)).isEmpty)
    // corrupt a box size to point past the payload end
    val bad = good.clone()
    bad(0) = 0x7F.toByte
    assert(VideoContainer.parseMp4(bad).isEmpty)
  }

  test("videoKeyframes: one row per sync sample, exact byte sums, codec-free") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val ids = Seq(3L, 44L, 1005L)
    val mediaSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(ids.map(id =>
        Row(id, VideoContainer.syntheticMp4(id))), 2), mediaSchema)
    val rows = VideoContainer.videoKeyframes(media)
      .orderBy("media_id", "kf_idx").collect()
    val expected = ids.map { id =>
      val n = 16 + id % 17; val g = 4 + id % 3
      id -> (1L to n).count(i => (i - 1) % g == 0)
    }.toMap
    assert(rows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap ===
      expected.map { case (k, v) => k -> v })
    for (r <- rows) {
      val id = r.getLong(0); val i = r.getInt(2)
      val size = 64 + (id * 131 + i * 17) % 64
      val sum = (0L until size).map(j => (id * 7 + i * 13 + j * 11) % 251).sum
      assert(r.getLong(8) === size && r.getLong(9) === sum)
    }
  }
}
