package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** CODEC-FREE video-container parsing: ISO base-media (MP4/MOV family)
  * box structure walked directly over the opaque binary payload — the
  * real half of video handling a data pipeline can do without shipping
  * H.264/HEVC decoders. The parser extracts the full sample table
  * (`stts`/`stss`/`stsz`/`stsc`/`stco`|`co64`), which is enough to
  *
  *   - enumerate KEYFRAMES (sync samples) with their decode timestamps,
  *   - locate each keyframe's exact BYTE RANGE inside `mdat` (chunk
  *     offset + intra-chunk size prefix — no codec involved), and
  *   - hand those ranges to downstream feature/hash stages.
  *
  * The DECODE BOUNDARY is explicit and narrower than before: turning a
  * located access unit's bytes into pixels needs a codec the JDK does
  * not ship, so per-keyframe features stay byte-domain (exact integer
  * byte sums here; [[Multimodal.stubDecode]]'s histogram elsewhere).
  * Everything structural — box walk, version branches, 32/64-bit sizes
  * and offsets, chunk expansion, timestamp accumulation — is real and
  * oracle-verified (`m4_video_keyframes` round-trips a closed-form
  * generated container through the parser against a DuckDB oracle that
  * recomputes every field, including the byte sums that only match if
  * the located ranges are exactly right).
  *
  * Scale notes: parsing is row-local (`mapPartitions`, same batch shape
  * as [[Multimodal.extractFeatures]]); sample tables live on the heap
  * only for the row being parsed; emitted rows are proportional to
  * keyframes, never samples times payload bytes.
  */
object VideoContainer {

  /** Parsed track-level sample table of the first video (else first)
    * track. All arrays are indexed by 0-based sample position;
    * `syncSamples` holds 1-based sample numbers as stored in `stss`
    * (absent `stss` box means every sample is sync, per ISO 14496-12).
    */
  final case class SampleTable(
      timescale: Long,
      duration: Long,
      codec: String,
      sampleSizes: Array[Long],
      decodeTimes: Array[Long],
      sampleOffsets: Array[Long],
      syncSamples: Array[Int])

  // ---------------------------------------------------------------------
  // Box walking
  // ---------------------------------------------------------------------

  private def fourcc(buf: ByteBuffer, at: Int): String =
    new String(Array(buf.get(at), buf.get(at + 1), buf.get(at + 2),
      buf.get(at + 3)), java.nio.charset.StandardCharsets.US_ASCII)

  /** Iterate child boxes of the byte range [from, until): calls `f`
    * with (type, payloadStart, payloadEnd). Handles 32-bit sizes,
    * 64-bit `largesize` (size==1) and to-end-of-enclosing (size==0).
    * Malformed sizes terminate the walk rather than throw — per-item
    * isolation, same rule as the image/audio decoders.
    */
  private def walkBoxes(buf: ByteBuffer, from: Int, until: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var p = from
    var stop = false
    while (!stop && p + 8 <= until) {
      val size32 = buf.getInt(p).toLong & 0xFFFFFFFFL
      val typ = fourcc(buf, p + 4)
      var payloadStart = p + 8
      var boxEnd: Long = 0L
      if (size32 == 0) boxEnd = until.toLong
      else if (size32 == 1) {
        if (p + 16 > until) { stop = true; boxEnd = -1 }
        else { payloadStart = p + 16; boxEnd = p + buf.getLong(p + 8) }
      } else boxEnd = p + size32
      if (!stop) {
        if (boxEnd < payloadStart || boxEnd > until) stop = true
        else {
          f(typ, payloadStart, boxEnd.toInt)
          p = boxEnd.toInt
        }
      }
    }
  }

  private def findBox(buf: ByteBuffer, from: Int, until: Int,
      typ: String): Option[(Int, Int)] = {
    var found: Option[(Int, Int)] = None
    walkBoxes(buf, from, until) { (t, s, e) =>
      if (found.isEmpty && t == typ) found = Some((s, e))
    }
    found
  }

  // ---------------------------------------------------------------------
  // Sample-table parsing
  // ---------------------------------------------------------------------

  /** Parse an ISO-BMFF payload to its first video track's sample table.
    * None when the bytes aren't a parseable container (no `moov`, no
    * track with a complete `stbl`, or structurally inconsistent tables)
    * — a cheap structural sniff, never an exception path.
    */
  def parseMp4(payload: Array[Byte]): Option[SampleTable] = {
    if (payload == null || payload.length < 16) return None
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
    // quick sniff: first top-level box type must be a known carrier
    val head = fourcc(buf, 4)
    if (head != "ftyp" && head != "moov" && head != "styp") return None
    try parseInner(buf, payload.length)
    catch { case scala.util.control.NonFatal(_) => None }
  }

  private def parseInner(buf: ByteBuffer, len: Int): Option[SampleTable] = {
    val moov = findBox(buf, 0, len, "moov").getOrElse(return None)

    // prefer the first track whose hdlr type is 'vide'; else first track
    var video: Option[(Int, Int)] = None
    var first: Option[(Int, Int)] = None
    walkBoxes(buf, moov._1, moov._2) { (t, s, e) =>
      if (t == "trak") {
        if (first.isEmpty) first = Some((s, e))
        if (video.isEmpty) {
          val isVide = (for {
            mdia <- findBox(buf, s, e, "mdia")
            hdlr <- findBox(buf, mdia._1, mdia._2, "hdlr")
          } yield fourcc(buf, hdlr._1 + 8) == "vide").getOrElse(false)
          if (isVide) video = Some((s, e))
        }
      }
    }
    val trak = video.orElse(first).getOrElse(return None)
    val mdia = findBox(buf, trak._1, trak._2, "mdia").getOrElse(return None)
    val mdhd = findBox(buf, mdia._1, mdia._2, "mdhd").getOrElse(return None)

    // mdhd: version 1 widens creation/modification/duration to 64 bits
    val mdhdVersion = buf.get(mdhd._1).toInt & 0xFF
    val (timescale, duration) =
      if (mdhdVersion == 1)
        (buf.getInt(mdhd._1 + 20).toLong & 0xFFFFFFFFL, buf.getLong(mdhd._1 + 24))
      else
        (buf.getInt(mdhd._1 + 12).toLong & 0xFFFFFFFFL,
          buf.getInt(mdhd._1 + 16).toLong & 0xFFFFFFFFL)

    val minf = findBox(buf, mdia._1, mdia._2, "minf").getOrElse(return None)
    val stbl = findBox(buf, minf._1, minf._2, "stbl").getOrElse(return None)

    // stsd: first sample entry's fourcc = codec tag
    val codec = findBox(buf, stbl._1, stbl._2, "stsd").flatMap { case (s, e) =>
      val n = buf.getInt(s + 4)
      if (n >= 1 && s + 16 <= e) Some(fourcc(buf, s + 12)) else None
    }.getOrElse(return None)

    // stsz: either uniform sample_size or a per-sample table
    val stsz = findBox(buf, stbl._1, stbl._2, "stsz").getOrElse(return None)
    val uniformSize = buf.getInt(stsz._1 + 4).toLong & 0xFFFFFFFFL
    val sampleCount = buf.getInt(stsz._1 + 8)
    if (sampleCount < 0) return None
    val sizes = new Array[Long](sampleCount)
    if (uniformSize != 0) java.util.Arrays.fill(sizes, uniformSize)
    else {
      if (stsz._1 + 12 + 4L * sampleCount > stsz._2) return None
      var i = 0
      while (i < sampleCount) {
        sizes(i) = buf.getInt(stsz._1 + 12 + 4 * i).toLong & 0xFFFFFFFFL
        i += 1
      }
    }

    // stts: run-length (count, delta) pairs, accumulated to per-sample
    // decode start times
    val stts = findBox(buf, stbl._1, stbl._2, "stts").getOrElse(return None)
    val nRuns = buf.getInt(stts._1 + 4)
    if (nRuns < 0 || stts._1 + 8 + 8L * nRuns > stts._2) return None
    val times = new Array[Long](sampleCount)
    var t = 0L
    var si = 0
    var r = 0
    while (r < nRuns && si < sampleCount) {
      val cnt = buf.getInt(stts._1 + 8 + 8 * r)
      val delta = buf.getInt(stts._1 + 12 + 8 * r).toLong & 0xFFFFFFFFL
      var c = 0
      while (c < cnt && si < sampleCount) {
        times(si) = t; t += delta; si += 1; c += 1
      }
      r += 1
    }
    if (si != sampleCount) return None // stts does not cover every sample

    // stco / co64: chunk offsets (32- or 64-bit)
    val chunkOffsets: Array[Long] =
      findBox(buf, stbl._1, stbl._2, "stco") match {
        case Some((s, e)) =>
          val n = buf.getInt(s + 4)
          if (n < 0 || s + 8 + 4L * n > e) return None
          Array.tabulate(n)(i => buf.getInt(s + 8 + 4 * i).toLong & 0xFFFFFFFFL)
        case None =>
          val (s, e) = findBox(buf, stbl._1, stbl._2, "co64").getOrElse(return None)
          val n = buf.getInt(s + 4)
          if (n < 0 || s + 8 + 8L * n > e) return None
          Array.tabulate(n)(i => buf.getLong(s + 8 + 8 * i))
      }
    val nChunks = chunkOffsets.length

    // stsc: (first_chunk, samples_per_chunk) runs, expanded to
    // per-sample offsets — sample offset = its chunk's offset plus the
    // sizes of the samples before it in that chunk
    val stsc = findBox(buf, stbl._1, stbl._2, "stsc").getOrElse(return None)
    val nEntries = buf.getInt(stsc._1 + 4)
    if (nEntries <= 0 || stsc._1 + 8 + 12L * nEntries > stsc._2) return None
    val offsets = new Array[Long](sampleCount)
    var sample = 0
    var entry = 0
    var chunk = 1
    while (chunk <= nChunks && sample < sampleCount) {
      while (entry + 1 < nEntries &&
        buf.getInt(stsc._1 + 8 + 12 * (entry + 1)) <= chunk) entry += 1
      val spc = buf.getInt(stsc._1 + 12 + 12 * entry)
      if (spc <= 0) return None
      var within = 0L
      var c = 0
      while (c < spc && sample < sampleCount) {
        offsets(sample) = chunkOffsets(chunk - 1) + within
        within += sizes(sample)
        sample += 1; c += 1
      }
      chunk += 1
    }
    if (sample != sampleCount) return None // chunks don't cover all samples

    // stss: 1-based sync sample numbers; ABSENT box = every sample sync
    val sync = findBox(buf, stbl._1, stbl._2, "stss") match {
      case Some((s, e)) =>
        val n = buf.getInt(s + 4)
        if (n < 0 || s + 8 + 4L * n > e) return None
        Array.tabulate(n)(i => buf.getInt(s + 8 + 4 * i))
      case None => Array.tabulate(sampleCount)(_ + 1)
    }
    if (sync.exists(sidx => sidx < 1 || sidx > sampleCount)) return None

    Some(SampleTable(timescale, duration, codec, sizes, times, offsets, sync))
  }

  // ---------------------------------------------------------------------
  // Spark surface
  // ---------------------------------------------------------------------

  /** One row per SYNC SAMPLE (keyframe) of each parseable container:
    * decode timestamp, located size/offset, and the exact integer sum of
    * the access unit's bytes (the codec-free feature — only matches the
    * oracle if `stsc`/`stco`/`stsz` expansion located the range exactly).
    * Rows whose located range falls outside the payload are dropped
    * (truncated file), not failed. Per-partition batch loop like
    * [[Multimodal.extractFeatures]].
    */
  def videoKeyframes(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kf_idx", IntegerType, nullable = false),
      StructField("sample_idx", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("timescale", LongType, nullable = false),
      StructField("duration", LongType, nullable = false),
      StructField("codec", StringType, nullable = false),
      StructField("t_units", LongType, nullable = false),
      StructField("sample_size", LongType, nullable = false),
      StructField("byte_sum", LongType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](1)
        parseMp4(payload) match {
          case Some(st) =>
            val n = st.sampleSizes.length
            st.syncSamples.iterator.zipWithIndex.flatMap { case (sidx, kf) =>
              val off = st.sampleOffsets(sidx - 1)
              val sz = st.sampleSizes(sidx - 1)
              if (off < 0 || off + sz > payload.length) None
              else {
                var sum = 0L
                var j = off.toInt
                val end = (off + sz).toInt
                while (j < end) { sum += payload(j) & 0xFF; j += 1 }
                Some(Row(r.getLong(0), kf, sidx, n, st.timescale,
                  st.duration, st.codec, st.decodeTimes(sidx - 1), sz, sum))
              }
            }.toSeq
          case None => Nil
        }
      }
    }(encoder)
  }

  // ---------------------------------------------------------------------
  // Deterministic synthetic container builder (fixture + oracle bridge)
  // ---------------------------------------------------------------------

  /** Closed-form synthetic MP4 for `docId`: every parameter below is a
    * pure integer function of `docId` that the DuckDB oracle recomputes
    * (sample count, keyframe cadence, stts delta, timescale, per-sample
    * sizes, and the per-byte fill pattern whose range sums prove the
    * located offsets). Layout exercises the general paths: multi-chunk
    * (4 samples per chunk via a 1- or 2-run `stsc`), per-sample `stsz`,
    * explicit `stss`, single-run `stts`.
    */
  def syntheticMp4(docId: Long): Array[Byte] = {
    val id = docId & 0x7FFFFFFFFFFFFFFFL
    val n = (16 + id % 17).toInt          // samples
    val g = (4 + id % 3).toInt            // keyframe cadence
    val delta = 512 + (id % 5) * 128      // stts delta (timescale units)
    val timescale = 9000 + (id % 4) * 3000
    val sizes = Array.tabulate(n)(i0 => (64 + (id * 131 + (i0 + 1) * 17) % 64).toInt)
    val sync = (1 to n).filter(i => (i - 1) % g == 0).toArray
    buildMp4(timescale, delta, sizes, sync, samplesPerChunk = 4,
      sampleByte = (i, j) => ((id * 7 + i * 13 + j.toLong * 11) % 251).toInt)
  }

  /** Container-layout switches for [[buildMp4]] — each flips the writer
    * onto an alternative ISO-BMFF encoding of the SAME logical sample
    * table, so the spec can prove the parser's general paths (64-bit
    * chunk offsets, 64-bit `mdhd`, uniform sample size, implicit
    * all-sync, multi-run `stts`, `largesize` boxes) against one
    * expectation.
    */
  final case class Mp4Layout(
      uniformStsz: Boolean = false,
      useCo64: Boolean = false,
      omitStss: Boolean = false,
      mdhdV1: Boolean = false,
      largesizeMdat: Boolean = false,
      sttsRuns: Option[Seq[(Int, Long)]] = None)

  /** Assemble a structurally-valid single-track MP4 from explicit sample
    * tables — shared by [[syntheticMp4]] and the spec's layout variants.
    * `sampleByte(i, j)` fills byte j (0-based) of 1-based sample i.
    */
  def buildMp4(timescale: Long, delta: Long, sizes: Array[Int],
      sync: Array[Int], samplesPerChunk: Int,
      sampleByte: (Int, Int) => Int,
      layout: Mp4Layout = Mp4Layout()): Array[Byte] = {
    val n = sizes.length
    require(samplesPerChunk >= 1)
    require(!layout.uniformStsz || sizes.distinct.length <= 1,
      "uniformStsz needs equal sample sizes")
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def u64(v: Long): Array[Byte] = u32(v >>> 32) ++ u32(v & 0xFFFFFFFFL)
    def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      u32(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body
    }
    def largebox(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      u32(1) ++ typ.getBytes("US-ASCII") ++ u64(body.length + 16L) ++ body
    }
    val duration = n * delta

    val ftyp = box("ftyp", "isom".getBytes, u32(0), "isom".getBytes)

    val mvhd = box("mvhd", u32(0), u32(0), u32(0), u32(timescale),
      u32(duration), u32(0x00010000L), Array[Byte](0, 0), new Array[Byte](10),
      u32(0x00010000L), u32(0), u32(0), u32(0), u32(0x00010000L), u32(0),
      u32(0), u32(0), u32(0x40000000L), new Array[Byte](24), u32(2))
    val tkhd = box("tkhd", u32(7), u32(0), u32(0), u32(1), u32(0),
      u32(duration), new Array[Byte](8), Array[Byte](0, 0, 0, 0),
      new Array[Byte](4), u32(0x00010000L), u32(0), u32(0), u32(0),
      u32(0x00010000L), u32(0), u32(0), u32(0), u32(0x40000000L),
      u32(320L << 16), u32(240L << 16))
    val mdhd =
      if (layout.mdhdV1)
        box("mdhd", u32(0x01000000L), u64(0), u64(0), u32(timescale),
          u64(duration), Array[Byte](0x55, (0xC4 & 0xFF).toByte),
          Array[Byte](0, 0))
      else
        box("mdhd", u32(0), u32(0), u32(0), u32(timescale),
          u32(duration), Array[Byte](0x55, (0xC4 & 0xFF).toByte),
          Array[Byte](0, 0))
    val hdlr = box("hdlr", u32(0), u32(0), "vide".getBytes,
      new Array[Byte](12), "graft video handler ".getBytes("US-ASCII"))

    // stsd with one generic visual sample entry tagged mp4v
    val visualEntry = u32(86) ++ "mp4v".getBytes ++ new Array[Byte](6) ++
      Array[Byte](0, 1) ++ new Array[Byte](16) ++
      Array[Byte](1, 64, 0, (240 & 0xFF).toByte) ++ // width 320, height 240
      u32(0x00480000L) ++ u32(0x00480000L) ++ u32(0) ++ Array[Byte](0, 1) ++
      new Array[Byte](32) ++ Array[Byte](0, 24) ++ Array[Byte](-1, -1)
    val stsd = box("stsd", u32(0), u32(1), visualEntry)

    val runs = layout.sttsRuns.getOrElse(Seq((n, delta)))
    require(runs.map(_._1).sum == n, "stts runs must cover every sample")
    val stts = box("stts", u32(0), u32(runs.length),
      runs.flatMap { case (cnt, d) => (u32(cnt) ++ u32(d)).toSeq }.toArray)
    val stss =
      if (layout.omitStss) Array.emptyByteArray
      else box("stss", u32(0), u32(sync.length),
        sync.flatMap(s => (u32(s): Seq[Byte])).toArray)
    val stsz =
      if (layout.uniformStsz)
        box("stsz", u32(0), u32(sizes.headOption.getOrElse(0).toLong), u32(n))
      else box("stsz", u32(0), u32(0), u32(n),
        sizes.flatMap(s => (u32(s): Seq[Byte])).toArray)

    val nChunks = (n + samplesPerChunk - 1) / samplesPerChunk
    val rem = n % samplesPerChunk
    // one run if chunks divide evenly or only the LAST chunk is short
    // (stsc runs describe "this chunk and following", so a short final
    // chunk needs its own run)
    val stscRuns =
      if (rem == 0 || nChunks == 1) Seq((1, math.min(samplesPerChunk, n)))
      else Seq((1, samplesPerChunk), (nChunks, rem))
    val stsc = box("stsc", u32(0), u32(stscRuns.length),
      stscRuns.flatMap { case (fc, spc) =>
        (u32(fc) ++ u32(spc) ++ u32(1)).toSeq
      }.toArray)

    // chunk offsets depend on total header size; the offset box is
    // fixed-size, so measure the header with a zero-filled table first
    def offsetsBox(offsets: Array[Long]) =
      if (layout.useCo64) box("co64", u32(0), u32(nChunks),
        offsets.flatMap(v => (u64(v): Seq[Byte])).toArray)
      else box("stco", u32(0), u32(nChunks),
        offsets.flatMap(v => (u32(v): Seq[Byte])).toArray)
    def moovWith(offsets: Array[Long]) =
      box("moov", mvhd, box("trak", tkhd, box("mdia", mdhd, hdlr,
        box("minf", box("stbl", stsd, stts, stss, stsz, stsc,
          offsetsBox(offsets))))))
    val mdatHeader = if (layout.largesizeMdat) 16L else 8L
    val mdatStart = ftyp.length + moovWith(new Array[Long](nChunks)).length +
      mdatHeader

    val chunkOffsets = new Array[Long](nChunks)
    var acc = mdatStart
    var s = 0
    for (c <- 0 until nChunks) {
      chunkOffsets(c) = acc
      var k = 0
      while (k < samplesPerChunk && s < n) { acc += sizes(s); s += 1; k += 1 }
    }
    val moov = moovWith(chunkOffsets)

    val mdatBody = new java.io.ByteArrayOutputStream()
    for (i <- 1 to n; j <- 0 until sizes(i - 1))
      mdatBody.write(sampleByte(i, j) & 0xFF)
    val mdat =
      if (layout.largesizeMdat) largebox("mdat", mdatBody.toByteArray)
      else box("mdat", mdatBody.toByteArray)

    out.write(ftyp); out.write(moov); out.write(mdat)
    out.toByteArray
  }
}
