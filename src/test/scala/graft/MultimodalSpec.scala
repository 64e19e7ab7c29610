package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: binary payload schema, per-partition batch
  * feature extraction (REAL ImageIO decode for images, stub fallback),
  * frame sampling shape.
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def media = Multimodal.fromDocuments(Tables.documents(spark, sf0001))

  /** Encode a w×h image as real PNG bytes, pixels from `rgb(x, y)`. */
  private def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("media table carries opaque binary payload + typed metadata") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName === "binary")
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq === Seq("mime", "n_bytes", "width", "height"))
    val row = media.orderBy("media_id").first()
    assert(row.getAs[Array[Byte]]("payload").nonEmpty)
  }

  test("feature extraction emits normalized fixed-width vectors per row") {
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() === media.count())
    val f = feats.orderBy("media_id").first().getSeq[Float](1)
    assert(f.length === 16)
    assert(math.abs(f.sum - 1.0f) < 1e-3, s"histogram must be normalized: ${f.sum}")
  }

  test("stub decode is deterministic") {
    val b = "some payload bytes".getBytes("UTF-8")
    assert(Multimodal.stubDecode(b).toSeq === Multimodal.stubDecode(b).toSeq)
  }

  test("image decode reads REAL pixels: known PNGs give exact luminance histograms") {
    // all-black 16x16: every pixel lum 0 -> bin 0
    val black = Multimodal.imageDecode(png(16, 16)((_, _) => 0x000000)).get
    assert(black(0) === 1.0f && black.drop(1).forall(_ === 0.0f), black.toSeq)
    // left half black, right half white (lum 255 -> bin 15)
    val split = Multimodal.imageDecode(
      png(16, 16)((x, _) => if (x < 8) 0x000000 else 0xFFFFFF)).get
    assert(split(0) === 0.5f && split(15) === 0.5f, split.toSeq)
    // mid-gray 0x808080: lum 128 -> bin 8
    val gray = Multimodal.imageDecode(png(4, 4)((_, _) => 0x808080)).get
    assert(gray(8) === 1.0f, gray.toSeq)
    // non-image bytes: no reader claims them
    assert(Multimodal.imageDecode("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.imageDecode(null).isEmpty)
    // CORRUPT image (valid PNG magic, truncated body): a reader claims
    // it and fails mid-decode — must fall back, not kill the task
    val truncated = png(16, 16)((_, _) => 0x123456).take(30)
    assert(Multimodal.imageDecode(truncated).isEmpty)
    assert(Multimodal.decode(truncated).toSeq ===
      Multimodal.stubDecode(truncated).toSeq)
  }

  test("extraction dispatches per payload: PNG rows decode real pixels, text rows fall back") {
    val rows = Seq(
      (1L, png(8, 8)((_, _) => 0xFFFFFF)),          // real image -> bin 15
      (2L, "plain text payload".getBytes("UTF-8"))  // stub fallback
    ).toDF("media_id", "payload")
    val got = Multimodal.extractFeatures(rows).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got(1L)(15) === 1.0f, s"white PNG must land in the top bin: ${got(1L)}")
    assert(got(2L) ===
      Multimodal.stubDecode("plain text payload".getBytes("UTF-8")).toSeq)
  }

  test("frame sampling splits payload into n frames that reassemble") {
    val frames = Multimodal.sampleFrames(media.limit(5), 4)
    assert(frames.count() === 20)
    val back = frames.groupBy("media_id")
      .agg(array_sort(collect_list(struct(col("frame_idx"), col("frame_payload")))).as("fs"))
      .select(col("media_id"),
        concat((0 until 4).map(i => col("fs").getItem(i).getField("frame_payload")): _*).as("whole"))
    val orig = media.limit(5).select(col("media_id"), col("payload"))
    val joined = back.join(orig, "media_id")
      .filter(col("whole") === col("payload"))
    assert(joined.count() === 5, "concatenated frames must equal the original payload")
  }
}
