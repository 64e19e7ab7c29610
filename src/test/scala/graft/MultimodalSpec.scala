package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: binary payload schema, per-partition batch
  * feature extraction (stubbed decode), frame sampling shape.
  */
class MultimodalSpec extends SparkTestBase {

  private def media = Multimodal.fromDocuments(Tables.documents(spark, sf0001))

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
