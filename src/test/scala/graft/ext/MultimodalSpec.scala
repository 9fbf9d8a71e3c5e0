package graft.ext

import graft.SparkTestBase
import graft.io.Tables

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._
  import Multimodal._

  private lazy val media =
    asMedia(Tables.load(spark, sf, "documents").limit(50), "doc_id", "text")

  test("asMedia: binary payload round-trips the source bytes") {
    val r = media.filter(_.media_id == 0L).head()
    val txt = Tables.load(spark, sf, "documents")
      .filter($"doc_id" === 0L).select("text").as[String].head()
    assert(new String(r.content, "UTF-8") == txt)
  }

  test("decodeImages: deterministic metadata, plausible dimensions") {
    val metas = decodeImages(media).collect()
    assert(metas.length == 50)
    assert(metas.forall(m => m.width >= 1 && m.width <= 640 &&
      m.height >= 1 && m.height <= 480 && m.channels == 3 && m.n_bytes > 0))
    // determinism across runs
    val again = decodeImages(media).collect()
    assert(metas.map(m => (m.media_id, m.width, m.height)).toSet ==
      again.map(m => (m.media_id, m.width, m.height)).toSet)
  }

  test("featurize: fixed-dim Array[Float] usable by Similarity ops") {
    val feats = featurize(media, dim = 8).toDF()
    assert(feats.schema("feature").dataType.typeName == "array")
    val nn = Similarity.bruteForceTopK(
      feats.withColumnRenamed("media_id", "vec_id")
        .withColumnRenamed("feature", "embedding"),
      "vec_id", "embedding", queryIds = Seq(0L), k = 3)
    assert(nn.count() == 3)
  }

  test("resize: shrinks payloads deterministically, keeps ids") {
    val small = resize(media, targetW = 8, targetH = 8)
    val byId = small.collect().map(r => r.media_id -> r.content.length).toMap
    val orig = media.collect().map(r => r.media_id -> r.content.length).toMap
    assert(byId.keySet == orig.keySet)
    assert(byId.forall { case (id, n) => n <= orig(id) && n > 0 })
    val again = resize(media, 8, 8).collect().map(r => r.media_id -> r.content.length).toMap
    assert(byId == again)
  }

  test("sampleFrames: stride covers the payload") {
    val frames = sampleFrames(media, stride = 100).collect()
    val byDoc = frames.groupBy(_.media_id)
    assert(byDoc.values.forall(fs =>
      fs.map(_.frame_idx).sorted.sameElements(fs.indices)))
    assert(frames.forall(_.offset_bytes % 100 == 0))
  }
}
