package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal._

  private def bytes(prefix: Array[Int], pad: Int = 64): Array[Byte] =
    (prefix.map(_.toByte) ++ Array.fill(pad)(7.toByte))

  private lazy val media = Seq(
    MediaRow(1L, bytes(Array(0xFF, 0xD8, 0xFF, 0xE0)), "jpeg"),
    MediaRow(2L, bytes(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)), "png"),
    MediaRow(3L, bytes(Array(0x47, 0x49, 0x46, 0x38, 0x39, 0x61)), "gif"),
    MediaRow(4L, bytes(Array(0x00, 0x00, 0x00, 0x18, 0x66, 0x74, 0x79, 0x70)), "mp4"),
    MediaRow(5L, bytes(Array(0x01, 0x02, 0x03)), "unknown"))

  test("format sniffing from magic bytes (pure column expr)") {
    val got = media.toDS().toDF()
      .select($"media_id", sniffFormat($"content").as("fmt"))
      .orderBy("media_id").collect().map(_.getString(1))
    assert(got.toSeq == Seq("jpeg", "png", "gif", "mp4", "unknown"))
  }

  test("media table layout: metadata first, binary last, stable hash") {
    val t = mediaTable(media.toDS().toDF(), "media_id", "content")
    assert(t.columns.toSeq == Seq("media_id", "n_bytes", "format", "content_hash", "content"))
    val h1 = t.select("content_hash").collect().map(_.getLong(0)).toSeq
    val h2 = mediaTable(media.toDS().toDF(), "media_id", "content")
      .select("content_hash").collect().map(_.getLong(0)).toSeq
    assert(h1 == h2)
    // metadata-only projection prunes the binary column: no leaf of the
    // optimized plan may still output `content`
    val leaves = t.select("media_id", "format")
      .queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.nonEmpty &&
      leaves.forall(l => !l.output.map(_.name).contains("content")),
      leaves.map(_.output.map(_.name).mkString(",")).mkString(" | "))
  }

  test("stubbed image decode: deterministic dims + features, batch-shaped") {
    val a = extractImageFeatures(media.toDS(), featureDim = 8).collect().sortBy(_.media_id)
    val b = extractImageFeatures(media.toDS(), featureDim = 8).collect().sortBy(_.media_id)
    assert(a.toSeq.map(_.media_id) == b.toSeq.map(_.media_id))
    a.zip(b).foreach { case (x, y) =>
      assert(x.features.toSeq == y.features.toSeq)
      assert(x.width >= 64 && x.height >= 64 && x.channels == 3)
      assert(x.features.length == 8)
    }
  }

  test("video frame sampling: every Nth frame with byte offsets") {
    val video = Seq(MediaRow(9L, Array.fill(10 * 1024)(3.toByte), "mp4")).toDS()
    val frames = sampleFrames(video, everyN = 3).collect().sortBy(_.frame_index)
    assert(frames.map(_.frame_index).toSeq == Seq(0, 3, 6, 9))
    assert(frames.map(_.offset_bytes).toSeq == Seq(0L, 3072L, 6144L, 9216L))
  }

  test("resize stub: deterministic output sized to the target dims") {
    val a = Multimodal.resize(media.toDS(), 128, 128).collect().sortBy(_.media_id)
    val b = Multimodal.resize(media.toDS(), 128, 128).collect().sortBy(_.media_id)
    a.zip(b).foreach { case (x, y) =>
      assert(x.width == 128 && x.height == 128)
      assert(x.content.toSeq == y.content.toSeq, "resize must be deterministic")
    }
    val small = Multimodal.resize(media.toDS(), 64, 64).collect().head
    assert(small.content.length < a.head.content.length)
  }

  test("pipeline: media features feed the similarity operators directly") {
    // decode-stub features → ANN: the multimodal and similarity surfaces
    // compose without adapters (features are array<float> like embeddings)
    val feats = extractImageFeatures(media.toDS(), featureDim = 16)
      .select($"media_id".as("vec_id"), $"features".as("embedding"))
    val q = feats.filter($"vec_id" === 1L).select("embedding")
      .collect().head.getSeq[Float](0)
    val top = graft.operators.Similarity.bruteForceTopK(
      feats, "vec_id", "embedding", q, k = 3).collect()
    assert(top.head.getLong(0) == 1L, "query image ranks itself first")
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-6)
  }
}
