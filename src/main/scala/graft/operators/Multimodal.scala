package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: images/audio/video ride as opaque
  * `binary` columns with typed metadata structs. The Spark-side
  * plumbing — schemas, partition-friendly batching, per-partition
  * decoder init — is real; the pixel/sample decode itself is STUBBED
  * deterministically (the image/audio libraries are not shipped in
  * this environment). A production deployment swaps
  * `StubDecoder` for a real codec (or routes through a Python
  * `mapInPandas` worker); nothing else changes.
  */
object Multimodal {

  /** Container sniffing from magic bytes — real logic, no codec needed.
    * Pure column expression over the binary prefix. */
  def sniffFormat(binCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val head = hex(substring(binCol, 1, 12))
    when(head.startsWith("FFD8FF"), "jpeg")
      .when(head.startsWith("89504E47"), "png")
      .when(head.startsWith("47494638"), "gif")
      .when(head.startsWith("52494646") && substring(head, 17, 8) === "57415645", "wav")
      .when(substring(head, 9, 8) === "66747970", "mp4") // ....ftyp
      .otherwise("unknown")
  }

  case class MediaRow(media_id: Long, content: Array[Byte], format: String)
  case class DecodedImage(media_id: Long, width: Int, height: Int,
                          channels: Int, features: Array[Float])
  case class FrameSample(media_id: Long, frame_index: Int, offset_bytes: Long,
                         features: Array[Float])

  /** STUB decoder: deterministic pseudo-decode deriving dimensions and a
    * feature vector from the content hash. Swap point for a real codec. */
  private[operators] object StubDecoder {
    def decode(id: Long, bytes: Array[Byte], featureDim: Int): DecodedImage = {
      val h = java.util.Arrays.hashCode(bytes)
      val rnd = new scala.util.Random(h.toLong)
      val w = 64 + (math.abs(h) % 16) * 64        // ??? real: codec decode
      val hgt = 64 + (math.abs(h / 16) % 16) * 64
      val feats = Array.fill(featureDim)(rnd.nextFloat() * 2 - 1)
      DecodedImage(id, w, hgt, 3, feats)
    }
  }

  /** Decode + feature-extract over a binary column. `mapPartitions` so
    * decoder init is amortized per partition (the open() pattern) —
    * batch shape matches what a vectorized Python worker would see. */
  def extractImageFeatures(media: Dataset[MediaRow], featureDim: Int = 64): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: load the codec/model once per partition here
      it.map(m => StubDecoder.decode(m.media_id, m.content, featureDim))
    }
  }

  /** Video frame sampling: emit every Nth frame as a row. Frame count /
    * offsets are stubbed from content length (real: container index). */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int = 30,
                   featureDim: Int = 16): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val frames = math.max(1, m.content.length / 1024) // ??? real: demux
      (0 until frames by everyN).map { f =>
        val rnd = new scala.util.Random(java.util.Arrays.hashCode(m.content).toLong + f)
        FrameSample(m.media_id, f, f.toLong * 1024,
          Array.fill(featureDim)(rnd.nextFloat() * 2 - 1))
      }
    }
  }

  case class ResizedImage(media_id: Long, width: Int, height: Int,
                          content: Array[Byte])

  /** Resize over a binary media column — the plumbing (typed rows,
    * per-partition init, batch shape) is real; the pixel transform is
    * stubbed by re-encoding the content hash at a size proportional to
    * the target dimensions. */
  def resize(media: Dataset[MediaRow], width: Int, height: Int): Dataset[ResizedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: codec + scaler initialized once per partition here
      it.map { m =>
        val h = java.util.Arrays.hashCode(m.content)
        val rnd = new scala.util.Random(h.toLong)
        val out = new Array[Byte](math.max(16, width * height / 256)) // ??? real: scaled encode
        rnd.nextBytes(out)
        ResizedImage(m.media_id, width, height, out)
      }
    }
  }

  /** Standard media-table layout: metadata + sniffed format, with the
    * binary column LAST (wide binary payloads at the end keep the
    * row-group layout scan-friendly for metadata-only queries). */
  def mediaTable(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(col(idCol).as("media_id"),
      length(col(binCol)).as("n_bytes"),
      sniffFormat(col(binCol)).as("format"),
      xxhash64(col(binCol)).as("content_hash"),
      col(binCol).as("content"))
}
