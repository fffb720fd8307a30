package graft.operators

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: images/audio/video ride as opaque
  * `binary` columns with typed metadata structs; decode is REAL —
  * JPEG/PNG/GIF/BMP via `javax.imageio` (ships with the JDK, zero new
  * dependencies), mirroring the reference's `cv2.imdecode` at
  * flink_vision_job_proper.py:149-151 and the resize at
  * rtsp_to_kafka_bridge.py:193-197.
  *
  * Layout rules that matter at 100 TB: decode runs inside
  * `mapPartitions` (codec state amortized per partition, the open()
  * pattern), binary payloads sit LAST in the row so metadata-only
  * queries prune them at the parquet scan, and every emitted feature is
  * a plain `Array[Float]` so the output feeds [[Similarity]] directly.
  *
  * Video: containers needing an external codec (MP4/H.264) are out of
  * reach of the JDK; the real demux path implemented here is MJPEG
  * (concatenated JPEG frames — what IP cameras actually emit over
  * `multipart/x-mixed-replace`, and what the reference's RTSP bridge
  * re-encodes per frame). Non-MJPEG containers yield zero frames
  * rather than fabricated ones.
  */
object Multimodal {

  /** Container sniffing from magic bytes — pure column expression over
    * the binary prefix; no decode needed. */
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
  case class ImageStats(media_id: Long, width: Int, height: Int, channels: Int,
                        pixel_sum: Long, n_dark: Long)
  case class FrameSample(media_id: Long, frame_index: Int, offset_bytes: Long,
                         features: Array[Float])
  case class ResizedImage(media_id: Long, width: Int, height: Int,
                          content: Array[Byte])
  case class AudioStats(media_id: Long, sample_rate: Int, channels: Int,
                        bits: Int, n_frames: Long, sum_abs: Long,
                        zero_crossings: Long, peak_min: Int, peak_max: Int)

  /** The real codec: JDK `ImageIO` + `java.awt.image`. Kept as plain
    * static helpers — safe to call from executor tasks (ImageIO's
    * plugin registry is JVM-global and thread-safe for the built-in
    * JPEG/PNG/GIF/BMP readers). */
  object Codec {
    // In-heap decode buffers; never spill ImageIO scratch to executor disk.
    ImageIO.setUseCache(false)

    /** Decode any ImageIO-supported container. None for null/empty/
      * corrupt payloads (the P4 guard — bad frames degrade, not throw). */
    def decode(bytes: Array[Byte]): Option[BufferedImage] =
      if (bytes == null || bytes.isEmpty) None
      else
        try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
        catch { case _: Exception => None }

    /** 0..255 luminance at (x, y): raw band-0 sample for grayscale
      * rasters (exact — no sRGB conversion), integer ITU-R BT.601 luma
      * `(299r + 587g + 114b) / 1000` otherwise. */
    def luminance(img: BufferedImage, x: Int, y: Int): Int =
      if (img.getRaster.getNumBands == 1) img.getRaster.getSample(x, y, 0)
      else {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        (299 * r + 587 * g + 114 * b) / 1000
      }

    /** Exact per-bin luminance counts (bins equal-width over 0..255). */
    def grayHistogram(img: BufferedImage, bins: Int): Array[Long] = {
      val h = new Array[Long](bins)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          h(luminance(img, x, y) * bins / 256) += 1L
          x += 1
        }
        y += 1
      }
      h
    }

    /** Normalized grayscale histogram — the image feature vector. */
    def features(img: BufferedImage, dim: Int): Array[Float] = {
      val n = img.getWidth.toLong * img.getHeight
      grayHistogram(img, dim).map(c => (c.toDouble / n).toFloat)
    }

    /** Deterministic 8-bit grayscale image from a pixel formula. */
    def grayImage(w: Int, h: Int)(f: (Int, Int) => Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, f(x, y) & 0xff); x += 1 }
        y += 1
      }
      img
    }

    /** 64-bit difference hash (dHash — the public pHash-family
      * perceptual fingerprint): a 9×8 grid of nearest-neighbor
      * luminance samples at `(gx·w/9, gy·h/8)` (integer floor — no
      * interpolation, so an oracle can replay it closed-form on
      * synthetic rasters), bit `gy·8+gx` set iff the left sample is
      * darker than its right neighbor. Robust to uniform brightness
      * shifts and resizing; near-duplicate images land within a few
      * bits. */
    def dHash(img: BufferedImage): Long = {
      val w = img.getWidth; val h = img.getHeight
      var bits = 0L; var bit = 0; var gy = 0
      while (gy < 8) {
        val y = gy * h / 8
        var gx = 0
        while (gx < 8) {
          if (luminance(img, gx * w / 9, y) < luminance(img, (gx + 1) * w / 9, y))
            bits |= 1L << bit
          bit += 1; gx += 1
        }
        gy += 1
      }
      bits
    }

    /** 63-bit audio fingerprint (chromaprint-family, FFT-free): the
      * signal splits into 64 equal frames (floor length, tail
      * ignored), per-frame energy = Σ|sample| (exact integers), bit
      * `i` set iff energy rises from frame `i` to `i+1`. Invariant
      * under uniform amplitude scaling — a re-levelled copy of a
      * recording fingerprints identically — and fully integer, so an
      * oracle replays it closed-form on synthetic waveforms. Signals
      * shorter than 64 samples fingerprint as 0. */
    def audioFp(samples: Array[Int]): Long = {
      if (samples == null || samples.length < 64) return 0L
      val fl = samples.length / 64
      val es = new Array[Long](64)
      var f = 0
      while (f < 64) {
        var s = 0L
        var i = f * fl
        val end = i + fl
        while (i < end) { s += math.abs(samples(i).toLong); i += 1 }
        es(f) = s
        f += 1
      }
      var bits = 0L
      var b = 0
      while (b < 63) { if (es(b) < es(b + 1)) bits |= 1L << b; b += 1 }
      bits
    }

    def encodePng(img: BufferedImage): Array[Byte] = encode(img, "png")
    def encodeJpeg(img: BufferedImage): Array[Byte] = encode(img, "jpg")

    private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, fmt, out)
      out.toByteArray
    }

    /** Parse a WAV container into its `AudioFormat` plus interleaved
      * integer samples — REAL parse via `javax.sound.sampled` (ships
      * with the JDK, works headless; the provider registry is
      * JVM-global and thread-safe like ImageIO's). 16-bit signed
      * (either endianness) and 8-bit unsigned PCM are decoded; other
      * encodings and null/corrupt payloads yield None (the P4 guard —
      * bad media degrades, not throws). */
    def decodeWav(bytes: Array[Byte]): Option[(javax.sound.sampled.AudioFormat, Array[Int])] =
      if (bytes == null || bytes.isEmpty) None
      else
        try {
          val in = javax.sound.sampled.AudioSystem
            .getAudioInputStream(new ByteArrayInputStream(bytes))
          try {
            val fmt = in.getFormat
            val raw = in.readAllBytes()
            fmt.getSampleSizeInBits match {
              case 16 =>
                val out = new Array[Int](raw.length / 2)
                var i = 0
                while (i < out.length) {
                  out(i) =
                    if (fmt.isBigEndian) (raw(2 * i) << 8) | (raw(2 * i + 1) & 0xff)
                    else (raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)
                  i += 1
                }
                Some((fmt, out))
              case 8 => Some((fmt, raw.map(b => (b & 0xff) - 128)))
              case _ => None
            }
          } finally in.close()
        } catch { case _: Exception => None }

    /** Encode interleaved samples as 16-bit signed little-endian PCM
      * WAV through the same `javax.sound` stack. */
    def encodeWav(sampleRate: Float, channels: Int, samples: Array[Int]): Array[Byte] = {
      val raw = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        raw(2 * i) = (samples(i) & 0xff).toByte
        raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, channels, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new ByteArrayInputStream(raw), fmt, (samples.length / channels).toLong)
      val out = new ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Split an MJPEG stream (concatenated JPEGs) into
      * (byte offset, frame bytes) pairs by scanning SOI `FFD8FF` /
      * EOI `FFD9` markers. Sound for camera MJPEG: inside a JPEG's
      * entropy-coded data every 0xFF is byte-stuffed with 0x00, so a
      * bare EOI only terminates a frame (frames with embedded EXIF
      * thumbnails would need a full segment parse — IP-camera MJPEG
      * carries none). */
    def splitMjpegFrames(bytes: Array[Byte]): Seq[(Long, Array[Byte])] = {
      if (bytes == null) return Seq.empty
      val frames = Seq.newBuilder[(Long, Array[Byte])]
      var i = 0
      while (i + 3 < bytes.length) {
        if (bytes(i) == 0xFF.toByte && bytes(i + 1) == 0xD8.toByte &&
            bytes(i + 2) == 0xFF.toByte) {
          var j = i + 2
          var end = -1
          while (end < 0 && j + 1 < bytes.length) {
            if (bytes(j) == 0xFF.toByte && bytes(j + 1) == 0xD9.toByte) end = j + 2
            j += 1
          }
          if (end < 0) { i = bytes.length } // truncated tail frame: drop
          else {
            frames += ((i.toLong, java.util.Arrays.copyOfRange(bytes, i, end)))
            i = end
          }
        } else i += 1
      }
      frames.result()
    }
  }

  /** Decode + feature-extract over a binary column. Features are the
    * normalized grayscale histogram (`featureDim` bins). Undecodable
    * payloads degrade to a zero row (width/height/channels = 0, zero
    * features) so the stream keeps flowing — the reference logs and
    * skips (flink_vision_job_proper.py:149-155). */
  def extractImageFeatures(media: Dataset[MediaRow], featureDim: Int = 64): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // codec/plugin registry warm-up is per-JVM; heavier model state
      // would be initialized once per partition here (open() pattern)
      it.map { m =>
        Codec.decode(m.content) match {
          case Some(img) =>
            DecodedImage(m.media_id, img.getWidth, img.getHeight,
              img.getRaster.getNumBands, Codec.features(img, featureDim))
          case None =>
            DecodedImage(m.media_id, 0, 0, 0, new Array[Float](featureDim))
        }
      }
    }
  }

  /** Exact integer decode statistics — the oracle-friendly face of the
    * decoder (q64): dimensions and channel count from the decoded
    * raster, `pixel_sum` = sum of all luminance values, `n_dark` =
    * count of pixels with luminance < 32 (the mass of the first 8 bins
    * of the 64-bin feature histogram, kept integer-exact). */
  def imageStats(media: Dataset[MediaRow]): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        Codec.decode(m.content) match {
          case Some(img) =>
            var sum = 0L; var dark = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val v = Codec.luminance(img, x, y)
                sum += v; if (v < 32) dark += 1
                x += 1
              }
              y += 1
            }
            ImageStats(m.media_id, img.getWidth, img.getHeight,
              img.getRaster.getNumBands, sum, dark)
          case None => ImageStats(m.media_id, 0, 0, 0, 0L, 0L)
        }
      }
    }
  }

  /** Exact integer decode statistics for audio — the oracle-friendly
    * face of the WAV decoder (q67, the [[imageStats]] pattern):
    * container facts from the parsed header (rate/channels/bits),
    * `n_frames` = sample frames, `sum_abs` = Σ|sample| over every
    * channel, `zero_crossings` counted on channel 0 (sign change
    * between consecutive frames, zero counted positive), and the
    * signed peaks. A decoder with a byte-order or signedness bug
    * cannot reproduce `sum_abs`/`peak_min` on an asymmetric-amplitude
    * fixture. Undecodable payloads degrade to a zero row. */
  def audioStats(media: Dataset[MediaRow]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        Codec.decodeWav(m.content) match {
          case Some((fmt, s)) =>
            val ch = fmt.getChannels
            var sumAbs = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
            var i = 0
            while (i < s.length) {
              val v = s(i)
              sumAbs += math.abs(v.toLong)
              if (v < mn) mn = v
              if (v > mx) mx = v
              i += 1
            }
            val frames = s.length / ch
            var zc = 0L
            var k = 0
            while (k + 1 < frames) {
              val a = s(k * ch) >= 0
              val b = s((k + 1) * ch) >= 0
              if (a != b) zc += 1
              k += 1
            }
            AudioStats(m.media_id, fmt.getSampleRate.toInt, ch,
              fmt.getSampleSizeInBits, frames, sumAbs, zc,
              if (frames == 0) 0 else mn, if (frames == 0) 0 else mx)
          case None => AudioStats(m.media_id, 0, 0, 0, 0L, 0L, 0L, 0, 0)
        }
      }
    }
  }

  /** Video frame sampling: demux MJPEG, decode every Nth frame, emit
    * its feature vector with the frame's real byte offset. Containers
    * the JDK can't demux (MP4 etc.) produce zero rows. */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int = 30,
                   featureDim: Int = 16): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      Codec.splitMjpegFrames(m.content).zipWithIndex.collect {
        case ((offset, frameBytes), idx) if idx % everyN == 0 =>
          val feats = Codec.decode(frameBytes)
            .map(Codec.features(_, featureDim))
            .getOrElse(new Array[Float](featureDim))
          FrameSample(m.media_id, idx, offset, feats)
      }
    }
  }

  /** Real bilinear rescale (`java.awt.Graphics2D`) + re-encode.
    * Lossless inputs (PNG) re-encode as PNG; everything else as JPEG —
    * the reference bridge re-encodes JPEG after its cv2.resize
    * (rtsp_to_kafka_bridge.py:193-197). Undecodable payloads are
    * dropped (the bridge skips failed frames). */
  def resize(media: Dataset[MediaRow], width: Int, height: Int): Dataset[ResizedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        Codec.decode(m.content).map { img =>
          val targetType =
            if (img.getRaster.getNumBands == 1) BufferedImage.TYPE_BYTE_GRAY
            else BufferedImage.TYPE_3BYTE_BGR
          val out = new BufferedImage(width, height, targetType)
          val g = out.createGraphics()
          g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
            RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, width, height, null)
          g.dispose()
          val bytes =
            if (m.format == "png") Codec.encodePng(out) else Codec.encodeJpeg(out)
          ResizedImage(m.media_id, width, height, bytes)
        }
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

  /** Perceptual fingerprints for IMAGE near-dup: `(media_id, dhash)`
    * via [[Codec.dHash]] over the real decoded raster — one narrow
    * kernel pass, undecodable payloads dropped (the P4 degrade-not-
    * throw rule). Feed the result to
    * [[graft.operators.Dedup.signaturePairs]] for radius search at
    * corpus scale (pigeonhole banding, never all-pairs) — battery
    * q102 oracles the whole pipeline closed-form on synthetic
    * rasters with injected near-clones. */
  def imageDHash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap(r => Codec.decode(r.content)
        .map(img => (r.media_id, Codec.dHash(img))))
      .toDF("media_id", "dhash")
  }

  /** Per-video keyframe perceptual hashes: demux MJPEG
    * ([[Codec.splitMjpegFrames]]), keep every `everyN`-th frame, dHash
    * each decoded raster — `(media_id, frame_index, dhash)`. The
    * video-grain analog of [[imageDHash]]: one kernel pass per video,
    * undecodable frames dropped, containers the JDK can't demux
    * produce zero rows. */
  def videoKeyframeHashes(media: Dataset[MediaRow],
                          everyN: Int = 30): DataFrame = {
    import media.sparkSession.implicits._
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    media.flatMap { m =>
      Codec.splitMjpegFrames(m.content).zipWithIndex.collect {
        case ((_, fb), idx) if idx % everyN == 0 =>
          Codec.decode(fb).map(img => (m.media_id, idx, Codec.dHash(img)))
      }.flatten
    }.toDF("media_id", "frame_index", "dhash")
  }

  /** VIDEO near-duplicate pairs — a re-encoded / re-containered copy
    * of a clip matches its source even though not one byte of the
    * files agrees. Pure composition of existing pieces (zero new
    * similarity machinery): [[videoKeyframeHashes]] turns each video
    * into a keyframe-signature SET, frame-grain matches come from the
    * same pigeonhole banding every 64-bit signature family uses
    * ([[graft.operators.Dedup.signaturePairs]], keyed by
    * `(video, frame)` structs — never an all-pairs product), and a
    * per-video-pair rollup scores coverage: `matched_a`/`matched_b`
    * count each side's distinct keyframes with a within-`radius`
    * partner, and `match_milli = min(matched/total)·1000` (exact
    * integer floor) must reach `minMatchMilli`. A clone matches at
    * 1000; two clips sharing one stock shot score low and drop.
    *
    * Scale shape: banding is `radius+1` chunk-equality shuffles over
    * keyframe rows (corpus-linear), the rollup is one hash aggregate
    * on video pairs that actually shared a bucket, and the keyframe
    * counts join back at video grain — nothing quadratic, nothing
    * driver-side. Battery q112 oracles the pipeline on synthetic
    * MJPEG clips with injected re-encoded clones (measured: clone
    * keyframe distance 0, nearest cross-video keyframe 11 bits at
    * sf0.1 scale — radius 4 sits in a wide deterministic gap).
    * Output: `(video_a, video_b, matched_a, matched_b, match_milli)`
    * with `video_a < video_b`. */
  def videoNearDupPairs(media: Dataset[MediaRow], everyN: Int = 30,
                        radius: Int = 4,
                        minMatchMilli: Long = 600): DataFrame = {
    require(minMatchMilli >= 0 && minMatchMilli <= 1000,
      s"minMatchMilli must be in [0, 1000], got $minMatchMilli")
    // Round-17: pin the keyframe-hash frame — it feeds the banding
    // plus BOTH per-video count join-backs, and without the pin the
    // MJPEG demux + JPEG decode + dHash kernel re-ran once per branch
    // (4× per call measured at sf0.1). Narrow (id, index, hash) rows;
    // released with the session cache.
    val fh = videoKeyframeHashes(media, everyN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = fh.groupBy(col("media_id")).agg(count(lit(1)).as("__nf"))
    // (video, frame) struct ids order lexicographically, so the
    // banding's doc_a < doc_b already yields video_a <= video_b
    val fids = fh.select(
      struct(col("media_id"), col("frame_index")).as("doc_id"),
      col("dhash").as("sig"))
    val vp = graft.operators.Dedup.signaturePairs(fids, radius)
      .select(col("doc_a.media_id").as("video_a"),
        col("doc_a.frame_index").as("__fa"),
        col("doc_b.media_id").as("video_b"),
        col("doc_b.frame_index").as("__fb"))
      .filter(col("video_a") =!= col("video_b"))
      .groupBy("video_a", "video_b")
      .agg(countDistinct(col("__fa")).as("matched_a"),
        countDistinct(col("__fb")).as("matched_b"))
    vp.join(counts.toDF("video_a", "__na"), "video_a")
      .join(counts.toDF("video_b", "__nb"), "video_b")
      .withColumn("match_milli",
        least(expr("matched_a * 1000 div __na"),
          expr("matched_b * 1000 div __nb")))
      .filter(col("match_milli") >= minMatchMilli)
      .select("video_a", "video_b", "matched_a", "matched_b", "match_milli")
  }

  /** Audio near-dup fingerprints: `(media_id, afp)` via
    * [[Codec.audioFp]] over the real WAV decode — one narrow kernel
    * pass, undecodable payloads dropped. Radius search via
    * [[graft.operators.Dedup.signaturePairs]] (battery q104 oracles
    * the pipeline closed-form, amplitude-scaled clones landing at
    * Hamming 0). */
  def audioFingerprint(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap(r => Codec.decodeWav(r.content)
        .map { case (_, samples) => (r.media_id, Codec.audioFp(samples)) })
      .toDF("media_id", "afp")
  }

  // ------------------------------------- interleaved-doc trainer seam

  /** Reserved token id for an image slot in a multimodal token
    * sequence — NEGATIVE, so it provably never collides with
    * [[Bpe.tokenId]]'s id space (0 = separator, everything text is
    * ≥ 1). One id for every slot (the LLaVA-style convention): the
    * trainer swaps each occurrence for the image embedding at the
    * same ordinal in the sequence's lookaside list. */
  val ImagePlaceholderId: Long = -2L

  /** Tokenize INTERLEAVED documents ([[Html.interleavedDocs]]' q168
    * format: `<|image_N|>` placeholder LINES in the text flow plus an
    * aligned resolved-URL array) into the multimodal trainer's id
    * form: each text run between placeholders tokenizes under the
    * merge list with EXACTLY [[Bpe.tokenIds]]' semantics (normalize,
    * then per-word greedy BPE), and each placeholder line becomes ONE
    * [[ImagePlaceholderId]] token at its position in the flow — text
    * runs never merge across an image boundary. The refs array rides
    * through untouched (`image_refs`), ordinal-aligned with the
    * placeholder tokens. Output: `(id, token_ids, image_refs,
    * n_tokens, n_images)`; same scale shape as [[Bpe.tokenIds]] (rank
    * table broadcast via closure, one narrow pass, no shuffle). */
  def tokenizeInterleaved(docs: DataFrame, idCol: String, textCol: String,
                          urlsCol: String, merges: Seq[(String, String)],
                          imageId: Long = ImagePlaceholderId): DataFrame = {
    val mlist = merges.toIndexedSeq
    val rank = mlist.zipWithIndex.map { case (p, i) => p -> i }.toMap
    // first-rank-wins on output-string collisions (the Bpe.tokenIds
    // contract)
    val mergeId = mlist.zipWithIndex.reverse
      .map { case ((a, b), i) => (a + b) -> (2L + i) }.toMap
    val base = 2L + mlist.length
    val Placeholder = "<\\|image_\\d+\\|>".r
    val idsUdf = udf { (text: String) =>
      if (text == null) Array.empty[Long]
      else {
        val out = Array.newBuilder[Long]
        val run = new java.lang.StringBuilder
        def flushRun(): Unit = {
          val norm = Sketches.normalize(run.toString)
          if (norm.nonEmpty) norm.split(" ").foreach { w =>
            if (w.nonEmpty) Bpe.tokenizeWord(w, rank).foreach { t =>
              out += (if (t == "</w>") 1L
                      else mergeId.getOrElse(t, base + t.codePointAt(0)))
            }
          }
          run.setLength(0)
        }
        text.split("\n", -1).foreach { ln =>
          if (Placeholder.pattern.matcher(ln).matches()) {
            flushRun(); out += imageId
          } else {
            if (run.length > 0) run.append('\n')
            run.append(ln)
          }
        }
        flushRun()
        out.result()
      }
    }
    docs.select(col(idCol), idsUdf(col(textCol)).as("token_ids"),
        coalesce(col(urlsCol), array().cast("array<string>"))
          .as("image_refs"))
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))
      .withColumn("n_images",
        size(filter(col("token_ids"), t => t === imageId)).cast("long"))
  }
}
