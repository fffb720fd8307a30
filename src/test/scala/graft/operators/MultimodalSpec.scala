package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal._

  private def bytes(prefix: Array[Int], pad: Int = 64): Array[Byte] =
    (prefix.map(_.toByte) ++ Array.fill(pad)(7.toByte))

  private lazy val magicOnly = Seq(
    MediaRow(1L, bytes(Array(0xFF, 0xD8, 0xFF, 0xE0)), "jpeg"),
    MediaRow(2L, bytes(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)), "png"),
    MediaRow(3L, bytes(Array(0x47, 0x49, 0x46, 0x38, 0x39, 0x61)), "gif"),
    MediaRow(4L, bytes(Array(0x00, 0x00, 0x00, 0x18, 0x66, 0x74, 0x79, 0x70)), "mp4"),
    MediaRow(5L, bytes(Array(0x01, 0x02, 0x03)), "unknown"))

  // deterministic gradient: pixel (x, y) of image `id` has luminance
  // (x*3 + y*5 + id) % 256 — closed-form checkable, every bin exercised
  private def gradPng(id: Long, w: Int, h: Int): Array[Byte] =
    Codec.encodePng(Codec.grayImage(w, h)((x, y) => ((x * 3 + y * 5 + id) % 256).toInt))

  private lazy val realMedia = Seq(
    MediaRow(1L, gradPng(1L, 16, 12), "png"),
    MediaRow(2L, gradPng(2L, 23, 16), "png"),
    MediaRow(3L, Codec.encodeJpeg(Codec.grayImage(20, 10)((_, _) => 128)), "jpeg"),
    MediaRow(4L, bytes(Array(0xFF, 0xD8, 0xFF, 0xE0)), "jpeg")) // corrupt

  test("format sniffing from magic bytes (pure column expr)") {
    val got = magicOnly.toDS().toDF()
      .select($"media_id", sniffFormat($"content").as("fmt"))
      .orderBy("media_id").collect().map(_.getString(1))
    assert(got.toSeq == Seq("jpeg", "png", "gif", "mp4", "unknown"))
    // the codec's own emissions sniff correctly too
    val own = realMedia.take(3).toDS().toDF()
      .select(sniffFormat($"content")).collect().map(_.getString(0))
    assert(own.toSeq == Seq("png", "png", "jpeg"))
  }

  test("media table layout: metadata first, binary last, stable hash") {
    val t = mediaTable(magicOnly.toDS().toDF(), "media_id", "content")
    assert(t.columns.toSeq == Seq("media_id", "n_bytes", "format", "content_hash", "content"))
    val h1 = t.select("content_hash").collect().map(_.getLong(0)).toSeq
    val h2 = mediaTable(magicOnly.toDS().toDF(), "media_id", "content")
      .select("content_hash").collect().map(_.getLong(0)).toSeq
    assert(h1 == h2)
    val leaves = t.select("media_id", "format")
      .queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.nonEmpty &&
      leaves.forall(l => !l.output.map(_.name).contains("content")),
      leaves.map(_.output.map(_.name).mkString(",")).mkString(" | "))
  }

  test("real PNG decode: lossless pixel roundtrip, exact dims/channels") {
    val img = Codec.decode(gradPng(7L, 16, 12)).get
    assert(img.getWidth == 16 && img.getHeight == 12)
    assert(img.getRaster.getNumBands == 1)
    for (y <- 0 until 12; x <- 0 until 16)
      assert(Codec.luminance(img, x, y) == ((x * 3 + y * 5 + 7) % 256),
        s"pixel ($x,$y)")
  }

  test("extractImageFeatures: histogram features match exact bin counts; corrupt -> zero row") {
    val out = extractImageFeatures(realMedia.toDS(), featureDim = 64)
      .collect().sortBy(_.media_id)
    val png1 = out(0)
    assert(png1.width == 16 && png1.height == 12 && png1.channels == 1)
    assert(png1.features.length == 64)
    // features are the exact normalized histogram of the gradient image
    val counts = new Array[Long](64)
    for (y <- 0 until 12; x <- 0 until 16)
      counts(((x * 3 + y * 5 + 1) % 256) * 64 / 256) += 1
    png1.features.zip(counts).foreach { case (f, c) =>
      assert(math.abs(f - c.toDouble / 192) < 1e-6)
    }
    // JPEG is lossy but a constant-gray image decodes near-constant
    val jpg = out(2)
    assert(jpg.width == 20 && jpg.height == 10 && jpg.channels == 1)
    val midMass = jpg.features.slice(28, 36).sum // 128/256*64 = bin 32
    assert(midMass > 0.99, s"constant-128 JPEG mass near bin 32, got $midMass")
    // corrupt payload degrades to a zero row, never throws
    val bad = out(3)
    assert(bad.width == 0 && bad.height == 0 && bad.channels == 0)
    assert(bad.features.forall(_ == 0f))
  }

  test("imageStats: integer-exact pixel_sum / n_dark, consistent with features") {
    val stats = imageStats(realMedia.toDS()).collect().sortBy(_.media_id)
    val s2 = stats(1) // 23x16 gradient, id=2
    var expSum = 0L; var expDark = 0L
    for (y <- 0 until 16; x <- 0 until 23) {
      val v = (x * 3 + y * 5 + 2) % 256
      expSum += v; if (v < 32) expDark += 1
    }
    assert(s2.width == 23 && s2.height == 16 && s2.channels == 1)
    assert(s2.pixel_sum == expSum && s2.n_dark == expDark)
    // n_dark == mass of the first 8 of 64 feature bins (exactly)
    val feats = extractImageFeatures(realMedia.toDS(), featureDim = 64)
      .collect().sortBy(_.media_id).apply(1).features
    assert(math.abs(feats.take(8).sum - expDark.toDouble / (23 * 16)) < 1e-6)
    assert(stats(3).pixel_sum == 0L && stats(3).width == 0) // corrupt
  }

  test("MJPEG demux: real frame boundaries, every-Nth decode, real offsets") {
    val frames = (0 until 10).map(i => Codec.encodeJpeg(
      Codec.grayImage(8, 8)((x, y) => (x + y + i * 20) % 256)))
    val mjpeg = frames.reduce(_ ++ _)
    val video = Seq(MediaRow(9L, mjpeg, "mjpeg")).toDS()
    val got = sampleFrames(video, everyN = 3, featureDim = 16)
      .collect().sortBy(_.frame_index)
    assert(got.map(_.frame_index).toSeq == Seq(0, 3, 6, 9))
    // offsets are the true byte offsets of each frame's SOI marker
    val expOffsets = frames.map(_.length.toLong).scanLeft(0L)(_ + _)
    assert(got.map(_.offset_bytes).toSeq == Seq(0, 3, 6, 9).map(expOffsets(_)))
    // sampled features equal a direct decode of that frame
    got.foreach { fs =>
      val direct = Codec.features(
        Codec.decode(frames(fs.frame_index)).get, 16)
      assert(fs.features.toSeq == direct.toSeq)
    }
    // a container the JDK can't demux yields no fabricated frames
    val mp4 = Seq(MediaRow(10L, bytes(Array(0x00, 0x00, 0x00, 0x18, 0x66, 0x74, 0x79, 0x70), 2048), "mp4")).toDS()
    assert(sampleFrames(mp4, everyN = 1).count() == 0)
  }

  test("resize: real bilinear rescale, format preserved, deterministic") {
    val media = Seq(
      MediaRow(1L, gradPng(1L, 32, 24), "png"),
      MediaRow(2L, Codec.encodeJpeg(Codec.grayImage(40, 30)((_, _) => 200)), "jpeg"),
      MediaRow(3L, Array[Byte](1, 2, 3), "unknown")).toDS()
    val a = Multimodal.resize(media, 16, 12).collect().sortBy(_.media_id)
    val b = Multimodal.resize(media, 16, 12).collect().sortBy(_.media_id)
    assert(a.length == 2, "undecodable payloads are dropped, not fabricated")
    a.zip(b).foreach { case (x, y) =>
      assert(x.content.toSeq == y.content.toSeq, "resize must be deterministic")
      val img = Codec.decode(x.content).get
      assert(img.getWidth == 16 && img.getHeight == 12, "re-encoded at target dims")
    }
    // format routing: png stays png (lossless), jpeg re-encodes jpeg
    assert(a(0).content.take(4).map(_ & 0xff).toSeq == Seq(0x89, 0x50, 0x4e, 0x47))
    assert(a(1).content.take(3).map(_ & 0xff).toSeq == Seq(0xff, 0xd8, 0xff))
    // a constant-gray source resizes to (near-)constant gray
    val img2 = Codec.decode(a(1).content).get
    val vals = for (yy <- 0 until 12; xx <- 0 until 16) yield Codec.luminance(img2, xx, yy)
    assert(vals.forall(v => math.abs(v - 200) <= 6), s"got ${vals.min}..${vals.max}")
  }

  test("WAV codec: 16-bit stereo roundtrip is sample-exact through javax.sound") {
    // pseudo-random but deterministic samples spanning the int16 range,
    // interleaved L/R — decode must recover every sample and the header
    val samples = Array.tabulate(2 * 341)(i => ((i * 7919 + 13) % 65536) - 32768)
    val wav = Codec.encodeWav(44100f, 2, samples)
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF" &&
      new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val (fmt, got) = Codec.decodeWav(wav).get
    assert(fmt.getSampleRate == 44100f && fmt.getChannels == 2 &&
      fmt.getSampleSizeInBits == 16)
    assert(got.toSeq == samples.toSeq, "PCM samples must roundtrip exactly")
    // sniffFormat agrees it's a WAV container
    val sniffed = Seq((1L, wav)).toDF("id", "bin")
      .select(sniffFormat($"bin")).as[String].head()
    assert(sniffed == "wav")
  }

  test("WAV codec: 8-bit unsigned PCM decodes re-centered; corrupt bytes degrade") {
    // hand-rolled 8-bit unsigned mono WAV through the same javax.sound
    // writer the 16-bit path uses
    val vals = Array(0, 64, 128, 192, 255)
    val raw = vals.map(_.toByte)
    val fmt8 = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt8, vals.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val (fmt, got) = Codec.decodeWav(out.toByteArray).get
    assert(fmt.getSampleSizeInBits == 8)
    assert(got.toSeq == Seq(-128, -64, 0, 64, 127))
    assert(Codec.decodeWav(null).isEmpty &&
      Codec.decodeWav(Array.empty[Byte]).isEmpty &&
      Codec.decodeWav(bytes(Array(0x52, 0x49, 0x46, 0x46))).isEmpty)
  }

  test("audioStats: integer-exact stats match a brute-force pass; corrupt -> zero row") {
    val samples = Array.tabulate(500)(i => if ((i / 6) % 2 == 0) 900 else -901)
    val media = Seq(
      MediaRow(1L, Codec.encodeWav(8000f, 1, samples), "wav"),
      MediaRow(2L, bytes(Array(0x52, 0x49, 0x46, 0x46)), "wav")).toDS()
    val got = audioStats(media).collect().sortBy(_.media_id)
    val brute = samples.map(v => math.abs(v.toLong)).sum
    val zc = (0 until samples.length - 1)
      .count(i => (samples(i) >= 0) != (samples(i + 1) >= 0))
    assert(got(0) == AudioStats(1L, 8000, 1, 16, 500, brute, zc.toLong, -901, 900),
      s"got ${got(0)}")
    assert(got(1) == AudioStats(2L, 0, 0, 0, 0L, 0L, 0L, 0, 0))
  }

  test("pipeline: decoded image features feed the similarity operators directly") {
    val media = (1L to 6L).map(i => MediaRow(i, gradPng(i * 37, 16, 16), "png")).toDS()
    val feats = extractImageFeatures(media, featureDim = 16)
      .select($"media_id".as("vec_id"), $"features".as("embedding"))
    val q = feats.filter($"vec_id" === 1L).select("embedding")
      .collect().head.getSeq[Float](0)
    val top = graft.operators.Similarity.bruteForceTopK(
      feats, "vec_id", "embedding", q, k = 3).collect()
    assert(top.head.getLong(0) == 1L, "query image ranks itself first")
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-6)
  }

  test("dHash: deterministic through the PNG roundtrip; clones near, distinct textures far") {
    def tex(id: Long, off: Long): MediaRow = {
      val w = 16 + (id % 8).toInt; val h = 12 + (id % 5).toInt
      val c = 1 + (id % 5)
      MediaRow(if (off == 0) id else id + 100000,
        Codec.encodePng(Codec.grayImage(w, h)(
          (x, y) => ((3L * x * x + 7L * y * y + c * x * y + 29L * id + off) % 256L).toInt)),
        "png")
    }
    // in-memory hash == hash after encode/decode (lossless PNG, exact sampling)
    val img = Codec.grayImage(20, 15)((x, y) => (x * x + 3 * y) % 256)
    assert(Codec.dHash(img) ==
      Codec.dHash(Codec.decode(Codec.encodePng(img)).get))
    // +1 brightness clone lands within 6 bits; distinct textures don't
    val rows = (0L until 12L).flatMap(i => Seq(tex(i, 0), tex(i, 1))).toDS()
    val hs = imageDHash(rows).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    (0L until 12L).foreach { i =>
      assert(ham(hs(i), hs(i + 100000)) <= 6, s"clone of $i drifted")
    }
    val cross = for (i <- 0L until 12L; j <- i + 1 until 12L)
      yield ham(hs(i), hs(j))
    assert(cross.min >= 10, s"distinct textures collided: ${cross.min}")
    // undecodable payloads drop, not throw
    val bad = Seq(MediaRow(1L, Array[Byte](1, 2, 3), "png"),
      tex(5L, 0)).toDS()
    assert(imageDHash(bad).count() == 1L)
    // banding finds exactly the clone pairs at radius 6
    val pairs = graft.operators.Dedup.signaturePairs(
      imageDHash(rows).select($"media_id".as("doc_id"), $"dhash".as("sig")),
      radius = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (0L until 12L).map(i => (i, i + 100000)).toSet, s"$pairs")
  }

  test("videoKeyframeHashes: everyN selection, truncated tail frame dropped") {
    // the decisive step-walk texture (±12 margins, JPEG-proof)
    def frame(bits: Long): Array[Byte] = Codec.encodeJpeg(
      Codec.grayImage(36, 16) { (x, y) =>
        var v = 128
        var i = 0
        while (i < x / 4) {
          v += (if (((bits >> (y / 2 * 8 + i)) & 1L) == 1L) 12 else -12)
          i += 1
        }
        v
      })
    def mjpeg(frames: Seq[Long], truncateTail: Boolean = false): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      frames.foreach(b => bos.write(frame(b)))
      val full = bos.toByteArray
      if (truncateTail) full.dropRight(10) else full
    }
    val media = Seq(
      MediaRow(1L, mjpeg(Seq(1L, 2L, 3L, 4L, 5L)), "jpg"),
      MediaRow(2L, mjpeg(Seq(1L, 2L, 3L), truncateTail = true), "jpg")
    ).toDS()
    val got = Multimodal.videoKeyframeHashes(media, everyN = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // video 1: keyframes 0, 2, 4; video 2: frame 2 truncated, so its
    // keyframes stop at 0 (frame 1 is off-stride)
    assert(got == Set((1L, 0), (1L, 2), (1L, 4), (2L, 0)), got.toString)
    // the hash is the walk's bit pattern, JPEG noise ≤ 1 bit (measured)
    val h = Multimodal.videoKeyframeHashes(media, everyN = 1)
      .filter(col("media_id") === 1L && col("frame_index") === 0)
      .head().getLong(2)
    assert(java.lang.Long.bitCount(h ^ 1L) <= 1, s"walk bits drifted: $h")
  }

  test("videoNearDupPairs: clones at full coverage, partial overlap thresholds both ways") {
    def frame(bits: Long): Array[Byte] = Codec.encodeJpeg(
      Codec.grayImage(36, 16) { (x, y) =>
        var v = 128
        var i = 0
        while (i < x / 4) {
          v += (if (((bits >> (y / 2 * 8 + i)) & 1L) == 1L) 12 else -12)
          i += 1
        }
        v
      })
    def mjpeg(frames: Seq[Long]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      frames.foreach(b => bos.write(frame(b)))
      bos.toByteArray
    }
    def reencode(v: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      Codec.splitMjpegFrames(v).foreach { case (_, fb) =>
        bos.write(Codec.encodeJpeg(Codec.decode(fb).get))
      }
      bos.toByteArray
    }
    // distinctive per-frame patterns: random-looking 64-bit walks
    val p = (1 to 6).map(i => Sketches.mix64(i * 977L))
    val a = mjpeg(Seq(p(0), p(1), p(2), p(3)))
    val media = Seq(
      MediaRow(1L, a, "jpg"),
      MediaRow(2L, reencode(a), "jpg"),                   // full clone
      MediaRow(3L, mjpeg(Seq(p(0), p(1), p(4), p(5))), "jpg"), // half overlap
      MediaRow(4L, mjpeg(Seq(p(0), p(0))), "jpg")         // 2 frames, both = a's first
    ).toDS()
    def pairs(minMilli: Long) =
      Multimodal.videoNearDupPairs(media, everyN = 1, radius = 4,
          minMatchMilli = minMilli)
        .collect().map(r => ((r.getLong(0), r.getLong(1)),
          (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val all = pairs(0L)
    assert(all((1L, 2L)) == ((4L, 4L, 1000L)), s"clone pair wrong: $all")
    assert(all((1L, 3L)) == ((2L, 2L, 500L)))
    assert(all((2L, 3L)) == ((2L, 2L, 500L)))   // clone matches the overlap too
    // asymmetric coverage: min side gates — video 4 covers itself fully
    // (2/2) but only 1 of video 1's 4 keyframes
    assert(all((1L, 4L)) == ((1L, 2L, 250L)))
    // threshold live in both directions around the half-overlap pair
    assert(pairs(500L).contains((1L, 3L)))
    assert(!pairs(501L).contains((1L, 3L)))
    assert(pairs(501L).contains((1L, 2L)))
    intercept[IllegalArgumentException](
      Multimodal.videoNearDupPairs(media, minMatchMilli = 1001L))
  }

  test("audioFp: scale-invariant through the WAV roundtrip; short signals are zero") {
    def wav(id: Long, sc: Int): Array[Int] = {
      val n = 800 + (id % 13).toInt * 16
      val half = 4 + (id % 5).toInt
      Array.tabulate(n) { i =>
        val mag = 1000 + (i * (1 + (id % 11).toInt)) % 23
        (if ((i / half) % 2 == 0) mag else -(mag + 1)) * sc
      }
    }
    // in-memory == decoded-from-bytes (lossless 16-bit PCM)
    val s0 = wav(3L, 1)
    val rt = Codec.decodeWav(Codec.encodeWav(8000f, 1, s0)).get._2
    assert(Codec.audioFp(s0) == Codec.audioFp(rt))
    // uniform amplitude scaling never moves a bit
    (0L until 10L).foreach { id =>
      assert(Codec.audioFp(wav(id, 1)) == Codec.audioFp(wav(id, 2)),
        s"fingerprint of id $id moved under amplitude scaling")
    }
    assert(Codec.audioFp(Array.fill(63)(5)) == 0L)
    assert(Codec.audioFp(null) == 0L)
    // the Dataset surface drops undecodable payloads
    val media = Seq(
      MediaRow(1L, Codec.encodeWav(8000f, 1, wav(1L, 1)), "wav"),
      MediaRow(2L, Array[Byte](9, 9, 9), "wav")).toDS()
    assert(audioFingerprint(media).count() == 1L)
  }

  test("tokenizeInterleaved: runs tokenize exactly like Bpe.tokenIds, placeholders become one reserved id, boundaries never merge") {
    import spark.implicits._
    val merges = Seq(("t", "h"), ("i", "n"), ("e", "</w>"))
    val IM = Multimodal.ImagePlaceholderId
    def ids(t: String, urls: Seq[String] = Seq.empty): Seq[Long] =
      Multimodal.tokenizeInterleaved(
          Seq((1L, t, urls)).toDF("doc_id", "itext", "urls"),
          "doc_id", "itext", "urls", merges)
        .select("token_ids").as[Seq[Long]].head()
    // a placeholder-free doc tokenizes IDENTICALLY to Bpe.tokenIds
    val plain = "the thin line"
    val viaBpe = Bpe.tokenIds(Seq((1L, plain)).toDF("doc_id", "text"),
        "doc_id", "text", merges)
      .select("token_ids").as[Seq[Long]].head()
    assert(ids(plain) == viaBpe, s"${ids(plain)} != $viaBpe")
    // placeholder LINES become exactly one reserved id at position
    assert(ids("the\n<|image_0|>\nthe", Seq("u")) ==
      Seq(2L, 4L, IM, 2L, 4L))
    // runs do NOT merge across an image boundary: "th" split by a
    // placeholder stays t + h base ids, never the th merge
    val split = ids("t\n<|image_0|>\nh", Seq("u"))
    assert(split == Seq(5L + 't'.toInt, 1L, IM, 5L + 'h'.toInt, 1L),
      split.toString)
    // a line CONTAINING but not EQUAL to a placeholder is text (the
    // normalize pass strips the punctuation shell)
    assert(!ids("x <|image_0|> y").contains(IM))
    // n_images counts placeholders; refs ride through; NULL text is
    // the empty doc
    val r = Multimodal.tokenizeInterleaved(
        Seq((1L, "<|image_0|>\nthe\n<|image_1|>", Seq("a", "b")))
          .toDF("doc_id", "itext", "urls"),
        "doc_id", "itext", "urls", merges)
      .select("n_tokens", "n_images", "image_refs")
      .as[(Long, Long, Seq[String])].head()
    assert(r == ((4L, 2L, Seq("a", "b"))), r.toString)
    assert(Multimodal.tokenizeInterleaved(
        Seq((1L, null.asInstanceOf[String], Seq.empty[String]))
          .toDF("doc_id", "itext", "urls"),
        "doc_id", "itext", "urls", merges)
      .select("n_tokens").as[Long].head() == 0L)
  }
}
