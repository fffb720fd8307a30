package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Warc]] — segment parsing. Framing is pinned byte-exactly on
  * hand-built segments, including the cases separator-scanners get
  * wrong (record terminators INSIDE payloads). */
class WarcSpec extends SparkSpec {

  private def ascii(s: String) = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  test("roundtrip: build → parse recovers every field and exact body bytes") {
    val html = ascii("<html><body><p>hello warc</p></body></html>")
    val seg = Warc.buildSegment(Seq(
      ("warcinfo", null, ascii("software: graft\r\n")),
      ("request", "http://a.com/x", ascii("GET /x HTTP/1.1\r\nHost: a.com\r\n\r\n")),
      ("response", "http://a.com/x", Warc.httpResponse(html))))
    val recs = Warc.parseSegment("seg0", seg)
    assert(recs.map(r => (r.record_index, r.warc_type, r.target_uri)) == Seq(
      (0, "warcinfo", null), (1, "request", "http://a.com/x"),
      (2, "response", "http://a.com/x")))
    // non-response records carry no http side but keep their RAW payload
    assert(recs(0).http_status.isEmpty && recs(1).http_status.isEmpty)
    assert(new String(recs(0).body, "ISO-8859-1") == "software: graft\r\n")
    assert(new String(recs(1).body, "ISO-8859-1")
      .startsWith("GET /x HTTP/1.1"))
    val resp = recs(2)
    assert(resp.http_status.contains(200))
    assert(resp.http_content_type.contains("text/html"))
    assert(resp.body.toSeq == html.toSeq, "body bytes must round-trip exactly")
    assert(resp.warc_date == "2026-01-01T00:00:00Z")
  }

  test("content-length framing: record terminators inside payloads do not split records") {
    // the payload contains '\r\n\r\nWARC/1.0' — a separator scanner
    // would cut here; length framing must not
    val evil = ascii("binary\r\n\r\nWARC/1.0\r\nnot a real record")
    val seg = Warc.buildSegment(Seq(
      ("response", "http://a.com/1", Warc.httpResponse(evil)),
      ("response", "http://a.com/2", Warc.httpResponse(ascii("tail")))))
    val recs = Warc.parseSegment("s", seg)
    assert(recs.length == 2, recs.map(_.target_uri).toString)
    assert(recs(0).body.toSeq == evil.toSeq)
    assert(new String(recs(1).body, "ISO-8859-1") == "tail")
  }

  test("gzip: whole-file and concatenated per-record members both decompress") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    val r1 = Warc.buildSegment(Seq(("response", "http://a.com/1",
      Warc.httpResponse(ascii("one")))))
    val r2 = Warc.buildSegment(Seq(("response", "http://a.com/2",
      Warc.httpResponse(ascii("two")))))
    // whole-file gzip
    val whole = Warc.parseSegment("w", gz(r1 ++ r2))
    assert(whole.map(_.target_uri) == Seq("http://a.com/1", "http://a.com/2"))
    // CommonCrawl-style: one gzip MEMBER per record, concatenated
    val members = Warc.parseSegment("m", gz(r1) ++ gz(r2))
    assert(members.map(_.target_uri) == Seq("http://a.com/1", "http://a.com/2"))
  }

  test("torn tails degrade: parsed prefix survives truncation and header garbage") {
    val seg = Warc.buildSegment(Seq(
      ("response", "http://a.com/1", Warc.httpResponse(ascii("good"))),
      ("response", "http://a.com/2", Warc.httpResponse(ascii("lost")))))
    val torn = java.util.Arrays.copyOfRange(seg, 0, seg.length - 30)
    val recs = Warc.parseSegment("t", torn)
    assert(recs.map(_.target_uri) == Seq("http://a.com/1"),
      "truncation must keep the parsed prefix, not throw")
    // garbage instead of a version line: zero records, no throw
    assert(Warc.parseSegment("g", ascii("not a warc at all")).isEmpty)
    // torn HTTP block inside a well-framed record: record surfaces,
    // http side nulls
    val tornHttp = Warc.buildSegment(Seq(
      ("response", "http://a.com/3", ascii("HTTP/1.1 200 OK\r\nNo-Terminator: x"))))
    val r3 = Warc.parseSegment("h", tornHttp)
    assert(r3.length == 1 && r3.head.http_status.contains(200))
  }

  test("parseStream is incremental: one record pulled reads ~one buffer, not the segment") {
    val body = ascii("A" * 10000)
    val seg = Warc.buildSegment((0 until 100).map(i =>
      ("response", s"http://a.com/$i", Warc.httpResponse(body))))
    assert(seg.length > 1000000)
    var consumed = 0L
    val counting = new java.io.FilterInputStream(
        new java.io.ByteArrayInputStream(seg)) {
      override def read(): Int =
        { val r = super.read(); if (r >= 0) consumed += 1; r }
      override def read(b: Array[Byte], off: Int, len: Int): Int =
        { val r = super.read(b, off, len); if (r > 0) consumed += r; r }
    }
    val it = Warc.parseStream("s", counting)
    assert(it.hasNext)
    assert(it.next().target_uri == "http://a.com/0")
    // one 64 KiB read buffer's worth, give or take — NOT the megabyte
    assert(consumed < seg.length / 4,
      s"streaming parser read $consumed of ${seg.length} bytes for one record")
    assert(it.size == 99, "remaining records still parse lazily")
  }

  test("a corrupt multi-GiB Content-Length degrades instead of allocating") {
    val good = Warc.buildSegment(Seq(
      ("response", "http://a.com/1", Warc.httpResponse(ascii("ok")))))
    val bad = ascii("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 99999999999\r\n\r\n")
    val recs = Warc.parseSegment("s", good ++ bad)
    assert(recs.map(_.target_uri) == Seq("http://a.com/1"),
      "over-limit record must stop parsing, keep the prefix, never allocate")
  }

  test("writeTextSegments: streamed WET export roundtrips byte-exactly and audits clean") {
    import spark.implicits._
    val dir = graft.sources.Scratch.dir("graft_wet").toString + "/wet"
    val docs = (0 until 50).map(i =>
      (s"https://h${i % 3}.com/d$i", s"text body $i with ā unicode"))
      .toDF("uri", "text").repartition(4)
    graft.sources.Warc.writeTextSegments(docs, "uri", "text", dir)
    val back = Warc.readWarc(spark, dir)
    // one warcinfo per non-empty segment, 50 conversion records
    val byType = back.groupBy("warc_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType("conversion") == 50L, byType.toString)
    assert(byType("warcinfo") <= 4L && byType("warcinfo") >= 1L)
    // text roundtrips through UTF-8 bytes exactly
    val got = back.filter(col("warc_type") === "conversion")
      .select(col("target_uri"),
        graft.operators.Charset.decodeText(col("body"),
          lit(null).cast("string")).getField("text").as("t"))
      .as[(String, String)].collect().toMap
    assert(got.size == 50)
    (0 until 50).foreach(i => assert(
      got(s"https://h${i % 3}.com/d$i") == s"text body $i with ā unicode"))
    // audit: clean, then a gutted segment flags
    assert(Warc.auditTextSegments(spark, dir).filter(!col("ok")).isEmpty)
    val seg = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    seg.delete()
    val audited = Warc.auditTextSegments(spark, dir)
    assert(audited.filter(!col("ok")).count() == 1,
      "exactly the lost segment must flag")
  }

  test("HTTP transfer/content decoding: chunked, gzip, deflate, chunked+gzip") {
    val text = ascii("<html><body>" + ("the decoded page body " * 40) + "</body></html>")
    def parse(payload: Array[Byte]) =
      Warc.parseSegment("s", Warc.buildSegment(Seq(
        ("response", "http://a.com/x", payload)))).head
    // chunked alone (3 chunks + terminal)
    val chunked = parse(Warc.httpResponseWith(
      Warc.encodeChunked(text, chunkSize = 300),
      extraHeaders = Seq("Transfer-Encoding: chunked")))
    assert(chunked.body.toSeq == text.toSeq, "chunked body must de-frame")
    // gzip content coding
    val gzipped = parse(Warc.httpResponseWith(Warc.gzipBytes(text),
      extraHeaders = Seq("Content-Encoding: gzip")))
    assert(gzipped.body.toSeq == text.toSeq, "gzip body must decompress")
    // zlib AND raw deflate (servers send both under the same label)
    val zlib = parse(Warc.httpResponseWith(Warc.deflateBytes(text),
      extraHeaders = Seq("Content-Encoding: deflate")))
    assert(zlib.body.toSeq == text.toSeq, "zlib deflate body must decompress")
    val rawDef = parse(Warc.httpResponseWith(Warc.deflateBytes(text, raw = true),
      extraHeaders = Seq("Content-Encoding: deflate")))
    assert(rawDef.body.toSeq == text.toSeq, "raw deflate body must decompress")
    // chunked OVER gzip: transfer coding strips first, then content
    val both = parse(Warc.httpResponseWith(
      Warc.encodeChunked(Warc.gzipBytes(text), chunkSize = 100),
      extraHeaders = Seq("Content-Encoding: gzip",
        "Transfer-Encoding: chunked")))
    assert(both.body.toSeq == text.toSeq, "chunked+gzip must decode both layers")
    // unknown coding surfaces the raw bytes, never throws
    val br = parse(Warc.httpResponseWith(ascii("opaque-brotli-bytes"),
      extraHeaders = Seq("Content-Encoding: br")))
    assert(new String(br.body, "ISO-8859-1") == "opaque-brotli-bytes")
  }

  test("torn chunk frames degrade to the decoded prefix, never throw") {
    val text = ascii("0123456789" * 20) // 200 bytes
    val framed = Warc.encodeChunked(text, chunkSize = 80)
    // tear mid-chunk: cut the frame 30 bytes into the second chunk's data
    val cut = framed.take(4 + 80 + 2 + 4 + 30) // "50\r\n"+data+"\r\n"+"50\r\n"+30
    val rec = Warc.parseSegment("s", Warc.buildSegment(Seq(
      ("response", "http://a.com/x", Warc.httpResponseWith(cut,
        extraHeaders = Seq("Transfer-Encoding: chunked")))))).head
    assert(new String(rec.body, "ISO-8859-1") ==
      new String(text.take(110), "ISO-8859-1"),
      "torn chunk must keep the 80+30 bytes that exist")
    // a garbage size line stops at what decoded so far
    val garbage = Warc.encodeChunked(text.take(80), chunkSize = 80)
      .dropRight(5) ++ ascii("ZZZ\r\n\r\n")
    val rec2 = Warc.parseSegment("s", Warc.buildSegment(Seq(
      ("response", "http://a.com/x", Warc.httpResponseWith(garbage,
        extraHeaders = Seq("Transfer-Encoding: chunked")))))).head
    assert(new String(rec2.body, "ISO-8859-1").startsWith(
      new String(text.take(80), "ISO-8859-1")))
  }

  test("X-Robots-Tag surfaces (repeats list-join); verdicts parse tokens, scopes, none") {
    import spark.implicits._
    def parse(hdrs: Seq[String]) =
      Warc.parseSegment("s", Warc.buildSegment(Seq(("response",
        "http://a.com/x", Warc.httpResponseWith(ascii("b"),
          extraHeaders = hdrs))))).head.http_x_robots
    assert(parse(Nil).isEmpty, "absent header stays NULL")
    assert(parse(Seq("X-Robots-Tag: noindex")).contains("noindex"))
    // a proxy adding its header next to the origin's: list-join
    assert(parse(Seq("X-Robots-Tag: noindex", "x-robots-tag: nofollow"))
      .contains("noindex, nofollow"))
    // verdicts: Column-level, codegen-only
    val got = Seq(
      ("noindex, nofollow"), (" NoIndex "), ("none"),
      ("googlebot: nofollow"), ("unavailable_after: 1 Jan 2027"),
      ("index, follow"), (null: String),
      // HTAB is legal RFC 9110 optional whitespace around list members
      ("noindex,\tnofollow"))
      .toDF("h")
      .select(Warc.xRobotsVerdicts(col("h")).as("v"))
      .select("v.noindex", "v.nofollow")
      .as[(Boolean, Boolean)].collect().toSeq
    assert(got == Seq((true, true), (true, false), (true, true),
      (false, true), (false, false), (false, false), (false, false),
      (true, true)),
      got.toString)
  }

  test("redirects surface http_location; content pages leave it NULL") {
    val seg = Warc.buildSegment(Seq(
      ("response", "http://a.com/old", Warc.httpResponseWith(Array.empty[Byte],
        status = "301 Moved Permanently",
        extraHeaders = Seq("Location: https://a.com/new"))),
      ("response", "http://a.com/page", Warc.httpResponse(ascii("<p>x</p>")))))
    val recs = Warc.parseSegment("s", seg)
    assert(recs(0).http_status.contains(301))
    assert(recs(0).http_location.contains("https://a.com/new"))
    assert(recs(1).http_location.isEmpty)
  }

  test("WET gzip segments are per-record members — any record boundary decompresses in isolation") {
    import spark.implicits._
    val dir = graft.sources.Scratch.dir("graft_wetm").toString + "/wet"
    val docs = (0 until 10).map(i => (s"https://h.com/d$i", s"member body $i"))
      .toDF("uri", "text").repartition(1)
    Warc.writeTextSegments(docs, "uri", "text", dir)
    val segFile = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    val bytes = java.nio.file.Files.readAllBytes(segFile.toPath)
    // the JDK gzip member header is a fixed 10-byte prefix — count
    // member starts: one per record plus the warcinfo lead
    val hdr = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 0, 0, 0, 0, 0)
    val starts = (0 to bytes.length - hdr.length)
      .filter(off => hdr.indices.forall(j => bytes(off + j) == hdr(j)))
    assert(starts.size == 11, s"expected 11 gzip members, found ${starts.size}")
    // a member decompressed IN ISOLATION yields exactly one record
    val second = java.util.Arrays.copyOfRange(bytes, starts(1), starts(2))
    val alone = Warc.parseSegment("m", second)
    assert(alone.length == 1 && alone.head.warc_type == "conversion",
      s"member 1 alone parsed ${alone.length} records")
    assert(new String(alone.head.body, "UTF-8") == "member body 0")
    // and no temp files survived the commit protocol
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith("_tmp-")))
  }

  test("WARC-Payload-Digest surfaces; sha1Base32 matches the CommonCrawl form") {
    // the canonical known answer: SHA-1 of the EMPTY payload in
    // RFC 4648 base32 — the digest every crawler emits for 0-byte
    // bodies, quoted verbatim across WARC tooling
    assert(Warc.sha1Base32(Array.empty[Byte]) ==
      "sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")
    val body = ascii("<p>digest me</p>")
    val seg = Warc.buildSegmentWithHeaders(Seq(
      ("response", "http://a.com/x", Warc.httpResponse(body),
        Seq(s"WARC-Payload-Digest: ${Warc.sha1Base32(body)}")),
      ("revisit", "http://a.com/x2", Array.empty[Byte],
        Seq(s"WARC-Payload-Digest: ${Warc.sha1Base32(body)}")),
      ("response", "http://a.com/y", Warc.httpResponse(ascii("other")),
        Seq.empty[String])))
    val recs = Warc.parseSegment("s", seg)
    assert(recs(0).payload_digest.contains(Warc.sha1Base32(body)))
    // the digest the header carries is the digest of the PARSED body
    assert(recs(0).payload_digest.contains(Warc.sha1Base32(recs(0).body)))
    assert(recs(1).warc_type == "revisit" &&
      recs(1).payload_digest == recs(0).payload_digest)
    assert(recs(2).payload_digest.isEmpty, "undigested record must stay NULL")
  }

  test("readWarc: one row per record over real segment files") {
    val dir = graft.sources.Scratch.dir("graft_warc").toString
    (0 until 3).foreach { i =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, f"seg-$i%05d.warc"),
        Warc.buildSegment(Seq(
          ("warcinfo", null, ascii("software: graft\r\n")),
          ("response", s"http://site$i.com/p",
            Warc.httpResponse(ascii(s"<p>doc $i</p>"))))))
    }
    val df = Warc.readWarc(spark, dir)
    assert(df.count() == 6)
    val got = df.filter(col("warc_type") === "response")
      .select(col("target_uri"),
        col("body").cast("string").as("b"), col("http_status"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got == (0 until 3).map(i =>
      (s"http://site$i.com/p", s"<p>doc $i</p>", 200)).toSet)
  }

  // ---- CDX capture indexing ----

  test("cdx: plain segment records tile the file byte-exactly") {
    val segs = Seq[(String, String, Array[Byte])](
      ("warcinfo", null, ascii("software: graft\r\n")),
      ("response", "http://a.com/1", Warc.httpResponse(ascii("one"))),
      ("response", "http://a.com/2", Warc.httpResponse(ascii("two"))))
    val whole = Warc.buildSegment(segs)
    val rows = Warc.indexSegment("dir/seg.warc",
      new java.io.ByteArrayInputStream(whole)).toSeq
    assert(rows.map(_.warc_type) == Seq("warcinfo", "response", "response"))
    assert(rows.head.offset == 0L)
    rows.sliding(2).foreach {
      case Seq(a, b) => assert(a.offset + a.comp_length == b.offset,
        "records must tile with no gap")
      case _ => ()
    }
    assert(rows.last.offset + rows.last.comp_length == whole.length.toLong)
    // each span is exactly the single-record build of that record
    assert(rows.map(_.comp_length) ==
      segs.map(s => Warc.buildSegment(Seq(s)).length.toLong))
    assert(rows.map(_.member_index) == Seq(0, 1, 2))
    assert(rows.forall(_.member_record_index == 0))
    assert(rows(1).status.contains(200) &&
      rows(1).mime.contains("text/html"))
    // no stamped digest → computed over the STORED payload body
    // (identity-encoded here, so it equals the surfaced body's hash)
    assert(rows(1).digest.contains(Warc.sha1Base32(ascii("one"))))
  }

  test("cdx: per-record gzip members tile the file and ranged fetch round-trips") {
    import spark.implicits._
    val dir = graft.sources.Scratch.dir("graft_cdx").toString + "/wet"
    val df = (0 until 40)
      .map(i => (s"https://www.site${i % 4}.example.com/p$i", s"text number $i"))
      .toDF("uri", "text").repartition(3)
    Warc.writeTextSegments(df, "uri", "text", dir, gzip = true)
    val cdx = Warc.cdxIndex(spark, dir)
    val all = cdx.collect()
    all.groupBy(_.getAs[String]("filename")).foreach { case (name, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("offset"))
      assert(sorted.head.getAs[Long]("offset") == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("offset") + a.getAs[Long]("comp_length") ==
            b.getAs[Long]("offset"), s"$name members must tile")
        case _ => ()
      }
      val size = new java.io.File(dir, name).length
      assert(sorted.last.getAs[Long]("offset") +
        sorted.last.getAs[Long]("comp_length") == size,
        s"$name last member must end at EOF")
      // per-record members: exactly one record per member
      assert(rs.forall(_.getAs[Int]("member_record_index") == 0))
    }
    // urlkey is the SURT form (www stripped, host reversed)
    val keys = cdx.filter(col("warc_type") === "conversion")
      .select("urlkey").as[String].collect()
    assert(keys.length == 40 &&
      keys.forall(_.startsWith("com,example,site")))
    // ranged fetch: every conversion record returns its exact text
    val fetched = Warc.fetchByCdx(
        cdx.filter(col("warc_type") === "conversion"), dir)
      .select(col("url"), col("body").cast("string").as("t"),
        col("digest_ok"))
      .collect()
    assert(fetched.length == 40)
    fetched.foreach { r =>
      val i = r.getString(0).substring(r.getString(0).indexOf("/p") + 2).toInt
      assert(r.getString(1) == s"text number $i")
      assert(r.getBoolean(2))
    }
  }

  test("cdx: whole-file gzip is one member; member_record_index addresses within it") {
    val seg = Warc.buildSegment(Seq(
      ("response", "http://a.com/1", Warc.httpResponse(ascii("one"))),
      ("response", "http://a.com/2", Warc.httpResponse(ascii("two")))))
    val gz = Warc.gzipBytes(seg)
    val rows = Warc.indexSegment("d/s.warc.gz",
      new java.io.ByteArrayInputStream(gz)).toSeq
    assert(rows.length == 2)
    assert(rows.forall(r => r.offset == 0L && r.comp_length == gz.length.toLong))
    assert(rows.map(_.member_record_index) == Seq(0, 1))
    // fetch the SECOND record out of the shared member by index
    val dir = graft.sources.Scratch.dir("graft_cdx1").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "s.warc.gz"), gz)
    val cdxDf = spark.createDataFrame(rows.filter(_.member_record_index == 1))
    val f = Warc.fetchByCdx(cdxDf, dir).collect().head
    assert(f.getAs[String]("url") == "http://a.com/2")
    assert(new String(f.getAs[Array[Byte]]("body"), "ISO-8859-1") == "two")
  }

  test("appendToCdxTable: filename-keyed skip — new segments index, replays no-op") {
    import spark.implicits._
    val dir = graft.sources.Scratch.dir("graft_cdxt").toString
    def writeSeg(i: Int): Unit = java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, f"seg-$i%03d.warc"),
      Warc.buildSegment(Seq(("response", s"http://a.com/$i",
        Warc.httpResponse(ascii(s"b$i"))))))
    writeSeg(1); writeSeg(2)
    val tbl = "graft_test_cdx_tbl"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS ${tbl}_segments")
    Warehouse.clearOrphanLocation(spark, tbl)
    Warehouse.clearOrphanLocation(spark, s"${tbl}_segments")
    assert(Warc.appendToCdxTable(spark, tbl, dir) == 2L)
    assert(spark.table(tbl).count() == 2)
    assert(Warc.appendToCdxTable(spark, tbl, dir) == 0L,
      "whole-archive replay must absorb nothing")
    writeSeg(3)
    assert(Warc.appendToCdxTable(spark, tbl, dir) == 1L,
      "only the newly landed segment indexes")
    assert(spark.table(tbl).count() == 3)
    // the companion marker table carries one row per absorbed segment
    assert(spark.table(s"${tbl}_segments").count() == 3)
    // the catalog serves ranged reads like a fresh index
    val urls = Warc.fetchByCdx(spark.table(tbl), dir)
      .select("url").as[String].collect().toSet
    assert(urls == Set("http://a.com/1", "http://a.com/2", "http://a.com/3"))
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS ${tbl}_segments")
  }

  test("appendToCdxTable: a zero-row segment is remembered, not re-read forever") {
    val dir = graft.sources.Scratch.dir("graft_cdxz").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "seg-001.warc"),
      Warc.buildSegment(Seq(("response", "http://a.com/1",
        Warc.httpResponse(ascii("b1"))))))
    // a 0-byte segment (clean EOF at byte 0): indexes to zero rows
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "seg-002.warc"), Array.empty[Byte])
    // corrupt from byte 0: indexes to ONE row — the truncation sentinel
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "seg-003.warc"),
      "not a warc at all".getBytes("ISO-8859-1"))
    val tbl = "graft_test_cdx_zero"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS ${tbl}_segments")
    Warehouse.clearOrphanLocation(spark, tbl)
    Warehouse.clearOrphanLocation(spark, s"${tbl}_segments")
    assert(Warc.appendToCdxTable(spark, tbl, dir) == 3L,
      "all three segments count as newly indexed once")
    assert(spark.table(tbl)
      .filter(col("warc_type") =!= Warc.WalkTruncatedType).count() == 1,
      "only the parseable record lands as a capture")
    assert(spark.table(tbl)
      .filter(col("warc_type") === Warc.WalkTruncatedType &&
        col("filename") === "seg-003.warc").count() == 1,
      "the corrupt segment's incompleteness is observable in the catalog")
    assert(spark.table(s"${tbl}_segments")
      .filter(col("filename") === "seg-002.warc")
      .select("n_records").collect().head.getLong(0) == 0L,
      "the zero-row segment gets a 0-count marker")
    assert(Warc.appendToCdxTable(spark, tbl, dir) == 0L,
      "neither degenerate segment is re-announced as fresh")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS ${tbl}_segments")
  }

  test("fetchByCdx: bad locators and missing segments degrade to NULL rows, never a task failure") {
    import spark.implicits._
    val dir = graft.sources.Scratch.dir("graft_cdxb").toString
    val gz = Warc.gzipBytes(Warc.buildSegment(Seq(
      ("response", "http://a.com/1", Warc.httpResponse(ascii("one"))))))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "s.warc.gz"), gz)
    val locators = Seq(
      ("s.warc.gz", 0L, gz.length.toLong, 0),          // good
      ("s.warc.gz", gz.length.toLong + 7, 64L, 0),     // offset past EOF
      ("s.warc.gz", 1L, gz.length.toLong + 999, 0),    // read past EOF
      ("s.warc.gz", -3L, 16L, 0),                      // negative offset
      ("s.warc.gz", 2L, -1L, 0),                       // negative length
      ("gone.warc.gz", 0L, 16L, 0)                     // missing file
    ).toDF("filename", "offset", "comp_length", "member_record_index")
    val out = Warc.fetchByCdx(locators, dir).collect()
    assert(out.length == 6,
      "every locator row comes back, degraded rows included")
    val resolved = out.filter(_.getAs[String]("url") != null)
    assert(resolved.map(r =>
      (r.getAs[String]("filename"), r.getAs[Long]("offset"))).toSeq ==
      Seq(("s.warc.gz", 0L)), "only the good locator resolves")
    assert(resolved.head.getAs[String]("url") == "http://a.com/1")
  }

  test("digest verification covers the STORED payload bytes of a content-encoded response") {
    import spark.implicits._
    val text = ascii("the decoded text the consumer reads")
    val storedBody = Warc.gzipBytes(text) // what the crawler wrote
    val payload = Warc.httpResponseWith(storedBody,
      extraHeaders = Seq("Content-Encoding: gzip"))
    // the stamp a real crawler writes: over the body AS STORED
    val seg = Warc.buildSegmentWithHeaders(Seq(("response",
      "http://a.com/enc", payload,
      Seq(s"WARC-Payload-Digest: ${Warc.sha1Base32(storedBody)}"))))
    val dir = graft.sources.Scratch.dir("graft_cdxd").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "s.warc"), seg)
    val cdx = Warc.cdxIndex(spark, dir)
    // the surfaced body is DECODED, yet digest_ok verifies the stamp
    val f = Warc.fetchByCdx(cdx, dir).collect().head
    assert(new String(f.getAs[Array[Byte]]("body"), "ISO-8859-1") ==
      "the decoded text the consumer reads")
    assert(f.getAs[Boolean]("digest_ok"),
      "stamp over stored bytes must verify even though the body decodes")
    // and an unstamped record's fallback digest is ALSO stored-bytes
    val seg2 = Warc.buildSegment(Seq(("response", "http://a.com/enc2",
      Warc.httpResponseWith(storedBody,
        extraHeaders = Seq("Content-Encoding: gzip")))))
    val rows = Warc.indexSegment("d/s2.warc",
      new java.io.ByteArrayInputStream(seg2)).toSeq
    assert(rows.head.digest.contains(Warc.sha1Base32(storedBody)))
  }

  test("auditTextSegments: a missing manifest flips ok instead of throwing") {
    import spark.implicits._
    val dir = graft.sources.Scratch.dir("graft_wetm").toString + "/wet"
    val df = (0 until 6).map(i => (s"https://a.com/p$i", s"t$i"))
      .toDF("uri", "text").repartition(2)
    Warc.writeTextSegments(df, "uri", "text", dir)
    // simulate a crash between segment writes and the manifest write
    val mdir = new java.io.File(dir, "_graft_warc_manifest")
    mdir.listFiles().foreach(_.delete()); assert(mdir.delete())
    val audit = Warc.auditTextSegments(spark, dir).collect()
    assert(audit.nonEmpty, "found segments still report")
    assert(audit.forall(!_.getAs[Boolean]("ok")),
      "every segment is unverifiable without its manifest")
  }

  test("cdxj: sorted-text roundtrip reconstructs the index exactly; torn lines drop") {
    import spark.implicits._
    val dir = graft.sources.Scratch.dir("graft_cdxj").toString + "/wet"
    val df = (0 until 30)
      .map(i => (s"https://www.site${i % 5}.example.com/p$i", s"text $i"))
      .toDF("uri", "text").repartition(3)
    Warc.writeTextSegments(df, "uri", "text", dir, gzip = true)
    val cdx = Warc.cdxIndex(spark, dir)
    val cdxjDir = graft.sources.Scratch.dir("graft_cdxj_t")
      .toString + "/idx"
    Warc.writeCdxj(cdx, cdxjDir, shards = 2)
    // GLOBAL sort: shard files concatenated in name order stay sorted
    val files = new java.io.File(cdxjDir).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    assert(files.length == 2, "range partitioning produces the asked shards")
    val lines = files.flatMap { f =>
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().toArray finally src.close()
    }.toSeq
    assert(lines == lines.sorted, "concatenated shards must be globally sorted")
    assert(lines.forall(_.matches("^\\S+ \\d{14} \\{.*\\}$")))
    // roundtrip: every column reconstructs, nothing lost or invented
    val back = Warc.readCdxj(spark, cdxjDir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      cdx.schema.map(f => (f.name, f.dataType)), "schemas must align")
    assert(back.except(cdx).count() == 0L && cdx.except(back).count() == 0L,
      "roundtrip must be lossless both directions")
    // a torn line cannot poison the read
    java.nio.file.Files.write(
      java.nio.file.Paths.get(cdxjDir, "part-extra.txt"),
      "this is not a cdxj line\n".getBytes("UTF-8"))
    assert(Warc.readCdxj(spark, cdxjDir).count() == cdx.count())
  }

  test("readCdxj: the published manifest is invisible to the public read — explicit shard glob, no path-filter dependence") {
    import spark.implicits._
    val dir = graft.sources.Scratch.dir("graft_cdxjm").toString + "/wet"
    val df = (0 until 12)
      .map(i => (s"https://www.m${i % 3}.example.com/p$i", s"text $i"))
      .toDF("uri", "text").repartition(2)
    Warc.writeTextSegments(df, "uri", "text", dir, gzip = true)
    val cdx = Warc.cdxIndex(spark, dir)
    val cdxjDir = graft.sources.Scratch.dir("graft_cdxjm2")
      .toString + "/idx"
    Warc.writeCdxj(cdx, cdxjDir, shards = 2)
    // the manifest IS there — parquet bytes living inside the served dir
    assert(new java.io.File(cdxjDir, "_graft_cdxj_manifest").isDirectory,
      "writeCdxj publishes the per-shard manifest")
    // ...and the public read never sees it: rows == index rows, no
    // manifest parquet parsed as CDXJ text (would add garbage/dropped
    // rows), no reliance on an input format's hidden-path defaults
    assert(Warc.readCdxj(spark, cdxjDir).count() == cdx.count())
    // dot-prefixed scratch files are equally invisible
    java.nio.file.Files.write(
      java.nio.file.Paths.get(cdxjDir, ".scratch-junk"),
      "not a cdxj line either\n".getBytes("UTF-8"))
    assert(Warc.readCdxj(spark, cdxjDir).count() == cdx.count())
    // a path that IS a shard file reads as its own one-element set
    val one = new java.io.File(cdxjDir).listFiles()
      .filter(_.getName.startsWith("part-")).minBy(_.getName)
    val oneCount = Warc.readCdxj(spark, one.toString).count()
    assert(oneCount > 0 && oneCount < cdx.count())
    // glob paths still expand (the pre-round-14 text-reader contract):
    // a 'dir/part-*' pattern reads the shards, manifests still skipped
    assert(Warc.readCdxj(spark, s"$cdxjDir/part-*").count() == cdx.count())
    val parent = new java.io.File(cdxjDir).getParent
    assert(Warc.readCdxj(spark, s"$parent/id*").count() == cdx.count())
    // a glob that would MATCH the hidden manifest dir ('dir/*') must
    // not ingest its parquet bytes as CDXJ text — hidden names are
    // excluded from glob expansion, exact paths still resolve verbatim
    assert(Warc.readCdxj(spark, s"$cdxjDir/*").count() == cdx.count())
  }

  test("cdxj: NULL/fractional dates and locator-less lines degrade, never crash the fetch") {
    import spark.implicits._
    // a record with NO WARC-Date header: ts column degrades to '-',
    // the verbatim (null) date roundtrips, the line still frames
    val noDate = Seq(("s.warc", 0L, 10L, 0, 0, "response",
        "http://a.com/x", null.asInstanceOf[String],
        Some("text/html"), Some(200), None: Option[String], "com,a)/x"))
      .toDF("filename", "offset", "comp_length", "member_index",
        "member_record_index", "warc_type", "url", "warc_date",
        "mime", "status", "digest", "urlkey")
    // and one with a WARC 1.1 fractional date that must NOT truncate
    val fracDate = noDate.withColumn("warc_date",
      lit("2026-01-01T00:00:00.123Z"))
    val dir = graft.sources.Scratch.dir("graft_cdxjn")
      .toString + "/idx"
    Warc.writeCdxj(noDate.unionByName(fracDate), dir)
    val back = Warc.readCdxj(spark, dir)
    assert(back.count() == 2, "no line may silently vanish")
    assert(back.select("warc_date").as[String].collect().toSet ==
      Set(null, "2026-01-01T00:00:00.123Z"),
      "dates roundtrip VERBATIM, missing ones stay missing")
    // frame-valid lines whose json lacks locator fields or writes
    // the CDX '-' absent-field convention into numeric ones: the
    // read lands NULLs (try_cast, no ANSI throw) and the fetch
    // degrades those rows instead of crashing the task
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-bare.txt"),
      ("com,b)/y 20260101000000 {\"url\":\"http://b.com/y\"}\n" +
        "com,c)/z 20260101000000 {\"url\":\"http://c.com/z\"," +
        "\"offset\":\"-\",\"length\":\"-\",\"filename\":\"s.warc\"}\n")
        .getBytes("UTF-8"))
    val reread = Warc.readCdxj(spark, dir)
    assert(reread.count() == 4, "the '-' locator line reads, with NULLs")
    val segDir = graft.sources.Scratch.dir("graft_cdxjn2")
      .toString
    val fetched = Warc.fetchByCdx(reread, segDir)
    assert(fetched.count() == 4, "every row surfaces, degraded included")
    assert(fetched.filter(col("url").isNotNull).count() == 0,
      "nothing resolves against an empty segment dir — and nothing throws")
    // degraded rows echo their ORIGINAL locator values, not sentinels
    assert(fetched.filter(col("offset") === -1L || col("filename") === "")
      .count() == 0, "no fabricated sentinel may leak into the output")
    assert(fetched.filter(col("offset").isNull).count() == 2,
      "the NULL-offset rows stay NULL-offset")
  }

  test("appendToCdxTable: same basename in two announced paths collapses to one insert") {
    val dirA = graft.sources.Scratch.dir("graft_cdxa").toString
    val dirB = graft.sources.Scratch.dir("graft_cdxb2").toString
    val seg = Warc.buildSegment(Seq(("response", "http://a.com/1",
      Warc.httpResponse(ascii("b1")))))
    java.nio.file.Files.write(java.nio.file.Paths.get(dirA, "seg-001.warc"), seg)
    java.nio.file.Files.write(java.nio.file.Paths.get(dirB, "seg-001.warc"), seg)
    val tbl = "graft_test_cdx_basename"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS ${tbl}_segments")
    Warehouse.clearOrphanLocation(spark, tbl)
    Warehouse.clearOrphanLocation(spark, s"${tbl}_segments")
    assert(Warc.appendToCdxTable(spark, tbl, Seq(dirA, dirB)) == 1L,
      "the colliding basename absorbs once, not twice")
    assert(spark.table(tbl).count() == 1L, "no double-inserted rows")
    assert(spark.table(s"${tbl}_segments").count() == 1L)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS ${tbl}_segments")
  }

  test("cdx: a corrupt middle member stops the walk with earlier members intact — and a sentinel marks the stop") {
    def member(i: Int) = Warc.gzipBytes(Warc.buildSegment(Seq(
      ("response", s"http://a.com/$i", Warc.httpResponse(ascii(s"body$i"))))))
    val m1 = member(1)
    val bytes = m1 ++ member(2) ++ member(3)
    bytes(m1.length + 1) = 0x00 // wreck member 2's gzip magic
    val rows = Warc.indexSegment("d/s.warc.gz",
      new java.io.ByteArrayInputStream(bytes)).toSeq
    val (sentinels, captures) =
      rows.partition(_.warc_type == Warc.WalkTruncatedType)
    assert(captures.map(_.url) == Seq("http://a.com/1"),
      "walk must stop at the corruption, keeping what indexed")
    // the truncation used to be SILENT — every later record vanished
    // with no trace; now exactly one sentinel pins where the walk died
    assert(sentinels.map(s => (s.offset, s.comp_length,
      s.member_index, s.member_record_index)) ==
      Seq((m1.length.toLong, 0L, -1, -1)),
      "one sentinel row at the first unindexed byte")
    // a CLEAN segment emits no sentinel
    val clean = Warc.indexSegment("d/ok.warc.gz",
      new java.io.ByteArrayInputStream(member(1) ++ member(2))).toSeq
    assert(!clean.exists(_.warc_type == Warc.WalkTruncatedType))
    // plain (uncompressed) walks surface truncation the same way
    val plain = Warc.buildSegment(Seq(("response", "http://a.com/p",
      Warc.httpResponse(ascii("pb"))))) ++ ascii("NOT A WARC HEADER\r\n")
    val pRows = Warc.indexSegment("d/p.warc",
      new java.io.ByteArrayInputStream(plain)).toSeq
    assert(pRows.count(_.warc_type == Warc.WalkTruncatedType) == 1,
      "plain-record walk corruption is observable too")
  }

  test("latestCaptures: max date wins, same-second captures tiebreak on the locator, non-responses drop") {
    import spark.implicits._
    val cdx = Seq(
      // two captures, later date wins regardless of row/file order
      ("s2.warc", 0L, 10L, 0, 0, "response", "http://a.com/x",
        "2026-01-02T00:00:00Z", Some("text/html"), Some(200),
        Some("sha1:B"), "com,a)/x"),
      ("s1.warc", 0L, 10L, 0, 0, "response", "http://a.com/x",
        "2026-01-01T00:00:00Z", Some("text/html"), Some(200),
        Some("sha1:A"), "com,a)/x"),
      // same date twice: the larger (filename, offset, mri) locator is
      // the deterministic winner
      ("s1.warc", 50L, 10L, 1, 0, "response", "http://a.com/y",
        "2026-01-01T00:00:00Z", Some("text/html"), Some(200),
        Some("sha1:C"), "com,a)/y"),
      ("s1.warc", 20L, 10L, 1, 0, "response", "http://a.com/y",
        "2026-01-01T00:00:00Z", Some("text/html"), Some(200),
        Some("sha1:D"), "com,a)/y"),
      // non-response and null-urlkey rows never become winners
      ("s1.warc", 90L, 10L, 2, 0, "revisit", "http://a.com/x",
        "2026-01-09T00:00:00Z", None, None, Some("sha1:B"), "com,a)/x"),
      ("s1.warc", 99L, 0L, -1, -1, Warc.WalkTruncatedType, null,
        null, None, None, None, null))
      .toDF("filename", "offset", "comp_length", "member_index",
        "member_record_index", "warc_type", "url", "warc_date",
        "mime", "status", "digest", "urlkey")
    val got = Warc.latestCaptures(cdx)
      .select("urlkey", "warc_date", "filename", "offset", "n_captures")
      .as[(String, String, String, Long, Long)].collect()
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      ("com,a)/x", "2026-01-02T00:00:00Z", "s2.warc", 0L, 2L),
      ("com,a)/y", "2026-01-01T00:00:00Z", "s1.warc", 50L, 2L)),
      got.mkString(","))
    // determinism under repartitioning (hash-agg, not arrival order)
    val again = Warc.latestCaptures(cdx.repartition(5))
      .select("urlkey", "warc_date", "filename", "offset", "n_captures")
      .as[(String, String, String, Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq == got.toSeq)
  }

  test("readCdxjPrefix: manifest prunes shards, results equal the full-scan filter, unmanifested files always read") {
    import spark.implicits._
    val dir = graft.sources.Scratch.dir("graft_cdxjrs")
      .toString + "/wet"
    val df = (0 until 40)
      .map(i => (s"https://www.site${i % 4}.example.com/p$i", s"text $i"))
      .toDF("uri", "text").repartition(3)
    Warc.writeTextSegments(df, "uri", "text", dir, gzip = true)
    val cdx = Warc.cdxIndex(spark, dir)
    val cdxjDir = graft.sources.Scratch.dir("graft_cdxjrs2")
      .toString + "/idx"
    Warc.writeCdxj(cdx, cdxjDir, shards = 4)
    val prefix = "com,example,site2)"
    val all = Warc.cdxjShardsForPrefix(spark, cdxjDir, "")
    val sel = Warc.cdxjShardsForPrefix(spark, cdxjDir, prefix)
    assert(sel.nonEmpty && sel.size < all.size,
      s"manifest must prune: ${sel.size} of ${all.size}")
    // pruning is invisible in the result
    val viaRange = Warc.readCdxjPrefix(spark, cdxjDir, prefix)
    val viaFull = Warc.readCdxj(spark, cdxjDir)
      .filter(col("urlkey").startsWith(prefix))
    assert(viaRange.count() == 10L)
    assert(viaRange.except(viaFull).count() == 0L &&
      viaFull.except(viaRange).count() == 0L)
    // a file the manifest does not know (a third party dropped lines
    // in — with a NON-part name, which the reader scans and the
    // pruner therefore must too) is ALWAYS read
    java.nio.file.Files.write(
      java.nio.file.Paths.get(cdxjDir, "cdx-extra.txt"),
      ("com,example,site2)/injected 20260101000000 " +
        "{\"url\":\"https://site2.example.com/injected\"}\n").getBytes("UTF-8"))
    val sel2 = Warc.cdxjShardsForPrefix(spark, cdxjDir, prefix)
    assert(sel2.size == sel.size + 1, "unmanifested file must be selected")
    assert(Warc.readCdxjPrefix(spark, cdxjDir, prefix).count() == 11L)
    // a prefix outside every shard range selects nothing and returns
    // an empty (but well-schemed) frame
    assert(Warc.cdxjShardsForPrefix(spark, cdxjDir, "zz,nowhere)")
      .count(f => !f.endsWith("cdx-extra.txt")) == 0)
    assert(Warc.readCdxjPrefix(spark, cdxjDir, "zz,nowhere)").count() == 0L)
  }

  test("readCdxjPrefix: a whitespace-bearing prefix prunes in the ENCODED key space, never wrongly skipping") {
    import spark.implicits._
    // the manifest holds whitespace-ENCODED line keys ("com,a)/x%20y");
    // a verbatim prefix "com,a)/x y" compared raw would sort ABOVE the
    // encoded min ('%'=0x25 > ' '=0x20) and the shard would be skipped
    // — the pruner must encode the prefix first
    val rows = Seq(
      ("s.warc", 0L, 10L, 0, 0, "response", "http://a.com/x y",
        "2026-01-01T00:00:00Z", Some("text/html"), Some(200),
        None: Option[String], "com,a)/x y"),
      ("s.warc", 10L, 10L, 1, 0, "response", "http://a.com/z",
        "2026-01-01T00:00:00Z", Some("text/html"), Some(200),
        None: Option[String], "com,a)/z"))
      .toDF("filename", "offset", "comp_length", "member_index",
        "member_record_index", "warc_type", "url", "warc_date",
        "mime", "status", "digest", "urlkey")
    val dir = graft.sources.Scratch.dir("graft_cdxjwsp")
      .toString + "/idx"
    Warc.writeCdxj(rows, dir)
    val got = Warc.readCdxjPrefix(spark, dir, "com,a)/x y")
      .select("urlkey").as[String].collect().toSeq
    assert(got == Seq("com,a)/x y"),
      s"whitespace prefix must find its record, got $got")
  }

  test("cdx: inter-record blank-line padding indexes fully — readable archives never file a sentinel") {
    // parseStream tolerates a stray CRLF between records; the walk
    // must index every record and stay sentinel-free (it used to stop
    // AND file corruption for a readable archive)
    val r1 = Warc.buildSegment(Seq(("response", "http://a.com/1",
      Warc.httpResponse(ascii("b1")))))
    val r2 = Warc.buildSegment(Seq(("response", "http://a.com/2",
      Warc.httpResponse(ascii("b2")))))
    val padded = r1 ++ ascii("\r\n") ++ r2 ++ ascii("\r\n")
    val rows = Warc.indexSegment("d/padded.warc",
      new java.io.ByteArrayInputStream(padded)).toSeq
    assert(rows.map(_.url) == Seq("http://a.com/1", "http://a.com/2"),
      rows.map(r => (r.warc_type, r.url)).mkString(","))
    assert(!rows.exists(_.warc_type == Warc.WalkTruncatedType))
    // and the spans still fetch in isolation (offset tiling holds —
    // the pad rides as a leading skip of the next record's span)
    assert(rows.map(r => (r.offset, r.comp_length)) ==
      Seq((0L, r1.length.toLong), (r1.length.toLong, (r2.length + 2).toLong)),
      rows.map(r => (r.offset, r.comp_length)).toString)
    // BOUNDED tolerance: a multi-MiB padding run (corrupt/adversarial
    // input) degrades to the sentinel instead of buffering O(file)
    val bigPad = Array.fill((2 << 20) / 2)('\r'.toByte, '\n'.toByte)
      .flatMap(t => Array(t._1, t._2))
    val flooded = r1 ++ bigPad ++ r2
    val fRows = Warc.indexSegment("d/flooded.warc",
      new java.io.ByteArrayInputStream(flooded)).toSeq
    assert(fRows.map(_.url) == Seq("http://a.com/1", null),
      fRows.map(r => (r.warc_type, r.url)).mkString(","))
    assert(fRows.last.warc_type == Warc.WalkTruncatedType,
      "an over-cap padding run must surface as truncation, not OOM")
  }

  test("writeWatSegments: metadata-type records roundtrip and audit clean") {
    import spark.implicits._
    val dir = graft.sources.Scratch.dir("graft_wat").toString + "/wat"
    val wat = Seq(
      ("https://a.example.com/x", """{"url":"https://a.example.com/x","n_links":2}"""),
      ("https://b.example.com/y", """{"url":"https://b.example.com/y","n_links":0}"""))
      .toDF("uri", "wat_json")
    Warc.writeWatSegments(wat, "uri", "wat_json", dir)
    val back = Warc.readWarc(spark, dir)
    // records are metadata-type (never conversion), bodies verbatim
    assert(back.filter(col("warc_type") === "metadata").count() == 2)
    assert(back.filter(col("warc_type") === "conversion").count() == 0)
    val bodies = back.filter(col("warc_type") === "metadata")
      .select(col("target_uri"), col("body").cast("string"))
      .as[(String, String)].collect().toMap
    assert(bodies("https://a.example.com/x").contains("\"n_links\":2"))
    // the audit generalizes by record type: metadata segments audit
    // clean under recordType="metadata" and EMPTY under the default
    // (a WET audit pointed at a WAT dir must scream, not vacuously ok)
    val auditW = Warc.auditTextSegments(spark, dir, recordType = "metadata")
      .select("ok").as[Boolean].collect()
    assert(auditW.nonEmpty && auditW.forall(identity))
    assert(Warc.auditTextSegments(spark, dir)
      .filter(col("ok")).count() == 0)
  }

  test("cdxj: a whitespace urlkey survives the roundtrip verbatim instead of vanishing") {
    import spark.implicits._
    // canonicalKernel does not percent-encode a raw space in a
    // Target-URI, so a SURT key can contain whitespace — the 3-field
    // line frame must still hold (encoded line key) and the VERBATIM
    // key must come back (json extension field), alongside a key that
    // legitimately contains literal "%20" text which must NOT be
    // touched by any decode
    val rows = Seq(
      ("s.warc", 0L, 10L, 0, 0, "response", "http://a.com/x y",
        "2026-01-01T00:00:00Z", Some("text/html"), Some(200),
        None: Option[String], "com,a)/x y"),
      ("s.warc", 10L, 10L, 1, 0, "response", "http://a.com/x%20y",
        "2026-01-01T00:00:00Z", Some("text/html"), Some(200),
        None: Option[String], "com,a)/x%20y"))
      .toDF("filename", "offset", "comp_length", "member_index",
        "member_record_index", "warc_type", "url", "warc_date",
        "mime", "status", "digest", "urlkey")
    val dir = graft.sources.Scratch.dir("graft_cdxjws")
      .toString + "/idx"
    Warc.writeCdxj(rows, dir)
    // every written line still frames (no whitespace inside field 1)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-"))
    val lines = files.flatMap { f =>
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().toArray finally src.close()
    }.toSeq
    assert(lines.size == 2)
    assert(lines.forall(_.matches("^\\S+ (\\d{14}|-) \\{.*\\}$")),
      "the encoded line key must keep the 3-field frame intact")
    val back = Warc.readCdxj(spark, dir)
    assert(back.count() == 2, "the whitespace-keyed record must not vanish")
    assert(back.select("urlkey").as[String].collect().toSet ==
      Set("com,a)/x y", "com,a)/x%20y"),
      "verbatim keys roundtrip; literal %20 text is never mis-decoded")
  }

  test("validators surface verbatim; ledger takes the latest; 304s resolve to prior locators") {
    import spark.implicits._
    // parseHttp: ETag (weak tag included) and Last-Modified verbatim
    val seg = Warc.buildSegment(Seq(
      ("response", "http://a.com/x",
        Warc.httpResponseWith("one".getBytes, "200 OK", "text/plain",
          Seq("""ETag: W/"v1"""",
            "Last-Modified: Sun, 01 Feb 2026 00:00:00 GMT")))))
    val r = Warc.parseSegment("m.warc", seg).head
    assert(r.http_etag.contains("""W/"v1"""") &&
      r.http_last_modified.contains("Sun, 01 Feb 2026 00:00:00 GMT"), r)
    // ledger: latest validator per urlkey wins; validator-less rows
    // never ledger
    val resp = Seq(
      ("response", "https://a.com/p", "2026-02-01T00:00:00Z",
        """"e1"""", null: String),
      ("response", "https://a.com/p", "2026-02-02T00:00:00Z",
        """"e2"""", null: String),
      ("response", "https://a.com/naked", "2026-02-01T00:00:00Z",
        null: String, null: String)
    ).toDF("warc_type", "target_uri", "warc_date", "http_etag",
      "http_last_modified")
    val led = Warc.revalidationLedger(resp).collect()
    assert(led.length == 1 && led(0).getAs[String]("http_etag") == "\"e2\"",
      led.mkString(","))
    // resolveNotModified: fresh rows keep themselves; 304s inherit
    // the prior latest locator + digest with date split; an orphan
    // 304 surfaces with NULL locator instead of vanishing
    def cdx(rows: Seq[(String, String, Int, String, String, Long)]) =
      rows.toDF("urlkey", "url", "status", "warc_date", "filename",
          "offset")
        .withColumn("comp_length", lit(10L))
        .withColumn("member_index", lit(0))
        .withColumn("member_record_index", lit(0))
        .withColumn("mime", lit("text/plain"))
        .withColumn("digest", concat(lit("d-"), col("filename")))
        .withColumn("warc_type", lit("response"))
    val prior = cdx(Seq(
      ("k1", "https://a.com/1", 200, "2026-02-01T00:00:00Z", "a.warc", 0L),
      ("k1", "https://a.com/1", 200, "2026-01-15T00:00:00Z", "old.warc", 0L),
      ("k2", "https://a.com/2", 200, "2026-02-01T00:00:00Z", "a.warc", 9L),
      // chained recrawls: the prior catalog itself holds a NEWER
      // bodyless 304 for k3 — resolution must reach past it to the
      // latest capture that actually holds bytes
      ("k3", "https://a.com/3", 200, "2026-02-01T00:00:00Z", "a.warc", 3L),
      ("k3", "https://a.com/3", 304, "2026-02-02T00:00:00Z", "b0.warc", 0L)))
    val next = cdx(Seq(
      ("k1", "https://a.com/1", 304, "2026-02-02T00:00:00Z", "b.warc", 0L),
      ("k2", "https://a.com/2", 200, "2026-02-02T00:00:00Z", "b.warc", 5L),
      ("k3", "https://a.com/3", 304, "2026-02-03T00:00:00Z", "c.warc", 0L),
      ("k9", "https://a.com/9", 304, "2026-02-02T00:00:00Z", "b.warc", 7L)))
    val eff = Warc.resolveNotModified(next, prior).collect()
      .map(x => x.getAs[String]("urlkey") -> x).toMap
    assert(eff("k1").getAs[String]("source") == "revalidated" &&
      eff("k1").getAs[String]("filename") == "a.warc" &&
      eff("k1").getAs[String]("digest") == "d-a.warc" &&
      eff("k1").getAs[String]("content_date") == "2026-02-01T00:00:00Z" &&
      eff("k1").getAs[String]("observed_date") == "2026-02-02T00:00:00Z",
      eff("k1").toString)
    assert(eff("k2").getAs[String]("source") == "fresh" &&
      eff("k2").getAs[String]("filename") == "b.warc", eff("k2").toString)
    assert(eff("k9").getAs[String]("source") == "revalidated" &&
      eff("k9").getAs[String]("filename") == null,
      "an orphan 304 must surface, not vanish: " + eff("k9"))
    assert(eff("k3").getAs[String]("filename") == "a.warc" &&
      eff("k3").getAs[String]("content_date") == "2026-02-01T00:00:00Z" &&
      eff("k3").getAs[String]("observed_date") == "2026-02-03T00:00:00Z",
      "a chained 304 must resolve past the prior catalog's own 304 " +
        "to the latest BODY capture: " + eff("k3"))
    // a real crawl's CDX also carries request/metadata/warcinfo rows
    // (NULL status, NULL urlkey on warcinfo) — none of them are
    // captures, and none may leak into either leg as "fresh" rows
    // with bogus locators
    val noisy = next.unionByName(
      Seq(("k1", "https://a.com/1", "request", "2026-02-02T00:00:00Z",
            "b.warc", 1L),
          ("k2", "https://a.com/2", "metadata", "2026-02-02T00:00:00Z",
            "b.warc", 6L),
          (null: String, null: String, "warcinfo",
            "2026-02-02T00:00:00Z", "b.warc", 0L))
        .toDF("urlkey", "url", "warc_type", "warc_date", "filename",
          "offset")
        .withColumn("status", lit(null: Integer))
        .withColumn("comp_length", lit(10L))
        .withColumn("member_index", lit(0))
        .withColumn("member_record_index", lit(0))
        .withColumn("mime", lit(null: String))
        .withColumn("digest", lit(null: String)))
    val effNoisy = Warc.resolveNotModified(noisy, prior).collect()
    assert(effNoisy.length == eff.size,
      "non-response CDX rows must not become effective captures: " +
        effNoisy.mkString(","))
  }

  test("segment slices pack by cumulative bytes, not file count (round-18)") {
    val cap = 4 * spark.sparkContext.defaultParallelism
    // one huge file among tiny ones: count-based packing clumped the
    // big file together with a full count-share of tiny ones (a
    // straggler slice); byte packing closes a slice as soon as it
    // reaches the byte target
    val files = (1 to cap * 2).map(i =>
      (f"seg$i%04d", if (i == 1) 64L << 20 else 1L))
    val slices = Warc.segmentSlices(spark, files)
    assert(slices.length <= cap, s"${slices.length} slices > cap $cap")
    assert(slices.flatten == files.map(_._1),
      "slices must be contiguous and order-preserving")
    assert(slices.head == Seq("seg0001"),
      "a file at/above the byte target closes its slice alone")
    // big segments (cluster-scale archives) keep one file per task
    val big = (1 to cap).map(i => (f"b$i%03d", 512L << 20))
    assert(Warc.segmentSlices(spark, big) == big.map(f => Seq(f._1)))
    // a tiny-fixture directory collapses to a few sizeful slices
    // instead of one task launch per file (or per count-share)
    val tiny = (1 to 500).map(i => (f"t$i%03d", 10L << 10))
    val tinySlices = Warc.segmentSlices(spark, tiny)
    assert(tinySlices.length < 30 && tinySlices.length > 1,
      s"500 tiny segments should pack to a handful of ~4MB slices, " +
        s"got ${tinySlices.length}")
    assert(tinySlices.flatten == tiny.map(_._1))
  }
}
