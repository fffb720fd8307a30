package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Charset]] — the byte→text sniffing ladder. Every rung and every
  * precedence edge between rungs is pinned on hand-built byte
  * fixtures; the decode side is pinned to exact Unicode output. */
class CharsetSpec extends SparkSpec {
  import spark.implicits._

  private def b(s: String, cs: String): Array[Byte] = s.getBytes(cs)

  test("rung 1: BOMs decide and WIN over a lying HTTP header") {
    val utf8Bom = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ b("hi", "UTF-8")
    assert(Charset.detectKernel(utf8Bom, "text/html; charset=shift_jis") == "utf-8")
    val le = Array[Byte](0xFF.toByte, 0xFE.toByte) ++ b("hi", "UTF-16LE")
    assert(Charset.detectKernel(le, "text/html; charset=utf-8") == "utf-16le")
    val be = Array[Byte](0xFE.toByte, 0xFF.toByte) ++ b("hi", "UTF-16BE")
    assert(Charset.detectKernel(be, null) == "utf-16be")
    // decode strips exactly one leading BOM char
    assert(Charset.decodeKernel(utf8Bom, null) == (("utf-8", "hi")))
    assert(Charset.decodeKernel(le, "text/html; charset=utf-8") ==
      (("utf-16le", "hi")))
  }

  test("rung 2: HTTP charset param — spacing, quoting, aliases, unknown falls through") {
    val body = b("plain ascii", "UTF-8")
    assert(Charset.detectKernel(body, "text/html; charset=Shift_JIS") == "shift_jis")
    assert(Charset.detectKernel(body, "text/html;charset = \"EUC-JP\"") == "euc-jp")
    assert(Charset.detectKernel(body, "text/html; charset=latin1; x=y") == "windows-1252")
    assert(Charset.detectKernel(body, "text/html; charset=ISO-8859-1") == "windows-1252")
    assert(Charset.detectKernel(body, "text/html; charset=GB2312") == "gbk")
    // unknown label → next rung (here: valid UTF-8 probe)
    assert(Charset.detectKernel(body, "text/html; charset=klingon-8") == "utf-8")
    assert(Charset.detectKernel(body, "text/html") == "utf-8")
  }

  test("rung 3: meta prescan — both meta forms, only within the first 1024 bytes") {
    val m1 = b("<html><head><meta charset=\"windows-1251\"></head>x", "UTF-8")
    assert(Charset.detectKernel(m1, "text/html") == "windows-1251")
    val m2 = b("<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=koi8-r\"></head>", "UTF-8")
    assert(Charset.detectKernel(m2, null) == "koi8-r")
    val m3 = b("<META CHARSET=BIG5>", "UTF-8")
    assert(Charset.detectKernel(m3, null) == "big5")
    // a declaration past the 1024-byte prescan window does not exist
    val far = b("<html>" + ("x" * 1100) + "<meta charset=big5>", "UTF-8")
    assert(Charset.detectKernel(far, null) == "utf-8")
    // HTTP header beats meta
    assert(Charset.detectKernel(m1, "text/html; charset=utf-8") == "utf-8")
    // an unresolvable meta label falls through, a later real one wins
    val m4 = b("<meta charset=nonsense><meta charset=euc-kr>", "UTF-8")
    assert(Charset.detectKernel(m4, null) == "euc-kr")
  }

  test("rungs 4+5: strict UTF-8 probe, windows-1252 fallback; decode is exact") {
    val ok = b("tēnā koutou — ā", "UTF-8")
    assert(Charset.detectKernel(ok, "text/plain") == "utf-8")
    assert(Charset.decodeKernel(ok, null)._2 == "tēnā koutou — ā")
    // 0xE9/0x80 are invalid UTF-8 here → fallback, and cp1252 maps
    // them to é and €
    val legacy = b("caf", "UTF-8") ++ Array[Byte](0xE9.toByte, ' '.toByte, 0x80.toByte)
    assert(Charset.detectKernel(legacy, "text/html") == "windows-1252")
    assert(Charset.decodeKernel(legacy, null) == (("windows-1252", "café €")))
    // a DECLARED charset that lies about some bytes still decodes
    // (replacement char), never throws
    val declared = Charset.decodeKernel(
      Array[Byte](0xC3.toByte), "text/html; charset=utf-8")
    assert(declared._1 == "utf-8" && declared._2 == "�")
    // legacy round trips: shift_jis katakana, euc-kr hangul
    assert(Charset.decodeKernel(b("カタカナ", "Shift_JIS"),
      "text/html; charset=shift_jis")._2 == "カタカナ")
    assert(Charset.decodeKernel(b("한국어", "EUC-KR"),
      "charset=euc-kr")._2 == "한국어")
  }

  test("property: the ladder is TOTAL — arbitrary bytes always decode, never throw") {
    val rnd = new scala.util.Random(7)
    val ctypes = Seq(null, "", "text/html", "text/html; charset=utf-8",
      "text/html; charset=shift_jis", "charset=", "charset==x",
      "text/html; charset=no-such-charset-999", "charset", "; charset=  ")
    (0 until 600).foreach { i =>
      val body = new Array[Byte](rnd.nextInt(80))
      rnd.nextBytes(body)
      val ct = ctypes(rnd.nextInt(ctypes.length))
      val (cs, text) = Charset.decodeKernel(body, ct)
      assert(cs != null && text != null, s"iteration $i returned null")
      // the verdict is always a decodable charset and decoding is a
      // fixed point of the same verdict (re-decoding the produced
      // text's UTF-8 bytes never throws either)
      assert(java.nio.charset.Charset.isSupported(cs), s"bad verdict $cs")
      val again = Charset.decodeKernel(text.getBytes("UTF-8"), null)
      assert(again._2 != null)
    }
  }

  test("corpus form: decodeBodies over a mixed-encoding frame; NULL body degrades") {
    val rows: Seq[(Long, Array[Byte], String)] = Seq(
      (1L, b("utf-8 text ā", "UTF-8"), "text/html"),
      (2L, b("caf", "UTF-8") ++ Array[Byte](0xE9.toByte), "text/html"),
      (3L, b("ハロー", "Shift_JIS"), "text/html; charset=shift_jis"),
      (4L, null, "text/html"))
    val got = Charset.decodeBodies(
        rows.toDF("id", "body", "http_content_type"), "body", "http_content_type")
      .select("id", "charset", "text").as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "utf-8", "utf-8 text ā"),
      (2L, "windows-1252", "café"),
      (3L, "shift_jis", "ハロー"),
      (4L, null, null)), got.toString)
  }

  test("prescan is meta-tag-scoped: incidental charset= tokens cannot override the probe") {
    // a charset= inside an href query string is NOT a declaration
    val href = b("<html><body><a href=\"/x?charset=iso-8859-1\">l</a>" +
      "valid utf-8 ā</body></html>", "UTF-8")
    assert(Charset.detectKernel(href, "text/html") == "utf-8")
    // …nor inside script text…
    val script = b("<html><head><script>var charset='koi8-r';</script>" +
      "</head><body>ā</body></html>", "UTF-8")
    assert(Charset.detectKernel(script, "text/html") == "utf-8")
    // …nor inside a markup comment (including a commented-out meta)
    val comment = b("<html><head><!-- <meta charset=\"windows-1251\"> -->" +
      "</head><body>ā</body></html>", "UTF-8")
    assert(Charset.detectKernel(comment, "text/html") == "utf-8")
    // <metadata> is not a meta tag
    val metadata = b("<metadata charset=\"koi8-r\"></metadata>ā", "UTF-8")
    assert(Charset.detectKernel(metadata, "text/html") == "utf-8")
    // a REAL meta declaration after an incidental token still lands
    val both = b("<a href=\"?charset=utf-8\"></a>" +
      "<meta charset=\"windows-1251\">x", "UTF-8")
    assert(Charset.detectKernel(both, "text/html") == "windows-1251")
  }

  test("meta-declared utf-16 remaps to utf-8 (WHATWG): ASCII-visible declaration can't be UTF-16") {
    val m = b("<html><head><meta charset=\"utf-16\"></head>body ā</html>", "UTF-8")
    assert(Charset.detectKernel(m, "text/html") == "utf-8")
    val mbe = b("<meta charset=utf-16be>plain", "UTF-8")
    assert(Charset.detectKernel(mbe, "text/html") == "utf-8")
    // the HTTP header rung, by contrast, honors utf-16 labels (a BOM
    // normally settles real UTF-16 first anyway)
    assert(Charset.detectKernel(b("hi", "UTF-8"),
      "text/html; charset=utf-16") == "utf-16le")
  }

  test("Content-Type scan anchors on parameter boundaries and tries successive tokens") {
    val body = b("plain ascii", "UTF-8")
    // a parameter whose NAME merely contains 'charset' must not
    // swallow the real parameter after it
    assert(Charset.detectKernel(body,
      "text/html; x-charsetty=1; charset=shift_jis") == "shift_jis")
    // an unbounded occurrence (no ;/space before) is not a parameter
    assert(Charset.detectKernel(body,
      "text/html; notcharset=koi8-r") == "utf-8")
    // first bounded occurrence with an unknown label falls through to
    // a later bounded one
    assert(Charset.detectKernel(body,
      "text/html; charset=klingon-8; charset=euc-jp") == "euc-jp")
  }
}
