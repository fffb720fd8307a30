package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-level BPE — the GPT-2 tokenization recipe (Radford et al.
  * 2019, public: regex pre-tokenization, then greedy pair merging
  * over each pre-token's UTF-8 BYTES), the scheme most production
  * tokenizers actually run. It differs from the word-level
  * [[Bpe]] in the three ways that change packing geometry
  * materially:
  *
  *  - NO normalization and NO end-of-word symbol: the byte stream is
  *    tokenized as-is, so decode∘encode is the IDENTITY on arbitrary
  *    text (ByteBpeSpec pins it on multi-byte UTF-8 and emoji) —
  *    where [[Bpe.tokenIds]] roundtrips only the normalized text;
  *  - spaces belong to tokens: the pre-token regex attaches one
  *    leading space to word tokens (` ?\p{L}+`), so merges can cross
  *    the space boundary (a committed `(" ", "t")` merge is live
  *    here and meaningless in the word model) — this is what makes
  *    byte-level fertility lower on real prose;
  *  - the base vocabulary is the 256 byte values, so NOTHING is out
  *    of vocabulary — exotic codepoints fall back to their bytes
  *    instead of a codepoint-indexed id.
  *
  * Id scheme (closed-form, the [[Bpe.tokenId]] discipline): a
  * single-byte symbol is its byte value `0..255`; a merge OUTPUT is
  * `256 + rank`, first-rank-wins on output-string collisions. Every
  * engine can replay the mapping — the q183 oracle restates every id
  * of every document.
  *
  * Internally a symbol is a String in BYTE-CHAR space (ISO-8859-1,
  * the 1:1 byte↔char encoding), so committed merge lists stay
  * readable literals and the greedy loop reuses the
  * [[Bpe.tokenizeWord]] shape (minus `</w>`).
  *
  * Scale shape: the merge ranks broadcast once; tokenization is one
  * narrow row-local pass (a [[byteTokenIdsCol]] Column fuses into
  * any projection), no shuffle anywhere.
  */
object ByteBpe {

  /** The GPT-2 pre-tokenization regex, verbatim (Radford et al.
    * 2019, `gpt2/encoder.py`): contractions, optionally
    * space-prefixed letter runs, digit runs, punctuation runs, then
    * whitespace (a run keeps its LAST space for the next word's
    * prefix — the `\s+(?!\S)` branch takes interior runs minus that
    * space, the final `\s+` takes trailing runs). UNICODE classes on
    * (Java defaults `\s`/`\w` to ASCII; GPT-2's python `regex` is
    * unicode-aware). */
  private val PretokenPattern = java.util.regex.Pattern.compile(
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** Split `text` into GPT-2 pre-tokens (codepoint space, pre-UTF-8;
    * concatenation reproduces the text exactly — nothing is dropped,
    * the lossless-tokenizer contract). */
  def pretokenize(text: String): Vector[String] = {
    val m = PretokenPattern.matcher(text)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8
  private val ByteChars = java.nio.charset.StandardCharsets.ISO_8859_1

  /** UTF-8 bytes of `s`, one char per byte (byte-char space). */
  private[operators] def toByteChars(s: String): String =
    new String(s.getBytes(Utf8), ByteChars)

  /** Inverse of [[toByteChars]]. */
  private[operators] def fromByteChars(b: String): String =
    new String(b.getBytes(ByteChars), Utf8)

  /** Greedy lowest-rank-first pair merging over one pre-token's
    * byte-chars — [[Bpe.tokenizeWord]] minus the end-of-word symbol
    * (byte-level BPE has none; spaces live inside tokens). */
  private[operators] def tokenizePretoken(
      p: String, rank: Map[(String, String), Int]): Vector[String] = {
    var syms = p.map(_.toString).toVector
    var continue = syms.length > 1
    while (continue) {
      var bestIdx = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestIdx = i }
        }
        i += 1
      }
      if (bestIdx < 0) continue = false
      else syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
        syms.drop(bestIdx + 2)
    }
    syms
  }

  /** Closed-form id of one symbol: byte value for single bytes,
    * `256 + rank` for merge outputs (first-rank-wins on output
    * collisions, the [[Bpe.tokenId]] rule). */
  def tokenId(sym: String, merges: Seq[(String, String)]): Long =
    if (sym.length == 1) sym.charAt(0).toLong & 0xFF
    else {
      val i = merges.indexWhere { case (a, b) => a + b == sym }
      require(i >= 0, s"symbol '$sym' is neither a byte nor a merge output")
      256L + i
    }

  /** The distributed half of byte-level training — the [[Bpe
    * .wordHistogram]] analogue over PRE-TOKENS (GPT-2 trains on the
    * pre-token histogram, not raw text): one narrow pass explodes
    * each document's pre-tokens (byte-char space) and counts.
    * Histogram-sized, never corpus-sized; `minCount` prunes the
    * hapax tail before any collect. */
  def pretokenHistogram(docs: DataFrame, textCol: String,
                        minCount: Long = 1L): DataFrame = {
    val preUdf = udf((s: String) =>
      if (s == null) Array.empty[String]
      else pretokenize(s).map(toByteChars).toArray)
    docs.select(explode(preUdf(col(textCol))).as("pretoken"))
      .groupBy("pretoken").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Learn `numMerges` BYTE merges from the corpus — the same greedy
    * max-count loop as the word trainer ([[Bpe.trainOnHistogram]],
    * shared code) run over the pre-token histogram WITHOUT an
    * end-of-word symbol: pairs merge across the space a pre-token
    * carries, which is how space-crossing merges like `(" ", "t")`
    * arise in real GPT-2 vocabularies. Deterministic (count ties
    * break lexicographically on byte-chars); the merge loop itself is
    * driver-side over the bounded histogram, the scale story
    * unchanged from the word trainer. */
  def trainMerges(docs: DataFrame, textCol: String, numMerges: Int,
                  minCount: Long = 1L): Seq[(String, String)] = {
    val hist = pretokenHistogram(docs, textCol, minCount)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    Bpe.trainOnHistogram(hist, numMerges, appendEow = false)
  }

  /** Column form — token ids of `text` under `merges` as
    * `array<long>`: pre-tokenize, byte-map, greedy-merge, id-map.
    * One broadcast of the rank/id tables, row-local. */
  def byteTokenIdsCol(spark: SparkSession, text: Column,
                      merges: Seq[(String, String)]): Column = {
    val mlist = merges.toIndexedSeq
    val bcRank = spark.sparkContext.broadcast(
      mlist.zipWithIndex.map { case (p, i) => p -> i }.toMap)
    val bcId = spark.sparkContext.broadcast(
      mlist.zipWithIndex.reverse
        .map { case ((a, b), i) => (a + b) -> (256L + i) }.toMap)
    val idsUdf = udf((s: String) => {
      if (s == null) Array.empty[Long]
      else {
        val rank = bcRank.value
        val mergeId = bcId.value
        val out = Array.newBuilder[Long]
        pretokenize(s).foreach { p =>
          tokenizePretoken(toByteChars(p), rank).foreach { t =>
            out += (if (t.length == 1) t.charAt(0).toLong & 0xFF
                    else mergeId(t))
          }
        }
        out.result()
      }
    })
    idsUdf(text)
  }

  /** Per-document byte-level token ids + count under `merges` — the
    * [[Bpe.tokenIds]] contract (`token_ids array<long>`, `n_tokens`)
    * so the packing/assembly chain composes unchanged. */
  def byteTokenIds(docs: DataFrame, idCol: String, textCol: String,
                   merges: Seq[(String, String)]): DataFrame =
    docs.select(col(idCol),
        byteTokenIdsCol(docs.sparkSession, col(textCol), merges)
          .as("token_ids"))
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))

  /** EXACT inverse of [[byteTokenIds]]: ids → symbols → bytes →
    * UTF-8 text. Because pre-tokens partition the text and merges
    * only concatenate adjacent bytes, `decode(encode(text)) == text`
    * for ANY merge list and ANY text — no normalization caveat (the
    * lossless property that distinguishes byte-level BPE;
    * ByteBpeSpec pins it on multi-byte and emoji fixtures).
    * Out-of-range ids decode to U+FFFD bytes rather than throwing —
    * a corrupted shard decodes loudly-wrong, not fatally. */
  def decodeByteTokenIds(df: DataFrame, idCol: String, idsCol: String,
                         merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    val bcTok = spark.sparkContext.broadcast(
      merges.map { case (a, b) => a + b }.toArray)
    val decodeUdf = udf((ids: scala.collection.Seq[Long]) => {
      if (ids == null) null
      else {
        val toks = bcTok.value
        val sb = new java.lang.StringBuilder
        ids.foreach { id =>
          if (id >= 0L && id < 256L) sb.append(id.toChar)
          else if (id >= 256L && id < 256L + toks.length)
            sb.append(toks((id - 256L).toInt))
          else sb.append("\u00EF\u00BF\u00BD") // U+FFFD's UTF-8 bytes in byte-char space
        }
        fromByteChars(sb.toString)
      }
    })
    df.select(col(idCol), decodeUdf(col(idsCol)).as("decoded"))
  }
}
