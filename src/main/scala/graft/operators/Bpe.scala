package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Byte-pair-encoding vocabulary learning and tokenization — the real
  * subword tokenizer behind "token count" pipeline gates (upgrading
  * the regex approximation `Text.tokenCountBpe` battery-exposes).
  *
  * The recipe is the public Sennrich et al. 2016 algorithm, split the
  * way it actually scales: the DISTRIBUTED half reduces the corpus to
  * a (word, count) histogram — vocabulary-sized, not corpus-sized —
  * and the greedy merge loop then runs driver-side over that
  * histogram, exactly as reference BPE trainers do (the loop is
  * inherently sequential: every merge depends on the counts the
  * previous one rewrote). At 100 TB the histogram is still the only
  * thing collected; `minCount` prunes the long tail of hapax words
  * before collect, which bounds driver memory without touching the
  * learned merges (rare words can't win a max-count merge anyway
  * while `minCount` ≪ the top pair counts).
  *
  * Tokenization back over the corpus is embarrassingly parallel: the
  * learned merge ranks broadcast, and each word re-merges greedily by
  * rank (lowest rank first — the standard apply rule).
  *
  * Determinism: pair selection breaks count ties lexicographically,
  * so the merge list is a pure function of the histogram, which is a
  * pure function of the corpus. Not SQL-expressible (the merge loop
  * is iterative-greedy), hence the q82 battery entry is rows-only;
  * BpeSpec pins the algorithm against hand-derived merges and the
  * roundtrip/monotonicity invariants instead.
  */
object Bpe {

  private val EndOfWord = "</w>"

  /** The distributed half: normalized word histogram, tail-pruned. */
  def wordHistogram(docs: DataFrame, textCol: String,
                    minCount: Long = 1L): DataFrame =
    docs.select(explode(split(Text.normalizeText(col(textCol)), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)

  /** Driver-side greedy merge loop over a collected histogram, with
    * INCREMENTAL pair-count maintenance (the reference-trainer
    * optimization): a merge only changes the counts of pairs inside
    * words that contain the merged pair, so only those words are
    * rewritten and only their pair deltas applied — never a full
    * recount. Selection rides a lazily-invalidated max-heap: every
    * count change pushes a fresh `(count, pair)` entry, and pops
    * discard entries whose snapshot no longer matches the live count.
    * Per merge the cost is O(|words containing the pair| · |word| +
    * heap churn), vs the previous O(Σ|word|·|histogram|) full rescan —
    * the difference between minutes and hours at a 32k-merge
    * vocabulary over a 1M-word histogram. The selection rule
    * (max count, ties broken lexicographically) is unchanged, so the
    * merge list is bit-identical to the rescan form's. */
  private[operators] def trainOnHistogram(hist: Seq[(String, Long)],
                                          numMerges: Int,
                                          appendEow: Boolean = true)
      : Seq[(String, String)] = {
    // appendEow=false is the BYTE-level trainer ([[ByteBpe]]): no
    // end-of-word symbol, items are pre-tokens, the loop is identical
    val words: Array[(Vector[String], Long)] =
      hist.map { case (w, n) =>
        (w.map(_.toString).toVector ++
          (if (appendEow) Vector(EndOfWord) else Vector.empty), n)
      }.toArray
    val stats = scala.collection.mutable.Map.empty[(String, String), Long]
    // pair -> indices of words that contained the pair when last
    // rewritten (a superset of current holders; re-verified at use)
    val holders = scala.collection.mutable.Map
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    val changed = scala.collection.mutable.Set.empty[(String, String)]
    def applyPairDeltas(idx: Int, sign: Long): Unit = {
      val (syms, n) = words(idx)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val c = stats.getOrElse(p, 0L) + sign * n
        if (c == 0L) stats.remove(p) else stats(p) = c
        changed += p
        if (sign > 0L)
          holders.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += idx
        i += 1
      }
    }
    words.indices.foreach(applyPairDeltas(_, 1L))
    // max-heap on (count, pair): larger count first, then the
    // lexicographically SMALLEST pair — the old minBy((-n, a, b)) rule
    val ord = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val ca = y._2.compareTo(x._2)
          if (ca != 0) ca else y._3.compareTo(x._3)
        }
      }
    }
    val heap = scala.collection.mutable.PriorityQueue.empty[(Long, String, String)](ord)
    def flushChanged(): Unit = {
      changed.foreach { p =>
        stats.get(p).foreach(n => heap.enqueue((n, p._1, p._2)))
      }
      changed.clear()
    }
    flushChanged()
    val merges = Seq.newBuilder[(String, String)]
    var done = 0
    while (done < numMerges && stats.nonEmpty) {
      // pop until an entry matches the live count — stale snapshots
      // (from before a delta) are discarded here
      var best: (String, String) = null
      while (best == null && heap.nonEmpty) {
        val (n, a, b) = heap.dequeue()
        if (stats.get((a, b)).contains(n)) best = (a, b)
      }
      if (best == null) return merges.result()
      merges += best
      val joined = best._1 + best._2
      holders.remove(best).foreach(_.foreach { idx =>
        val (syms, n) = words(idx)
        // the holder set is a stale superset; re-verify membership
        var has = false
        var i = 0
        while (!has && i < syms.length - 1) {
          has = syms(i) == best._1 && syms(i + 1) == best._2
          i += 1
        }
        if (has) {
          applyPairDeltas(idx, -1L)
          val out = Vector.newBuilder[String]
          i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += joined; i += 2
            } else { out += syms(i); i += 1 }
          }
          words(idx) = (out.result(), n)
          applyPairDeltas(idx, 1L)
        }
      })
      flushChanged()
      done += 1
    }
    merges.result()
  }

  /** Learn `numMerges` BPE merges from the corpus. */
  def trainMerges(docs: DataFrame, textCol: String, numMerges: Int,
                  minCount: Long = 1L): Seq[(String, String)] = {
    val hist = wordHistogram(docs, textCol, minCount)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainOnHistogram(hist, numMerges)
  }

  /** Tokenize one normalized word under the merge ranks: greedily
    * apply the LOWEST-rank applicable merge until none applies. */
  private[operators] def tokenizeWord(word: String,
                                      rank: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector :+ EndOfWord
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

  /** Reserved token id for the sequence separator (EOS) the packed-
    * sequence assembler inserts between documents. */
  val SepId = 0L

  /** Deterministic token-id scheme that is a pure function of the
    * merge list — no corpus pass, no collected vocabulary: id 0 is
    * reserved for the sequence separator ([[SepId]]), id 1 is the
    * end-of-word symbol `</w>`, merge OUTPUTS take `2 + rank` in merge
    * order (the order a BPE vocab file lists them), and any remaining
    * single-character base symbol maps to `2 + |merges| + codepoint` —
    * a codepoint base vocabulary, the same move byte-level BPE makes
    * with its 256 base ids. Every engine can replay the mapping
    * closed-form (the q145 oracle does), and ids are stable under
    * corpus growth because nothing is corpus-derived. Two merges whose
    * outputs collide on the same string (("a","bc") and ("ab","c"))
    * share the first rank's id — key on output strings like vocab
    * files do; the committed battery merges are collision-free. */
  def tokenId(token: String, merges: Seq[(String, String)]): Long =
    if (token == EndOfWord) 1L
    else {
      val i = merges.indexWhere { case (a, b) => a + b == token }
      if (i >= 0) 2L + i else 2L + merges.length + token.codePointAt(0)
    }

  /** Per-document token-ID sequences under the learned merges — the
    * trainer-feed form of [[tokenCount]]: one `array<long>` of
    * [[tokenId]]s per document, word tokens in document order, plus
    * `n_tokens`. Same scale shape as [[tokenCount]]: the rank and id
    * tables broadcast, one narrow pass, no shuffle; NULL text
    * tokenizes to the empty array so packing offsets stay aligned. */
  def tokenIds(docs: DataFrame, idCol: String, textCol: String,
               merges: Seq[(String, String)]): DataFrame =
    docs.select(col(idCol),
        tokenIdsCol(docs.sparkSession, col(textCol), merges).as("token_ids"))
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))

  /** Column form of [[tokenIds]] — for row-local chains that must
    * carry other columns alongside the ids without a re-join on the
    * id (the q182 chat chain renders, span-derives, and tokenizes in
    * ONE projection). Same normalize + broadcast-rank kernel. */
  def tokenIdsCol(spark: SparkSession, text: Column,
                  merges: Seq[(String, String)]): Column = {
    val mlist = merges.toIndexedSeq
    val bcRank = spark.sparkContext.broadcast(
      mlist.zipWithIndex.map { case (p, i) => p -> i }.toMap)
    // first-rank-wins on output-string collisions, per the tokenId doc
    val bcId = spark.sparkContext.broadcast(
      mlist.zipWithIndex.reverse
        .map { case ((a, b), i) => (a + b) -> (2L + i) }.toMap)
    val base = 2L + mlist.length
    val idsUdf = udf((text: String) => {
      if (text == null) Array.empty[Long]
      else {
        val rank = bcRank.value
        val mergeId = bcId.value
        val out = Array.newBuilder[Long]
        text.split(" ").foreach { w =>
          if (w.nonEmpty) tokenizeWord(w, rank).foreach { t =>
            out += (if (t == EndOfWord) 1L
                    else mergeId.getOrElse(t, base + t.codePointAt(0)))
          }
        }
        out.result()
      }
    })
    idsUdf(Text.normalizeText(text))
  }

  /** One (header_tokens, body_tokens) pair per chat turn. */
  case class TurnCounts(header_tokens: Long, body_tokens: Long)

  /** Per-turn BPE token counts for a [[graft.functions.Text
    * .chatTurnUnits]] array — the geometry a multi-turn SFT mask
    * needs ([[graft.functions.Text.turnMaskSpans]]): each turn's
    * header and body segment is normalized and counted with the SAME
    * kernel as [[tokenCount]], and because every segment boundary is
    * whitespace, the counts sum EXACTLY to the full rendering's token
    * count (BpeSpec pins the additivity; the q182 oracle re-derives
    * every packing offset from these counts, so a violation breaks
    * the hash). Adds `turn_counts array<struct<header_tokens,
    * body_tokens>>` aligned with the units. One broadcast rank table,
    * row-local, no shuffle. */
  def turnTokenCounts(df: DataFrame, unitsCol: String,
                      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap)
    val countsUdf = udf(
      (headers: scala.collection.Seq[String],
       bodies: scala.collection.Seq[String]) => {
        if (headers == null || bodies == null) null
        else {
          val rank = bc.value
          def cnt(s: String): Long = {
            var total = 0L
            if (s != null) s.split(" ").foreach { w =>
              if (w.nonEmpty) total += tokenizeWord(w, rank).length
            }
            total
          }
          headers.zip(bodies).map { case (h, b) =>
            TurnCounts(cnt(h), cnt(b))
          }.toSeq
        }
      })
    df.withColumn("turn_counts", countsUdf(
      transform(col(unitsCol), u => Text.normalizeText(u.getField("header"))),
      transform(col(unitsCol), u => Text.normalizeText(u.getField("body")))))
  }

  /** Inverse of [[tokenIds]] under the same merge list — the
    * DETOKENIZER a trainer-side inspection/debug path needs (and the
    * proof the id scheme loses nothing): id 0 ([[SepId]]) contributes
    * no text (a document boundary), id 1 is a bare end-of-word
    * (word boundary → space), merge-output ids look up their output
    * string (a `</w>` SUFFIX — it can only ever be terminal, nothing
    * merges past end-of-word — strips to a space), and codepoint-base
    * ids decode to their character (out-of-range ids to U+FFFD rather
    * than throwing — a corrupted shard should decode loudly-wrong,
    * not kill the job). BPE merging only ever concatenates adjacent
    * symbols, so decode(tokenIds(text)) == normalized text EXACTLY,
    * for ANY merge list — BpeSpec pins the roundtrip under the
    * committed, the chained, and a learned merge list. */
  def decodeTokenIds(df: DataFrame, idCol: String, idsCol: String,
                     merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    val mlist = merges.toIndexedSeq
    val base = 2L + mlist.length
    val bcTok = spark.sparkContext.broadcast(
      mlist.map { case (a, b) => a + b }.toArray)
    val decodeUdf = udf((ids: scala.collection.Seq[Long]) => {
      if (ids == null) null
      else {
        val toks = bcTok.value
        val sb = new StringBuilder
        ids.foreach { id =>
          if (id == SepId) ()
          else if (id == 1L) sb.append(' ')
          else if (id >= 2L && id < base) {
            val t = toks((id - 2L).toInt)
            if (t.endsWith(EndOfWord)) {
              // substring, not append(t, 0, n): the scala
              // StringBuilder lacks the 3-arg CharSequence overload
              // and silently resolves it to append(Any) on a tuple
              sb.append(t.substring(0, t.length - EndOfWord.length))
              sb.append(' ')
            } else sb.append(t)
          } else {
            val cp = id - base
            if (cp >= 0L && cp <= Character.MAX_CODE_POINT.toLong)
              sb.appendAll(Character.toChars(cp.toInt))
            else sb.append('�')
          }
        }
        if (sb.nonEmpty && sb.charAt(sb.length - 1) == ' ')
          sb.setLength(sb.length - 1)
        sb.toString
      }
    })
    df.select(col(idCol), decodeUdf(col(idsCol)).as("decoded"))
  }

  /** Per-document BPE token count under the learned merges: one
    * broadcast of the rank table, one narrow pass over the corpus. */
  def tokenCount(docs: DataFrame, idCol: String, textCol: String,
                 merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap)
    val countUdf = udf((text: String) => {
      if (text == null) 0L
      else {
        val rank = bc.value
        var total = 0L
        text.split(" ").foreach { w =>
          if (w.nonEmpty) total += tokenizeWord(w, rank).length
        }
        total
      }
    })
    docs.select(col(idCol),
      countUdf(Text.normalizeText(col(textCol))).as("n_bpe_tokens"))
  }
}
