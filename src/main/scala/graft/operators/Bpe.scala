package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Driver-side greedy merge loop over a collected histogram. */
  private[operators] def trainOnHistogram(hist: Seq[(String, Long)],
                                          numMerges: Int): Seq[(String, String)] = {
    var words: Seq[(Vector[String], Long)] =
      hist.map { case (w, n) => (w.map(_.toString).toVector :+ EndOfWord, n) }
    val merges = Seq.newBuilder[(String, String)]
    var done = 0
    while (done < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- words; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + n))
      if (counts.isEmpty) return merges.result()
      val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
      merges += best
      val joined = best._1 + best._2
      words = words.map { case (syms, n) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
            out += joined; i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.result(), n)
      }
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
