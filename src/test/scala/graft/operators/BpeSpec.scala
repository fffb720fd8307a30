package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE semantics behind the rows-only q82 entry: the merge loop
  * matches a hand-derived trace, tokenization is a lossless
  * segmentation, counts are monotone in the merge budget, and the
  * whole thing is deterministic under repartitioning.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge loop reproduces the hand-derived trace, ties broken lexicographically") {
    // hist {ab:3, abc:2} — derived by hand:
    //   pairs (a,b):5 (b,</w>):3 (b,c):2 (c,</w>):2  → merge (a,b)
    //   pairs (ab,</w>):3 (ab,c):2 (c,</w>):2        → merge (ab,</w>)
    //   tie (ab,c):2 vs (c,</w>):2 → lexicographic   → merge (ab,c)
    //   then                                           merge (abc,</w>)
    val merges = Bpe.trainOnHistogram(Seq(("ab", 3L), ("abc", 2L)), 4)
    assert(merges == Seq(("a", "b"), ("ab", "</w>"), ("ab", "c"), ("abc", "</w>")))
    // budget past exhaustion stops early instead of looping
    assert(Bpe.trainOnHistogram(Seq(("ab", 3L), ("abc", 2L)), 100).size == 4)
  }

  test("tokenizeWord applies merges by rank and segments losslessly") {
    val merges = Seq(("a", "b"), ("ab", "</w>"), ("ab", "c"), ("abc", "</w>"))
    val rank = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    assert(Bpe.tokenizeWord("ab", rank) == Vector("ab</w>"))
    assert(Bpe.tokenizeWord("abc", rank) == Vector("abc</w>"))
    assert(Bpe.tokenizeWord("abx", rank) == Vector("ab", "x", "</w>"))
    // lossless segmentation on words with untrained chars
    val toks = Bpe.tokenizeWord("cabbage", rank)
    assert(toks.mkString == "cabbage</w>")
  }

  private lazy val docs =
    graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("corpus training is deterministic and counts are monotone in the merge budget") {
    val m50 = Bpe.trainMerges(docs, "text", 50)
    val m50again = Bpe.trainMerges(docs.repartition(5), "text", 50)
    assert(m50 == m50again, "merge list depends on partitioning")
    val m10 = Bpe.trainMerges(docs, "text", 10)
    assert(m50.take(10) == m10, "merge prefix not stable across budgets")
    val c10 = Bpe.tokenCount(docs, "doc_id", "text", m10)
      .agg(sum("n_bpe_tokens")).head.getLong(0)
    val c50 = Bpe.tokenCount(docs, "doc_id", "text", m50)
      .agg(sum("n_bpe_tokens")).head.getLong(0)
    assert(c50 <= c10, s"more merges must not grow the token count: $c50 > $c10")
    // every merge strictly reduces the corpus token count it targets
    assert(c50 < c10, "50-merge vocab failed to compress at all")
  }

  test("minCount prunes the histogram tail, not the learned merges") {
    // top pair counts dwarf hapax words here, so pruning count-1 words
    // must leave the early merges untouched (the scaladoc claim)
    val pruned = Bpe.wordHistogram(docs, "text", minCount = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val full = Bpe.wordHistogram(docs, "text", minCount = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(pruned.size <= full.size)
    val a = Bpe.trainOnHistogram(full, 10)
    val b = Bpe.trainOnHistogram(pruned, 10)
    assert(a == b, "tail pruning changed the early merges on this corpus")
  }

  test("committed q82 merges: greedy tokenization equals the closed-form count") {
    // the merges are character-disjoint and non-chaining, so
    // tokens(word) = len+1 − occ('th') − occ('in') − endswith('e')
    // with occ = non-overlapping left-to-right count — the identity the
    // DuckDB oracle replays via replace(). Adversarial words cover:
    // repeated self-adjacent pairs, merge-created adjacency that must
    // NOT re-pair (merged symbols are atomic), multiple merges in one
    // word, and the end-of-word merge.
    val merges = graft.SparkEntry.CommittedBpeMerges
    val rank = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    def occ(w: String, p: String): Int = (w.length - w.replace(p, "").length) / 2
    def closedForm(w: String): Int =
      w.length + 1 - occ(w, "th") - occ(w, "in") -
        (if (w.endsWith("e")) 1 else 0)
    val words = Seq("ththth", "tthh", "thh", "tht", "ine", "thin", "inin",
      "tin", "e", "the", "thine", "einstein", "ninth", "neither", "x",
      "in", "th", "intthin")
    words.foreach { w =>
      assert(Bpe.tokenizeWord(w, rank).length == closedForm(w),
        s"'$w': ${Bpe.tokenizeWord(w, rank)} vs closed-form ${closedForm(w)}")
    }
  }
}
