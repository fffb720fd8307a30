package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical retrieval over the corpus: BM25 (Robertson/Spärck Jones),
  * the standard bag-of-words relevance score and the classic lexical
  * complement to the embedding-based rankers in [[Similarity]].
  *
  * Scale shape: one corpus scan computes per-document term frequencies
  * for the query terms only (the filter happens inside the token
  * explode, so the shuffle carries ≤ |terms| rows per doc, not the
  * vocabulary); document-frequency and corpus statistics are one-row
  * frames broadcast back — no collect, no driver round-trip, no
  * global inverted index needed for ad-hoc queries. For a standing
  * query workload, materialize `termStats` once and reuse it.
  */
object Retrieval {

  /** Lower-cased whitespace token array per document. */
  private def tokensOf(textCol: String) =
    filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0)

  /** Tokens exploded as `(doc_id, term, dl)` with `dl` = document token
    * length. */
  private def tokenRows(docs: DataFrame, idCol: String, textCol: String) =
    docs.select(col(idCol).as("doc_id"), tokensOf(textCol).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))

  /** BM25 score of every matching document against a bag-of-words
    * query: `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`
    * with `idf = ln(1 + (N − df + 0.5)/(df + 0.5))`. Documents
    * containing no query term are absent (score 0). Output:
    * `(doc_id, score)`.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val terms = queryTerms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    val rows = tokenRows(docs, idCol, textCol)

    // corpus stats as one-row broadcast frames — never collected.
    // avgdl comes from size(tokens) per row: a map-side aggregate with
    // no explode (the earlier explode+regroup form shuffled one row per
    // token of the whole corpus to compute one number) — and it counts
    // EVERY document, zero-token ones included, matching the standard
    // all-docs avgdl definition and the q54 oracle's dl CTE
    val corpus = docs.agg(count(lit(1)).as("n_docs"))
    val avgdl = docs.select(size(tokensOf(textCol)).as("dl"))
      .agg(avg(col("dl")).as("avgdl"))

    // tf over query terms only: the explode filter keeps the shuffle
    // narrow (≤ |terms| rows per doc)
    val tf = rows.filter(col("term").isInCollection(terms))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))

    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(corpus))
      .crossJoin(broadcast(avgdl))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib",
        col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + (col("dl") / col("avgdl") * b + (1 - b)) * k1))
      .groupBy("doc_id")
      .agg(sum(col("contrib")).as("score"))
  }

  /** Top-`n` BM25 hits, ranked by score descending with the id as a
    * deterministic tiebreak — planned as TakeOrderedAndProject
    * (per-partition top-n, no global sort shuffle). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], n: Int = 10, k1: Double = 1.2,
               b: Double = 0.75): DataFrame =
    bm25(docs, idCol, textCol, queryTerms, k1, b)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(n)
}
