package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Large-scale document deduplication operators (the LLM-training-data
  * pipeline surface; see PAPERS.md for the published MinHash/SimHash
  * background). Everything is composed from built-in codegen'd
  * expressions + shuffles on bucket keys — the shapes that survive
  * 100 TB:
  *
  *  - exact:     one hash-shuffle on a 128-bit digest
  *  - MinHash:   signatures computed in a single projection (no UDF);
  *               LSH banding turns all-pairs into per-bucket joins
  *  - SimHash:   64-bit fingerprint + pigeonhole banding for radius-k
  *               Hamming search
  *  - n-gram:    exact Jaccard verification for candidate pairs only
  *
  * All-pairs verification never happens: candidates come from bucket
  * joins, so the shuffle is proportional to collisions, not n².
  */
object Dedup {

  // ------------------------------------------------------------ exact

  /** Exact dedup: keeper = min id per content digest. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(idCol).as("keeper"), count(lit(1)).as("n_copies"))

  /** Normalized exact dedup (case/punct/whitespace-insensitive). */
  def normalized(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(Text.fingerprintMd5(col(textCol)).as("digest"))
      .agg(min(idCol).as("keeper"), count(lit(1)).as("n_copies"))

  // ---------------------------------------------------------- MinHash

  /** MinHash signature column: `numHashes` permutations approximated by
    * seeded xxhash64 (standard practice); one array column, computed in
    * a single codegen'd projection over the shingle set. */
  def minhashSignature(textCol: Column, numHashes: Int = 128, shingleK: Int = 5): Column = {
    val sh = Text.shingles(textCol, shingleK)
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(sh, s => xxhash64(s, seed))))
  }

  /** Estimated Jaccard from two signatures (fraction of agreeing
    * components). */
  def minhashSimilarity(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (a, b) => (a === b).cast("int")), x => x === 1))
      .cast("double") / size(sigA)

  /** LSH banding: one row per (band_id, band_hash) per doc. Docs sharing
    * any band bucket are candidate pairs — P(collision) ≈ 1-(1-s^r)^b. */
  def lshBuckets(df: DataFrame, idCol: String, textCol: String,
                 numHashes: Int = 128, bands: Int = 16, shingleK: Int = 5): DataFrame = {
    val r = numHashes / bands
    df.select(col(idCol).as("doc_id"),
        minhashSignature(col(textCol), numHashes, shingleK).as("sig"))
      .select(col("doc_id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws("_", slice(col("sig"), b * lit(r) + 1, lit(r))), b))))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_hash")
  }

  /** Candidate pairs from shared LSH buckets (doc_a < doc_b), deduped
    * across bands, with MinHash-estimated Jaccard attached. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 128, bands: Int = 16,
                        shingleK: Int = 5): DataFrame = {
    val b = lshBuckets(df, idCol, textCol, numHashes, bands, shingleK)
    val a = b.select(col("band_id"), col("band_hash"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val c = b.select(col("band_id"), col("band_hash"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(c, Seq("band_id", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        minhashSimilarity(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .groupBy("doc_a", "doc_b")
      .agg(first("est_jaccard").as("est_jaccard"))
  }

  /** Full MinHash+LSH near-dup detection with exact n-gram-set Jaccard
    * verification of candidates. Returns pairs ≥ threshold. */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.8, numHashes: Int = 128,
                   bands: Int = 16, shingleK: Int = 5): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, numHashes, bands, shingleK)
    val sh = df.select(col(idCol).as("id"), Text.shingles(col(textCol), shingleK).as("sh"))
    cands
      .join(sh.select(col("id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  // ---------------------------------------------------------- SimHash

  /** 64-bit SimHash fingerprint over whitespace tokens: per-bit
    * majority vote of token hashes. Pure columns; the per-token hash is
    * computed once and reused across all 64 bit tests. */
  def simhash(textCol: Column): Column = {
    val hashes = transform(Text.tokens(textCol), t => xxhash64(t))
    val bits = transform(sequence(lit(0), lit(63)), b =>
      when(aggregate(hashes, lit(0),
        (acc, h) => acc + when(call_function("shiftright", h, b).bitwiseAND(1) === 1, 1).otherwise(-1)) > 0,
        lit(1L)).otherwise(lit(0L)))
    aggregate(zip_with(bits, sequence(lit(0), lit(63)), (bit, i) => call_function("shiftleft", bit, i)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs within a Hamming radius, via pigeonhole
    * banding (split 64 bits into `radius+1` chunks: any pair within the
    * radius must agree on at least one chunk — no all-pairs scan). */
  def simhashDedup(df: DataFrame, idCol: String, textCol: String,
                   radius: Int = 3): DataFrame = {
    val chunks = radius + 1
    val width = 64 / chunks
    val withSig = df.select(col(idCol).as("doc_id"), simhash(col(textCol)).as("sig"))
    val banded = withSig.select(col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(chunks - 1)),
        c => call_function("shiftright", col("sig"), c * lit(width))
          .bitwiseAND(lit((1L << width) - 1)))))
      .withColumnRenamed("pos", "chunk_id").withColumnRenamed("col", "chunk")
    val a = banded.select(col("chunk_id"), col("chunk"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("chunk_id"), col("chunk"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk_id", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        hamming(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= radius)
      .groupBy("doc_a", "doc_b").agg(first("hamming").as("hamming"))
  }

  // ------------------------------------------------------ n-gram Jaccard

  /** Exact word n-gram Jaccard for all candidate pairs sharing at least
    * one n-gram (inverted-index join — prefix filtering is the scale
    * upgrade). Returns pairs ≥ threshold. */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val grams = df.select(col(idCol).as("doc_id"),
      Text.wordNgrams(col(textCol), n).as("grams"))
    val inv = grams.select(col("doc_id"), explode(col("grams")).as("gram"))
    inv.select(col("gram"), col("doc_id").as("doc_a"))
      .join(inv.select(col("gram"), col("doc_id").as("doc_b")), "gram")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      .join(grams.select(col("doc_id").as("doc_a"), size(col("grams")).as("n_a")), "doc_a")
      .join(grams.select(col("doc_id").as("doc_b"), size(col("grams")).as("n_b")), "doc_b")
      .withColumn("jaccard", col("shared").cast("double") /
        (col("n_a") + col("n_b") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }
}
