package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-independent sampling for reproducible data
  * pipelines. `df.sample()` draws from a per-partition RNG: the result
  * changes with partitioning, retries, and Spark versions, which makes
  * experiment reruns and cross-system audits impossible. Here
  * membership is a pure function of the row's id — keep the row iff a
  * hex prefix of `md5(salt || id)` falls under the fraction's
  * threshold — so any engine with md5 (DuckDB oracles included)
  * selects the exact same rows, partitioning never matters, and
  * changing the salt draws a fresh independent sample.
  *
  * The predicate is a codegen'd column expression; at 100 TB the
  * sample is a scan-side filter with no shuffle at all.
  */
object Sampling {

  private val HexWidth = 8              // 32 bits of the digest
  private val HexSpace = 1L << (4 * HexWidth)

  /** `md5(salt || id)` hex prefix as a lexicographic threshold string:
    * uniform in [0, 16^8), compared as lowercase hex in any engine. */
  private def bucketCol(idCol: Column, salt: String): Column =
    substring(md5(concat(lit(salt), idCol.cast("string"))), 1, HexWidth)

  /** The threshold hex string for a fraction (rows strictly below it
    * are kept): `hex(floor(f * 16^8))`, zero-padded to 8 chars. */
  def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    val cut = math.min(HexSpace, math.floor(fraction * HexSpace).toLong)
    if (cut >= HexSpace) "g" // > every hex digit: keep all
    else f"$cut%08x"
  }

  /** Keep ≈`fraction` of rows, membership decided by
    * `md5(salt || id)` — deterministic across engines, partitionings,
    * and reruns. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
                 salt: String = "graft"): DataFrame =
    df.filter(bucketCol(col(idCol), salt) < lit(thresholdHex(fraction)))

  /** Per-stratum fractions (strata absent from the map are dropped) —
    * the deterministic form of `sampleBy`, e.g. down-weighting an
    * over-represented source in a training mixture. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       salt: String = "graft"): DataFrame = {
    require(fractions.nonEmpty, "stratifiedSample needs at least one stratum")
    val bucket = bucketCol(col(idCol), salt)
    val keep = fractions.foldLeft(lit(false)) { case (acc, (stratum, f)) =>
      acc || (col(strataCol) === lit(stratum) && bucket < lit(thresholdHex(f)))
    }
    df.filter(keep)
  }

  /** Exactly `n` rows (fewer if the input is smaller): the n smallest
    * `md5(salt || id)` digests — a uniform fixed-size draw that plans
    * as TakeOrderedAndProject (per-partition top-n + single merge, no
    * global sort shuffle). Deterministic: the full digest is the sort
    * key, with the id as an unambiguous tiebreak. */
  def fixedSizeSample(df: DataFrame, idCol: String, n: Int,
                      salt: String = "graft"): DataFrame = {
    require(n >= 0, s"sample size must be non-negative, got $n")
    df.withColumn("__draw", md5(concat(lit(salt), col(idCol).cast("string"))))
      .orderBy(col("__draw"), col(idCol))
      .limit(n)
      .drop("__draw")
  }
}
