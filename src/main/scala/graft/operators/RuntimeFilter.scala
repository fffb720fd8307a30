package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Runtime-filter join pruning: kill fact rows BEFORE the join's
  * shuffle using a Bloom filter built from the (already filtered)
  * dimension side's keys.
  *
  * At 100 TB the dominant cost of `fact JOIN dim WHERE dim.pred` is
  * shuffling the whole fact table, even though only the small matching
  * fraction survives the join. A Bloom filter over the dim keys is a
  * few MB regardless of fact size; broadcast it and evaluate
  * `mightContain` as a scan-side filter, and the shuffle moves only
  * (matching + fpp·nonmatching) rows. False positives are harmless —
  * the real join still runs and drops them — so the result is EXACTLY
  * the plain join (q74's oracle is the plain join), and false
  * negatives are impossible by the filter's one-sided guarantee.
  *
  * Spark can inject this itself (`spark.sql.optimizer.runtime.
  * bloomFilter.enabled`) when stats make the benefit obvious; the
  * explicit form is for the pipeline author who KNOWS the dim
  * predicate is selective — index build and pruning semantics stay
  * deterministic instead of depending on cost estimates.
  */
object RuntimeFilter {

  /** `fact` rows whose `factKey` (long) might be in `dim`'s `dimKey`
    * set, per a Bloom filter of `fpp` built over the dim keys. Null
    * keys are dropped (they can never equi-join). The UDF is the one
    * non-codegen'd step; it is a single hash probe per row against a
    * broadcast bitset — still orders cheaper than shuffling the row.
    */
  def bloomMightContain(fact: DataFrame, dim: DataFrame,
                        factKey: String, dimKey: String,
                        expectedKeys: Long, fpp: Double): DataFrame = {
    // Fail fast on non-integral keys: the probe casts to long, and a
    // string/decimal key would cast to null row-by-row — silently
    // dropping EVERY fact row instead of matching the plain join.
    def requireIntegral(df: DataFrame, key: String, side: String): Unit = {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val dt = df.schema(key).dataType
      val ok = dt == LongType || dt == IntegerType || dt == ShortType || dt == ByteType
      require(ok, s"bloom runtime filter needs an integral $side key; '$key' is $dt")
    }
    requireIntegral(fact, factKey, "fact")
    requireIntegral(dim, dimKey, "dim")
    val bloom = dim.stat.bloomFilter(dimKey, expectedKeys, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bloom)
    val might = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
    fact.filter(might(col(factKey).cast("long")))
  }

  /** The pruned equi-join: bloom-filter `fact` against `dim`'s keys,
    * then run the exact join. Equal to `fact.join(dim, ...)` row for
    * row; the bloom only changes how many fact rows reach the shuffle.
    */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String,
                      expectedKeys: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    val pruned = bloomMightContain(fact, dim, factKey, dimKey, expectedKeys, fpp)
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }
}
