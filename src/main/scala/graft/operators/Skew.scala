package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins. AQE's skew-join handling splits
  * oversized SHUFFLE partitions at runtime and is the first line of
  * defense (enabled in the bench session); explicit salting is for the
  * cases AQE can't fix — e.g. a hot key whose rows must still meet the
  * other side, or a non-AQE environment. Salting spreads one logical
  * key across `salt` shuffle partitions by joining on (key, salt): the
  * big side gets a per-row salt, the small side is replicated once per
  * salt value, so every pair still meets exactly once.
  */
object Skew {

  /** Salted equi-join on `key`. Supported joinType: `inner` or `left`
    * (small-side-duplicating types like right/full would multiply
    * unmatched small rows and are rejected). Result is row-identical to
    * `large.join(small, key, joinType)` — only the shuffle distribution
    * changes: the hot key's rows land on `salt` partitions instead of
    * one. */
  /** The per-row salt derivation [[saltedJoin]] applies to the large
    * side — exposed so the spread spec asserts the REAL column, not a
    * re-derivation that would keep passing after a regression. */
  private[graft] def saltCol(salt: Int): org.apache.spark.sql.Column =
    pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int")

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salt: Int = 8, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, got $joinType")
    require(salt > 0, "salt must be positive")
    // any per-row spread works (the salt never affects the result);
    // monotonically increasing ids round-robin within each input split
    val saltedLarge = large.withColumn("_salt", saltCol(salt))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
