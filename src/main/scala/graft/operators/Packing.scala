package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget bins for
  * training-batch assembly. True first-fit bin packing is inherently
  * sequential (each placement depends on every earlier bin's fill);
  * the scalable form is CONTIGUOUS packing — fix a deterministic
  * document order, take the running token total, and cut a bin
  * boundary every `budget` tokens: `bin = floor(cum_before / budget)`.
  * Bins straddle boundaries by at most one document (the straddler is
  * then truncated or carried by the batch assembler), which is exactly
  * the standard pack-then-split used for pretraining shards.
  *
  * Scale shape: one window sort per shard. Sharding is the lever —
  * rows are first hash-sharded (deterministically, by id), each shard
  * packs independently, so the sort parallelizes and no single-
  * partition global window appears anywhere. More shards = more
  * parallelism and the same per-bin statistics.
  */
object Packing {

  /** Adds `shard` (deterministic id hash in [0, shards)) and `bin`
    * (contiguous token-budget index within the shard, by ascending
    * `orderCol`). Output = input columns + (shard, bin).
    */
  def packContiguous(df: DataFrame, idCol: String, sizeCol: String,
                     budget: Long, shards: Int = 1,
                     orderCol: Option[String] = None): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val ord = orderCol.getOrElse(idCol)
    // same engine-independent draw as Sampling: md5 hex prefix mod shards
    val shard = pmod(conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(shards.toLong)).cast("int")
    // id tiebreak: a user-supplied orderCol with duplicate values would
    // otherwise sum in shuffle-arrival order and cut nondeterministic
    // bin boundaries
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col(ord), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("shard", shard)
      .withColumn("bin",
        floor(coalesce(sum(col(sizeCol)).over(w), lit(0L)) / budget))
  }
}
