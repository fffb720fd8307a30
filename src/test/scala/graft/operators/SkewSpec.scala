package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 95% of fact rows share one hot key — the shape AQE/salting exist for
  private lazy val fact = spark.range(0, 20000)
    .select((when($"id" % 20 =!= 0, 0L).otherwise($"id" % 7 + 1)).as("k"),
      $"id".as("v"))
  private lazy val dim = (0L to 7L).map(k => (k, s"name_$k")).toDF("k", "name")

  test("salted inner join returns exactly the plain join's rows") {
    val plain = fact.join(dim, Seq("k")).agg(count(lit(1)), sum($"v"),
      sum(length($"name"))).collect().head
    val salted = Skew.saltedJoin(fact, dim, "k", salt = 8)
      .agg(count(lit(1)), sum($"v"), sum(length($"name"))).collect().head
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted left join keeps unmatched rows exactly once") {
    val factWithOrphans = fact.union(Seq((99L, -1L), (98L, -2L)).toDF("k", "v"))
    val plain = factWithOrphans.join(dim, Seq("k"), "left")
    val salted = Skew.saltedJoin(factWithOrphans, dim, "k", salt = 8, joinType = "left")
    assert(salted.count() == plain.count())
    assert(salted.filter($"name".isNull).count() == 2)
  }

  test("join shuffles on (key, salt) — the hot key spreads across partitions") {
    val plan = Skew.saltedJoin(fact, dim, "k", salt = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), plan)
    // the hot key's rows really land on multiple salt values — asserted
    // on the implementation's own derivation (a local re-derivation
    // would keep passing if saltedJoin regressed to a constant salt)
    val spread = fact.withColumn("_salt", Skew.saltCol(8))
      .filter($"k" === 0).select("_salt").distinct().count()
    assert(spread == 8, s"hot key spread over $spread salts")
  }

  test("small-side-duplicating join types are rejected") {
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, "k", joinType = "full")
    }
  }
}
