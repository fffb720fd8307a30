package graft

class SparkEntrySpec extends SparkSpec {

  test("entry flagship query returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle belongs to a query; names are stable q-prefixed keys") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os -- qs}")
    assert(qs.forall(_.matches("q\\d{2,3}[a-z]?_[a-z0-9_]+")), qs.mkString(","))
  }

  test("every query runs and yields rows at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned 0 rows at sf0.001")
    }
  }
}
