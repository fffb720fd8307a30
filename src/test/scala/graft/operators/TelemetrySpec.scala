package graft.operators

import graft.SparkSpec
import graft.functions.Text
import org.apache.spark.sql.functions._

class TelemetrySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select("doc_id", "source", "text")

  private def exactReport() = {
    val toks = docs.select(col("source"),
      explode(Text.tokens(col("text"))).as("term"))
    val per = toks.groupBy("source").agg(
      count(lit(1)).as("n_tokens"), countDistinct("term").as("ndv_tokens"))
    val dcs = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val top = toks.groupBy("source", "term").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(col("n").desc, col("term"))))
      .filter(col("rn") === 1)
      .select(col("source"), col("term").as("top_term"), col("n").as("top_n"))
    dcs.join(per, "source").join(top, "source")
      .select("source", "n_docs", "n_tokens", "ndv_tokens", "top_term", "top_n")
  }

  test("one-shot telemetry report equals the exact recomputation") {
    val got = Telemetry.report(
        Telemetry.telemetry(docs, "source", "text"), "source")
      .orderBy("source").collect().map(_.toSeq).toSeq
    val want = exactReport().orderBy("source").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("merging arbitrary splits reproduces the one-shot state column for column") {
    val parts = (0 until 3).map(i => docs.filter(col("doc_id") % 3 === i))
    val merged = parts.map(Telemetry.telemetry(_, "source", "text"))
      .reduce(Telemetry.merge(_, _, "source"))
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("source").collect().map { r =>
        (r.getString(0), r.getLong(1), r.getLong(2),
          r.getSeq[Long](3).toList, r.getMap[String, Long](4).toList.sorted)
      }.toList
    assert(snap(merged) == snap(Telemetry.telemetry(docs, "source", "text")))
  }

  test("merge is a true full-outer: one-sided groups survive, counts add") {
    val a = Telemetry.telemetry(docs.filter(col("source") === "src0"),
      "source", "text")
    val b = Telemetry.telemetry(
      docs.filter(col("source").isin("src0", "src1")), "source", "text")
    val m = Telemetry.merge(a, b, "source")
      .select("source", "n_docs").as[(String, Long)].collect().toMap
    val n0 = docs.filter(col("source") === "src0").count()
    val n1 = docs.filter(col("source") === "src1").count()
    assert(m == Map("src0" -> 2 * n0, "src1" -> n1))
  }

  test("streamed maintenance over 3 micro-batches equals the one-shot report") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val state = "graft_telemetry_spec_state"
    spark.sql(s"DROP TABLE IF EXISTS $state")
    spark.sql(s"DROP TABLE IF EXISTS ${state}_staging")
    graft.sources.Warehouse.clearOrphanLocation(spark, state)
    graft.sources.Warehouse.clearOrphanLocation(spark, s"${state}_staging")
    val rows = docs.as[(Long, String, String)].collect()
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)]
    val ckpt = graft.sources.Scratch.dir("telemetry_ckpt").toString
    val q = graft.streaming.Maintenance.streamingTelemetry(
      mem.toDF().toDF("doc_id", "source", "text"), "source", "text",
      state, ckpt)
    try {
      rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      // an empty drain delivers no new batch and must change nothing
      q.processAllAvailable()
    } finally q.stop()
    spark.catalog.refreshTable(state)
    val got = Telemetry.report(spark.table(state), "source")
      .orderBy("source").collect().map(_.toSeq).toSeq
    val want = exactReport().orderBy("source").collect().map(_.toSeq).toSeq
    assert(got == want)
  }
}
