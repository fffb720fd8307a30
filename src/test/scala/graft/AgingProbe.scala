package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe (round 17): does codegen-cache thrash explain the
  * in-battery premium on the iterative family? Protocol: warm q95 to
  * steady state at sf0.1, churn the bounded codegen cache by running
  * ~50 REAL battery queries (at sf0.01 — eviction depends on distinct
  * code shapes, not data size), re-measure q95; read CodegenMetrics
  * compile counters around each attempt. args: [maxEntries] [nChurn].
  * Delete after the round. */
object AgingProbe {
  def main(args: Array[String]): Unit = {
    val maxEntries = args.headOption.getOrElse("100")
    val nChurn = args.lift(1).map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-aging-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", maxEntries)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.1"
    import org.apache.spark.metrics.source.CodegenMetrics._
    def compCount = METRIC_COMPILATION_TIME.getCount
    def compMeanMs = METRIC_COMPILATION_TIME.getSnapshot.getMean

    val q95 = SparkEntry.queries("q95_pagerank")
    SparkEntry.queries("q04_lineitem_agg")(spark, sfDir).count()

    def attempt(tag: String): Unit = {
      System.gc()
      val c0 = compCount
      val t0 = System.nanoTime()
      q95(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"PROBE $tag sec=$sec%.2f compiles=${compCount - c0} meanMs=$compMeanMs%.1f")
    }

    attempt("warm1")
    attempt("warm2")
    val cc0 = compCount
    val t0 = System.nanoTime()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1 >= "q100").take(nChurn)
      .foreach { case (n, fn) =>
        try { fn(spark, "/root/testdata/sf0.01").count() }
        catch { case e: Throwable => println(s"PROBE churn $n failed: ${e.getMessage.take(80)}") }
        spark.catalog.clearCache()
      }
    println(f"PROBE churn n=$nChurn compiles=${compCount - cc0} sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    attempt("post-churn1")
    attempt("post-churn2")
    spark.stop()
  }
}
