package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc isolated timing harness (Test/runMain graft.ScratchTiming
  * q31_ngram_jaccard q31b_ngram_persisted [sfDir]) — min-of-2 per
  * query, cache cleared between attempts, same session config as
  * Bench. Not part of the battery; exists so perf claims can be
  * reproduced in isolation instead of read off a noisy full bench run
  * (the round-3 contamination lesson).
  */
object ScratchTiming {
  def main(args: Array[String]): Unit = {
    val names = args.filter(_.startsWith("q"))
    val dir = args.find(a => !a.startsWith("q")).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.get("q04_lineitem_agg").foreach(f => f(spark, dir).count()) // warm-up
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def attempt(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        sec
      }
      val a = attempt(); val b = attempt()
      println(f"[scratch] $name%-28s min=${math.min(a, b)}%.3f  (a=$a%.3f b=$b%.3f)")
    }
    spark.stop()
    sys.exit(0)
  }
}
