package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: decompose q95_pagerank cost at sf0.1 (round-17 opt). */
object ProfQ95 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("prof-q95")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"STEP $name ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    // warm-up
    SparkEntry.queries("q04_lineitem_agg")(spark, dir).count()

    def lt(s: SparkSession) = s.read.parquet(s"$dir/lineitem.parquet")
    def ot(s: SparkSession) = s.read.parquet(s"$dir/orders.parquet")
    def pairs = ot(spark).select("o_orderkey", "o_custkey")
      .join(lt(spark).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("cn"),
        (col("l_suppkey") * 2 + 1).as("sn"))
      .distinct()
    def edges = pairs.select(col("cn").as("src"), col("sn").as("dst"))
      .unionByName(pairs.select(col("sn").as("src"), col("cn").as("dst")))

    // run everything twice; second sample is the warm figure
    for (round <- 1 to 2) {
      println(s"== round $round ==")
      t("pairs_distinct")(pairs.count())
      t("edges_union")(edges.count())
      t("edgesWithOutDegree")(
        graft.operators.Graph.edgesWithOutDegree(edges, "src", "dst",
          assumeDistinct = true).count())
      t("pagerank_iter0")(
        graft.operators.Graph.pageRankMicro(edges, "src", "dst",
          iterations = 0, assumeDistinct = true).count())
      spark.catalog.clearCache()
      t("pagerank_iter4")(
        graft.operators.Graph.pageRankMicro(edges, "src", "dst",
          iterations = 4, assumeDistinct = true).count())
      spark.catalog.clearCache()
      t("q95_full")(SparkEntry.queries("q95_pagerank")(spark, dir).count())
      spark.catalog.clearCache()
    }
    spark.stop()
    sys.exit(0)
  }
}
