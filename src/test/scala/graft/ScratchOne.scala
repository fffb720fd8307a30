package graft

/** Scratch: dump a single battery query for ad-hoc oracle comparison. */
object ScratchOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = TestSpark.spark
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
  }
}
