package graft

/** Scratch: print one oracleSql entry verbatim (for ad-hoc DuckDB
  * runs without a full Verify dump). */
object ScratchSql {
  def main(args: Array[String]): Unit = {
    val Array(name, outFile) = args
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
      SparkEntry.oracleSql(name))
  }
}
