package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-capture harness for the optimization-round evidence files:
  * writes `explain("formatted")` of named `SparkEntry.queries` entries
  * to `<outDir>/<entry>.txt`. Building an entry's final DataFrame runs
  * any driver-side loop the entry contains (fires, fixpoints), so the
  * captured plan is the shape of the RETURNED frame — the per-round
  * loop plans are the loop body's joins, described in
  * OPTIMIZATION_r*.md next to the wall numbers.
  *
  * Usage: `sbt "runMain graft.tools.ExplainEntry <e1,e2,..> <sfDir> <outDir> [suffix]"`
  */
object ExplainEntry {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = args(1)
    val outDir = java.nio.file.Paths.get(args(2))
    val suffix = if (args.length > 3) args(3) else ""
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(outDir.resolve(s"$n$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[explain] wrote $n$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
