package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for slow bench entries (not part of the library
  * surface; run with `sbt "runMain graft.tools.Profile"`). */
object Profile {
  private def timeSec(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def mat(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    mat(spark.range(1000).toDF("i"))

    import graft.sources.EventsAsQuads
    import graft.storage.EventLog

    val quads = EventsAsQuads.quads(spark, sfDir).repartition(32).persist()
    println("quads " + quads.count())
    val dir = java.nio.file.Files.createTempDirectory("prof-log")
      .resolve("log").toString
    val log = new EventLog(spark, dir, bucketMs = 86400000L)
    log.appendBulk(quads, 32)
    val r = log.read().agg(min("timestamp"), max("timestamp")).head()
    val (minTs, maxTs) = (r.getLong(0), r.getLong(1))
    val mid = log.query(minTs + (maxTs - minTs) / 2, maxTs)
      .agg(min("timestamp")).head().getLong(0)
    println(s"minTs=$minTs maxTs=$maxTs mid=$mid (existing ts)")
    try {
      val t0 = System.nanoTime()
      val res = log.pointQuery(mid, mid, limit = 1)
      println(f"cold pointQuery: ${(System.nanoTime() - t0) / 1e6}%.2f ms rows=${res.size}")
      for (_ <- 1 to 5) {
        val t1 = System.nanoTime()
        val res2 = log.pointQuery(mid, mid, limit = 1)
        println(f"warm pointQuery: ${(System.nanoTime() - t1) / 1e6}%.3f ms rows=${res2.size}")
      }
      val t2 = System.nanoTime()
      val all = log.pointQuery(mid - 60000, mid + 60000)
      println(f"2-min-range pointQuery: ${(System.nanoTime() - t2) / 1e6}%.2f ms rows=${all.size}")
    } catch {
      case e: Throwable =>
        println("EXC " + e)
        e.printStackTrace()
    }
    spark.stop()
  }
}
