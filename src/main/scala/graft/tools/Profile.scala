package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for slow bench entries (not part of the library
  * surface; run with `sbt "runMain graft.tools.Profile"`). */
object Profile {
  private def timeSec(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.sources.EventsAsQuads
    import graft.storage.EventLog

    def tmp(p: String): String = java.nio.file.Files
      .createTempDirectory(p).resolve("log").toString

    val quads = EventsAsQuads.quads(spark, sfDir)
    val reps = math.max(1, (1200000L / math.max(quads.count(), 1L)).toInt)
    val big = quads.crossJoin(spark.range(reps).toDF("rep").hint("broadcast"))
      .withColumn("subject", concat(col("subject"), lit("#"), col("rep")))
      .select("timestamp", "subject", "predicate", "object", "graph")
      .repartition(32)
      .persist()
    val n = big.count()
    println(s"rows $n")
    // warm both writers
    new EventLog(spark, tmp("w"), 86400000L).appendBulk(big, 32)
    big.write.option("compression", "lz4").parquet(tmp("wf"))

    def bench(name: String)(f: => Unit): Unit = {
      val ts = Seq.fill(3)(timeSec(f))
      println(f"PROF $name%-24s min ${ts.min}%.3f  (${ts.map(t => f"$t%.3f").mkString(" ")})  -> ${n / ts.min / 1e6}%.2f M/s")
    }

    bench("flat") {
      big.write.option("compression", "lz4").parquet(tmp("f"))
    }
    bench("bulk_split1") {
      new EventLog(spark, tmp("b1"), 86400000L).appendBulk(big, 32, 1)
    }
    bench("bulk_split2") {
      new EventLog(spark, tmp("b2"), 86400000L).appendBulk(big, 32, 2)
    }
    bench("bulk_split4") {
      new EventLog(spark, tmp("b4"), 86400000L).appendBulk(big, 32, 4)
    }
    spark.stop()
  }
}
