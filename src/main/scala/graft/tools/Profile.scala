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
      .config("spark.shuffle.compress",
        sys.env.getOrElse("PROF_SHUFFLE_COMPRESS", "true"))
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").canWrite)
          java.nio.file.Files.createTempDirectory(
            java.nio.file.Paths.get("/dev/shm"), "prof-shuffle").toString
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.sources.EventsAsQuads
    import graft.storage.EventLog

    def tmp(p: String): String = java.nio.file.Files
      .createTempDirectory(p).resolve("log").toString

    val quads = EventsAsQuads.quads(spark, sfDir)
    val target = sys.env.getOrElse("PROF_QUADS", "1200000").toLong
    val reps = math.max(1, (target / math.max(quads.count(), 1L)).toInt)
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

    // ---- decomposition of the bucketed write: where does time go? ----
    val keyed = big
      .repartition(32, expr("timestamp div 86400000"),
        pmod(xxhash64(col("timestamp")), lit(2)))
      .withColumn("ts_bucket", expr("timestamp div 86400000"))
      .sortWithinPartitions("ts_bucket", "timestamp")
    bench("shuffle_sort_only") {
      keyed.write.format("noop").mode("overwrite").save()
    }
    bench("shuffle_sort_flatwrite") {
      keyed.write.option("compression", "lz4")
        .option("parquet.enable.dictionary", "false").parquet(tmp("ssf"))
    }
    bench("full_partitionBy") {
      keyed.write.option("compression", "lz4")
        .option("parquet.enable.dictionary", "false")
        .partitionBy("ts_bucket").parquet(tmp("spb"))
    }
    // parquet encode variants on the partitioned shape
    bench("pb_writer_v2") {
      keyed.write.option("compression", "lz4")
        .option("parquet.enable.dictionary", "false")
        .option("parquet.writer.version", "v2")
        .partitionBy("ts_bucket").parquet(tmp("sv2"))
    }
    bench("pb_pagesize8m") {
      keyed.write.option("compression", "lz4")
        .option("parquet.enable.dictionary", "false")
        .option("parquet.page.size", (8 << 20).toString)
        .partitionBy("ts_bucket").parquet(tmp("sp8"))
    }
    bench("pb_no_colindex") {
      keyed.write.option("compression", "lz4")
        .option("parquet.enable.dictionary", "false")
        .option("parquet.columnindex.truncate.length", "8")
        .option("parquet.page.write-checksum.enabled", "false")
        .partitionBy("ts_bucket").parquet(tmp("snc"))
    }
    bench("pb_uncompressed") {
      keyed.write.option("compression", "none")
        .option("parquet.enable.dictionary", "false")
        .partitionBy("ts_bucket").parquet(tmp("snz"))
    }
    bench("pb_mode_append") {
      keyed.write.option("compression", "lz4")
        .option("parquet.enable.dictionary", "false")
        .mode(org.apache.spark.sql.SaveMode.Append)
        .partitionBy("ts_bucket").parquet(tmp("sap"))
    }
    bench("pb_exact_bucketexpr") {
      val bexpr = expr(
        "(timestamp - pmod(timestamp, 86400000)) div 86400000")
      big.repartition(32, bexpr, pmod(xxhash64(col("timestamp")), lit(2)))
        .withColumn("ts_bucket", bexpr)
        .sortWithinPartitions("ts_bucket", "timestamp")
        .write.option("compression", "lz4")
        .option("parquet.enable.dictionary", "false")
        .mode(org.apache.spark.sql.SaveMode.Append)
        .partitionBy("ts_bucket").parquet(tmp("sex"))
    }
    spark.stop()
  }
}
