package graft.tools

import graft.sources.EventsAsQuads
import graft.storage.EventLog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decomposition probe for the storage_write headline (round-15
  * verdict #4: the quads path measured 2.18 M quads/s vs the flat
  * parquet path's 6.7 M/s — find where the 3× goes). Reproduces the
  * bench's exact write fixture (3.6 M quads, cached + pre-spread),
  * then times each candidate pipeline stage and write variant
  * best-of-N so the attribution is steady-state:
  *
  *   flat          — plain parquet append, no routing (the 6.7 M/s bar)
  *   exchange      — the appendBulk (bucket, split) hash repartition
  *                   alone, consumed by noop (isolates shuffle cost)
  *   exch+sort     — exchange + sortWithinPartitions, noop (adds the
  *                   in-partition ts sort)
  *   sorted_flat   — exchange + sort + FLAT parquet write (adds file
  *                   write minus dynamic partitioning)
  *   appendBulk    — the real path (adds partitionBy dir fan-out)
  *   rr+sort+part  — round-robin repartition instead of hash routing +
  *                   sort + partitionBy (kills key-collision skew when
  *                   buckets × splits ≪ enough distinct keys)
  *
  * Usage: `sbt "runMain graft.tools.WriteProbe"` with
  * SPARK_GRAFT_SF_DIR (default sf0.1), WP_REPS (default 3). */
object WriteProbe {
  private def timeSec(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def minN(n: Int)(f: => Double): Double = Seq.fill(n)(f).min
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  private def tmp(prefix: String): String = java.nio.file.Files
    .createTempDirectory(prefix).resolve("log").toString

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("WP_REPS", "3").toInt
    val cpus = 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").canWrite)
          java.nio.file.Files.createTempDirectory(
            java.nio.file.Paths.get("/dev/shm"), "wp-shuffle").toString
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val quads = EventsAsQuads.quads(spark, sfDir)
    val reps0 = math.max(1, (3600000L / math.max(quads.count(), 1L)).toInt)
    val big = quads.crossJoin(
        spark.range(reps0).toDF("rep").hint("broadcast"))
      .withColumn("subject", concat(col("subject"), lit("#"), col("rep")))
      .select("timestamp", "subject", "predicate", "object", "graph")
      .repartition(cpus)
      .persist()
    val n = big.count()
    println(s"WP fixture: $n quads")

    val bucketMs = 86400000L
    val bucketExpr = (col("timestamp") / bucketMs).cast("long")
    // the appendBulk split factor for this fixture shape
    val nBuckets = {
      val r = big.agg(min("timestamp"), max("timestamp")).head()
      math.floorDiv(r.getLong(1), bucketMs) -
        math.floorDiv(r.getLong(0), bucketMs) + 1L
    }
    val splits = math.max(1L, math.min(cpus.toLong,
      math.ceil(cpus * 2.0 / nBuckets).toLong)).toInt
    println(s"WP buckets=$nBuckets splits=$splits")

    def report(label: String, t: Double): Unit =
      println(f"WP $label%-14s ${t}%6.3f s  ${n / t / 1e6}%5.2f Mq/s")

    // warm both write paths once
    big.limit(100000).write.option("compression", "lz4")
      .parquet(tmp("wp-warm"))
    new EventLog(spark, tmp("wp-warm2"), bucketMs = bucketMs)
      .appendBulk(big.limit(100000), cpus)

    report("flat", minN(reps)(timeSec {
      big.write.option("compression", "lz4").parquet(tmp("wp-flat"))
    }))
    val exch = big.repartition(cpus, bucketExpr,
      pmod(xxhash64(col("timestamp")), lit(splits)))
    report("exchange", minN(reps)(timeSec(noop(exch))))
    val exchSort = exch.withColumn("__b", bucketExpr)
      .sortWithinPartitions(col("__b"), col("timestamp"))
    report("exch+sort", minN(reps)(timeSec(noop(exchSort))))
    report("sorted_flat", minN(reps)(timeSec {
      exchSort.drop("__b").write.option("compression", "lz4")
        .option("parquet.enable.dictionary", "false")
        .parquet(tmp("wp-sorted-flat"))
    }))
    report("appendBulk", minN(reps)(timeSec {
      new EventLog(spark, tmp("wp-bulk"), bucketMs = bucketMs)
        .appendBulk(big, cpus)
    }))
    report("rr+sort+part", minN(reps)(timeSec {
      big.repartition(cpus)
        .withColumn("__b", bucketExpr)
        .sortWithinPartitions(col("__b"), col("timestamp"))
        .withColumnRenamed("__b", "bucket")
        .write.option("compression", "lz4")
        .option("parquet.enable.dictionary", "false")
        .partitionBy("bucket")
        .parquet(tmp("wp-rr"))
    }))
    spark.stop()
  }
}
