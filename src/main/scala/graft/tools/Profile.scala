package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for slow bench entries (not part of the library
  * surface). Times named `SparkEntry.queries` entries in isolation —
  * the bench's per-entry numbers ride a 265-entry session where JIT,
  * cache pressure and block-manager churn from neighbours blur
  * steady state.
  *
  * Usage: `sbt "runMain graft.tools.Profile <entry> [<entry> ...]"`
  * with SPARK_GRAFT_SF_DIR (default sf0.1) and PROF_REPS (default 4).
  * Prints min and all samples per entry; the first sample carries the
  * entry's cold Catalyst/JIT cost, so compare mins. */
object Profile {
  private def timeSec(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass one or more SparkEntry.queries names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("PROF_REPS", "4").toInt
    // PROF_DEBUG=1 turns on the operators' sys.props debug channels
    // (e.g. graft.debug.containment round counters)
    if (sys.env.contains("PROF_DEBUG"))
      System.setProperty("graft.debug.containment", "1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PROF_AQE", "true"))
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").canWrite)
          java.nio.file.Files.createTempDirectory(
            java.nio.file.Paths.get("/dev/shm"), "prof-shuffle").toString
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    args.foreach { name =>
      val q = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown entry '$name'"))
      val ts = Seq.fill(reps)(timeSec {
        // the bench's EXACT consumption shape (Bench.materialize): the
        // noop-format write evaluates every output column, where a
        // count() would let Catalyst prune unused projections and
        // under-time projection-heavy entries relative to the bench
        q(spark, sfDir).write.format("noop").mode("overwrite").save()
      })
      println(f"PROF $name%-36s min ${ts.min}%.3f  " +
        s"(${ts.map(t => f"$t%.3f").mkString(" ")})")
    }
    spark.stop()
  }
}
