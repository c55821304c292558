package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

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

    def bench(name: String)(f: => DataFrame): Unit = {
      val t1 = timeSec(mat(f)); val t2 = timeSec(mat(f))
      println(f"PROF $name%-28s ${math.min(t1, t2)}%.3f s  (runs $t1%.3f / $t2%.3f)")
    }

    bench("r23_path_closure") {
      graft.SparkEntry.queries("r23_path_closure")(spark, sfDir)
    }
    bench("r24_subquery") {
      graft.SparkEntry.queries("r24_subquery")(spark, sfDir)
    }
    spark.stop()
  }
}
