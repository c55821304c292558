package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared local SparkSession for all specs (one JVM-wide session — Spark
  * startup dominates test wall-clock otherwise). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      // local[4, 2]: ONE task retry, so TaskRetrySpec can inject a
      // first-attempt failure and prove retry determinism; genuine
      // failures still fail (one extra small-task attempt on the
      // fail-loud paths is noise)
      .master("local[4, 2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Collect a bindings DataFrame to a set of string-row tuples. */
  def rows(df: DataFrame): Set[Seq[String]] =
    df.collect().toSet.map { r: org.apache.spark.sql.Row =>
      (0 until r.length).map(i => String.valueOf(r.get(i)))
    }
}
