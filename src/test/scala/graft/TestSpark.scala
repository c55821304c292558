package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared local SparkSession for all specs (one JVM-wide session — Spark
  * startup dominates test wall-clock otherwise). */
object TestSpark {
  lazy val spark: SparkSession = {
    // maxFailures=1 (plain local[4]) for the shared suite so a
    // genuinely nondeterministic first-attempt failure FAILS the test
    // instead of being silently retried; TaskRetrySpec runs in its own
    // forked JVM (build.sbt testGrouping) with
    // -Dgraft.test.taskMaxFailures=2 so its injected first-attempt
    // failure is retried and retry determinism can be proven
    val maxFailures = sys.props.get("graft.test.taskMaxFailures")
    val s = SparkSession.builder()
      .master(maxFailures.fold("local[4]")(m => s"local[4, $m]"))
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
