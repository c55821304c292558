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

    def bench(name: String)(f: => DataFrame): Unit = {
      val t1 = timeSec(mat(f)); val t2 = timeSec(mat(f))
      println(f"PROF $name%-28s ${math.min(t1, t2)}%.3f s  (runs $t1%.3f / $t2%.3f)")
    }

    import graft.sources.EventsAsQuads
    import graft.sparql.{SparqlCompiler, SparqlParser}

    bench("events_raw") {
      EventsAsQuads.events(spark, sfDir)
    }
    bench("quads_only") {
      EventsAsQuads.quads(spark, sfDir)
    }
    bench("quads_filter_value") {
      EventsAsQuads.quads(spark, sfDir)
        .where(col("predicate") === EventsAsQuads.PValue)
    }
    val Prefixes =
      """PREFIX v: <http://graft.dev/vocab#>
        |PREFIX janus: <https://janus.rs/fn#>
        |""".stripMargin
    def sparql(q: String): DataFrame =
      SparqlCompiler.compile(
        EventsAsQuads.quads(spark, sfDir), SparqlParser.parse(Prefixes + q))
    bench("f_zscore_full") {
      sparql(
        """SELECT ?e (janus:zscore(?val, 50.0, 28.0) AS ?z) WHERE {
          |  ?e v:value ?val .
          |}""".stripMargin)
    }
    val compiled = sparql(
      """SELECT ?e (janus:zscore(?val, 50.0, 28.0) AS ?z) WHERE {
        |  ?e v:value ?val .
        |}""".stripMargin)
    bench("f_zscore_reuse_plan") { compiled }
    bench("f_rel_threshold_full") {
      sparql(
        """SELECT ?e ?val WHERE {
          |  ?e v:value ?val .
          |  FILTER(janus:relative_threshold_exceeded(?val, 50.0, 2.0))
          |}""".stripMargin)
        .select(col("e"), col("val").try_cast("double").as("val"))
    }
    bench("q1_agg") {
      SparkEntryRef.q1(spark, sfDir)
    }
    compiled.explain("formatted")
    spark.stop()
  }

  private object SparkEntryRef {
    def q1(spark: SparkSession, dir: String): DataFrame =
      graft.SparkEntry.queries("q1_agg")(spark, dir)
  }
}
