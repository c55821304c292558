package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measured proof of the claim several operator docs lean on: "AQE
  * splits any still-skewed bucket at runtime". Plants one degenerate
  * hot key through a sort-merge join with skew thresholds scaled to
  * the fixture, and asserts the executed plan actually took the
  * skew-split path (`isSkew=true` / `skew=true` markers) AND the
  * result stayed exact. */
class AqeSkewSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a planted hot key takes the AQE skew-join split with exact " +
      "results") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) =>
      k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // left: 200k rows on ONE key (plus a uniform tail), right: a few
      // rows per key — the classic fact-skew shape
      val left = spark.range(200000)
        .select(lit(7L).as("k"), col("id").as("payload"))
        .unionAll(spark.range(5000)
          .select((col("id") % 100).as("k"), col("id").as("payload")))
      val right = spark.range(100)
        .select(col("id").as("k"), (col("id") * 10).as("rv"))
      val joined = left.join(right, "k")
      // exact expectation: hot key 7 matches once; tail matches once
      assert(joined.collect().length === 200000 + 5000)
      // the FINAL adaptive plan of the executed query
      val plan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      assert(plan.contains("skew=true") || plan.contains("isSkew=true"),
        s"expected the AQE skew-split marker in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
