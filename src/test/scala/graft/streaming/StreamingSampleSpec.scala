package graft.streaming

import graft.TestSpark
import graft.pipeline.Sampling

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Standing streaming quota sample: per-stratum top-n under a total
  * hash order obeys the exact merge law, so the folded state must
  * equal the one-shot quotaSample over the concatenated stream for
  * any batch split. */
class StreamingSampleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("streamed quota sample == one-shot quotaSample over everything " +
      "seen; superseded checkpoints released") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val batches: Seq[Seq[(String, Long)]] = Seq(
      (0L until 40L).map(i => (s"s${i % 3}", i)),
      (40L until 90L).map(i => (s"s${i % 3}", i)),
      (90L until 100L).map(i => (s"s${i % 3}", i)))

    val input = MemoryStream[(String, Long)]
    val dir = Files.createTempDirectory("quota-stream")
    val sample = new StructuredStreams.StreamingQuotaSample(
      "stratum", "id", n = 5)
    val q = StructuredStreams.maintainQuotaSample(
      input.toDS().toDF("stratum", "id"), sample,
      dir.resolve("ckpt").toString)
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val streamed = sample.current.getOrElse(fail("no standing sample"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val oneShot = Sampling.quotaSample(
        batches.flatten.toDF("stratum", "id"),
        col("stratum"), col("id"), n = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(streamed === oneShot, "merge law violated")
    assert(streamed.groupBy(_._1).forall(_._2.size == 5))

    val before = spark.sparkContext.getPersistentRDDs.size
    sample.unpersist()
    assert(sample.current.isEmpty)
    assert(spark.sparkContext.getPersistentRDDs.size < before,
      "standing checkpoint not released")
  }
}
