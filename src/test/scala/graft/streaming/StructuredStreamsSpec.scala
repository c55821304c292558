package graft.streaming

import graft.TestSpark
import graft.storage.EventLog

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Structured Streaming paths: readStream ingest → EventLog,
  * watermarked windowed aggregation, flatMapGroupsWithState comparator. */
class StructuredStreamsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("streaming N-Quads ingest lands micro-batches in the event log") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val dir = Files.createTempDirectory("ingest")
    val log = new EventLog(spark, dir.resolve("log").toString, 1000L)
    val q = StructuredStreams.ingest(input.toDS(),
      log, dir.resolve("ckpt").toString)
    try {
      input.addData(
        """100 <http://e.org/a> <http://e.org/p> "1" .""",
        """200 <http://e.org/b> <http://e.org/p> "2" .""")
      q.processAllAvailable()
      assert(log.query(0, 1000).count() === 2)
      input.addData(
        """1500 <http://e.org/c> <http://e.org/p> "3" .""")
      q.processAllAvailable()
      assert(log.read().count() === 3)
      // read-your-writes across micro-batch commits + time pruning
      assert(log.query(1000, 2000).count() === 1)
    } finally q.stop()
  }

  test("watermarked sliding-window aggregation over a streaming source") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[graft.core.RdfEvent]
    val quads = input.toDS().toDF()
      .withColumnRenamed("objectValue", "object")
    val agg = StructuredStreams.windowedAggregates(quads,
      rangeMs = 1000, stepMs = 500)
    val q = agg.writeStream.format("memory").queryName("winagg")
      .outputMode("complete").start()
    try {
      input.addData(
        graft.core.RdfEvent(100, "http://e.org/s1", "http://e.org/v", "10", ""),
        graft.core.RdfEvent(600, "http://e.org/s1", "http://e.org/v", "20", ""),
        graft.core.RdfEvent(700, "http://e.org/s2", "http://e.org/v", "5", ""))
      q.processAllAvailable()
      val rows = spark.sql(
        """SELECT subject, n, mean_value,
          |  unix_millis(window.start) AS ws, unix_millis(window.end) AS we
          |FROM winagg""".stripMargin).collect()
      // s1@100 lands in windows [-500,500) and [0,1000); s1@600 in
      // [0,1000) and [500,1500)
      val s1w0 = rows.filter(r => r.getString(0) == "http://e.org/s1" &&
        r.getLong(3) == 0L)
      assert(s1w0.length === 1)
      assert(s1w0(0).getAs[Long]("n") === 2)
      assert(s1w0(0).getAs[Double]("mean_value") === 15.0)
      assert(rows.forall(r => r.getLong(4) - r.getLong(3) === 1000L))
    } finally q.stop()
  }

  test("streaming exact dedup keeps first-seen content within the " +
      "watermark horizon (normalized hashes)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, String)]
    val docs = input.toDS().toDF("ts", "doc_id", "text")
    val q = StructuredStreams.streamingExactDedup(docs, "ts", "text",
      watermarkDelayMs = 60000)
      .writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      input.addData((1000L, 1L, "Hello  World"), (1100L, 2L, "hello world "),
        (1200L, 3L, "something else"))
      q.processAllAvailable()
      // cross-batch duplicate inside the horizon is dropped too
      input.addData((1300L, 4L, "HELLO WORLD"))
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM sdedup")
        .collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 3L))
    } finally q.stop()
  }

  test("incremental near-dup matches stream batches against a standing " +
      "corpus index") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while the " +
      "cat sleeps in the warm afternoon sun near the old wooden fence"
    val corpus = Seq((0L, base),
      (1L, "ancient library shelves hold countless forgotten stories " +
        "about distant mountains and rivers crossing silent valleys"))
      .toDF("doc_id", "text")
    val c = org.apache.spark.sql.functions.col _
    val index = graft.pipeline.Dedup.buildCorpusIndex(corpus,
      c("doc_id"), c("text"))
    val input = MemoryStream[(Long, String)]
    val matches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val dir = Files.createTempDirectory("neardup-ckpt")
    val q = StructuredStreams.streamingNearDup(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text", index,
      threshold = 0.5, dir.toString,
      out => matches ++= out.collect()
        .map(r => (r.getLong(0), r.getLong(1))))
    try {
      input.addData(
        (100L, base.replace("lazy", "sleepy")), // near dup of corpus 0
        (101L, "completely unrelated text about streaming watermarks " +
          "and window state in distributed query processing engines"))
      q.processAllAvailable()
      assert(matches.toSet === Set((100L, 0L)))
      // a second batch reuses the same standing index
      input.addData((102L, base))
      q.processAllAvailable()
      assert(matches.toSet === Set((100L, 0L), (102L, 0L)))
    } finally {
      q.stop()
      index.unpersist()
    }
  }

  test("flatMapGroupsWithState comparator matches the exact deque core " +
      "(batch mode)") {
    import spark.implicits._
    import StructuredStreams._
    val obs = (0 until 20).map { i =>
      Observation("k1", i.toLong, 10.0 + i * 2.0, 10.0)
    }.toDS()
    val got = comparatorStream(obs).collect()
    // brute-force with the exact core
    val c = new graft.comparator.StatefulComparator()
    val expected = (0 until 20).flatMap { i =>
      c.updateAndCompare(i.toDouble, 10.0 + i * 2.0, 10.0)
    }
    assert(got.length === expected.length)
    assert(got.map(_.trigger).toSet.nonEmpty)
    assert(got.exists(_.trigger == "absolute_threshold_exceeded"))
  }

  test("comparator state persists across streaming micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import StructuredStreams._
    val input = MemoryStream[Observation]
    val q = comparatorStream(input.toDS()).writeStream
      .format("memory").queryName("anomalies").outputMode("append").start()
    try {
      // batch 1: calm history
      input.addData((0 until 5).map(i =>
        Observation("k1", i.toLong, 10.0, 10.0)): _*)
      q.processAllAvailable()
      val afterCalm = spark.sql("SELECT count(*) FROM anomalies").head().getLong(0)
      assert(afterCalm === 0L)
      // batch 2: live jumps — mean-of-window shift must see batch-1 state
      input.addData(Observation("k1", 5L, 40.0, 10.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT trigger FROM anomalies").collect()
        .map(_.getString(0))
      // live mean = (10*5+40)/6 = 15 vs hist 10 → |diff| = 5 > 1.0
      assert(rows.contains("absolute_threshold_exceeded"))
    } finally q.stop()
  }
}
