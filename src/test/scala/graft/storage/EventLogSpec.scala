package graft.storage

import graft.TestSpark
import graft.core.RdfEvent

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Storage write/read contract (SURVEY.md §2.1 S5/S8) mirroring the
  * semantics exercised by `/root/reference/tests/stream_bus_test.rs:172,501`
  * (`storage.query_rdf(0, u64::MAX)` returns everything written) and the
  * segmented read-path inclusive-bounds behavior. */
class EventLogSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def freshLog(bucketMs: Long = 1000L): EventLog =
    new EventLog(spark,
      Files.createTempDirectory("eventlog").resolve("log").toString, bucketMs)

  private def ev(ts: Long, n: Int): RdfEvent =
    RdfEvent(ts, s"http://e.org/s$n", "http://e.org/p", n.toString, "")

  test("append then full-range query returns everything") {
    val log = freshLog()
    log.append(RdfEvent.toDF(spark, (1 to 50).map(i => ev(i * 100L, i))))
    assert(log.query(0, Long.MaxValue).count() === 50)
  }

  test("storage failure surfaces as an error; append restores service " +
      "(ref: segmented_storage_error_test.rs)") {
    val dir = Files.createTempDirectory("eventlog-err").resolve("log")
    val log = new EventLog(spark, dir.toString, 1000L)
    log.append(RdfEvent.toDF(spark, (1 to 10).map(i => ev(i * 100L, i))))
    assert(log.query(0, Long.MaxValue).count() === 10)
    // yank the storage out from under the log — the analogue of the
    // reference's background-flush failure; queries must surface an
    // error, not silently return partial/empty results
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    intercept[Exception] { log.query(0, Long.MaxValue).count() }
    // deliberate divergence from the reference (which poisons the store
    // until shutdown): an append re-creates the log and restores service
    log.append(RdfEvent.toDF(spark, Seq(ev(50L, 1))))
    assert(log.query(0, Long.MaxValue).count() === 1)
  }

  test("append is cumulative (read-your-writes across batches)") {
    val log = freshLog()
    log.append(RdfEvent.toDF(spark, Seq(ev(10, 1))))
    log.append(RdfEvent.toDF(spark, Seq(ev(20, 2), ev(30, 3))))
    assert(log.read().count() === 3)
  }

  test("time-range query has inclusive bounds (segmented_storage.rs:308-463)") {
    val log = freshLog()
    log.append(RdfEvent.toDF(spark,
      Seq(ev(100, 1), ev(200, 2), ev(300, 3), ev(400, 4))))
    val got = log.query(200, 300).collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(200L, 300L))
  }

  test("bucket partition pruning: query range touches only relevant dirs") {
    val log = freshLog(bucketMs = 1000L)
    log.append(RdfEvent.toDF(spark,
      (0 until 100).map(i => ev(i * 100L, i)))) // buckets 0..9
    val plan = log.query(2500, 3500).queryExecution.executedPlan.toString
    // partition filter must appear in the scan (pruned directory listing)
    assert(plan.contains(EventLog.BucketCol))
    val got = log.query(2500, 3500).collect().map(_.getLong(0))
    assert(got.forall(t => t >= 2500 && t <= 3500))
    assert(got.length === 11)
  }

  test("pointQuery agrees with the distributed read path (inclusive " +
      "bounds, cross-file ranges, limit)") {
    val log = freshLog(bucketMs = 1000L)
    log.append(RdfEvent.toDF(spark, (1 to 50).map(i => ev(i * 100L, i))))
    log.append(RdfEvent.toDF(spark, (51 to 80).map(i => ev(i * 100L, i))))
    for ((lo, hi) <- Seq((0L, Long.MaxValue / 2), (500L, 500L),
        (450L, 550L), (4900L, 5300L), (99999L, 100000L))) {
      val local = log.pointQuery(lo, hi).map(e =>
        (e.timestamp, e.subject, e.objectValue)).sorted
      val dist = log.query(lo, hi).collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(3))).toSeq.sorted
      assert(local === dist, s"range [$lo,$hi]")
    }
    assert(log.pointQuery(0, Long.MaxValue / 2, limit = 7).size === 7)
    // index invalidation: appended data is visible to the local path
    log.append(RdfEvent.toDF(spark, Seq(ev(100000L, 999))))
    assert(log.pointQuery(100000L, 100000L).map(_.subject) ===
      Seq("http://e.org/s999"))
  }

  test("compact: many small appends collapse to few files, data intact") {
    val log = freshLog(bucketMs = 10000L) // all events in one bucket
    (1 to 12).foreach { i =>
      log.append(RdfEvent.toDF(spark, Seq(ev(i * 100L, i))))
    }
    val before = log.query(0, Long.MaxValue / 2).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(log.compact(maxFilesPerBucket = 8) === 1)
    // second call is a no-op (the bucket is already compact) — and with
    // grace 0 it VACUUMS the tombstoned generation: superseded files
    // are deleted, the marker stays (it reveals the live .cdata file)
    assert(log.compact(maxFilesPerBucket = 8, graceMs = 0) === 0)
    val after = log.query(0, Long.MaxValue / 2).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(after === before)
    // the point path agrees post-compaction (index + cache invalidated)
    assert(log.pointQuery(500L, 500L).map(_.subject) ===
      Seq("http://e.org/s5"))
    // the reader's snapshot is one file, and after the vacuum the DISK
    // holds exactly that file too (tombstoned generation reclaimed)
    assert(log.query(0, Long.MaxValue / 2).inputFiles.length === 1)
    val dir = new java.io.File(
      log.query(0, 1).inputFiles.head.stripPrefix("file:")).getParentFile
    val files = dir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(files === 1)
  }

  test("auto-compaction: repeated salted appends keep per-bucket file " +
      "counts bounded, queries identical across the compaction") {
    val log = new EventLog(spark,
      Files.createTempDirectory("eventlog-auto").resolve("log").toString,
      bucketMs = 100000L, // one bucket for all events
      autoCompactFiles = 4, autoCompactEvery = 4)
    var expected = Vector.empty[(Long, String)]
    (1 to 20).foreach { i =>
      // salted bulk append: 3 files land in the single bucket per call
      log.appendBulk(RdfEvent.toDF(spark,
        (0 until 6).map(j => ev(i * 1000L + j, i * 10 + j))),
        parallelism = 3, splitsPerBucket = 3)
      expected ++= (0 until 6).map(j =>
        (i * 1000L + j, s"http://e.org/s${i * 10 + j}"))
      // a query straddling whichever compactions have fired so far
      // sees exactly the appended rows
      if (i % 5 == 0) {
        val got = log.query(0, Long.MaxValue / 2).collect()
          .map(r => (r.getLong(0), r.getString(1))).sorted.toVector
        assert(got === expected.sorted)
      }
    }
    // without the hook: 20 appends × 3 salted files = 60 files in the
    // reader's snapshot; the every-4-appends trigger at threshold 4
    // bounds the LIVE set by autoCompactFiles + autoCompactEvery×3 = 16
    // (superseded generations linger on disk only until the grace-based
    // vacuum — asserted below)
    val files = log.query(0, Long.MaxValue / 2).inputFiles.length
    assert(files <= 16, s"auto-compaction failed to bound files: $files")
    assert(files < 60)
    // and the data survived every rewrite
    val all = log.query(0, Long.MaxValue / 2).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toVector
    assert(all === expected.sorted)
    // an explicit zero-grace compact vacuums every tombstoned
    // generation: disk converges to the live snapshot
    log.compact(maxFilesPerBucket = 1, graceMs = 0)
    log.compact(maxFilesPerBucket = 1, graceMs = 0)
    val dir = new java.io.File(
      log.query(0, 1).inputFiles.head.stripPrefix("file:")).getParentFile
    val onDisk = dir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(onDisk === 1, s"vacuum left $onDisk files on disk")
    assert(log.query(0, Long.MaxValue / 2).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toVector
      === expected.sorted)
  }

  test("appendBulk auto mode: small input skips estimation, bounded " +
      "salt (<= 2 files per bucket); explicit splits honored") {
    val log = freshLog(bucketMs = 1000L)
    // 4 buckets x 500 rows, well under the AutoEstimateBytes threshold
    val rows = (0 until 2000).map(i => ev(i.toLong * 2, i))
    log.appendBulk(RdfEvent.toDF(spark, rows), parallelism = 8)
    assert(log.query(0, Long.MaxValue / 2).count() === 2000)
    val root = new java.io.File(
      log.query(0, 1).inputFiles.head.stripPrefix("file:"))
      .getParentFile.getParentFile
    val perBucket = root.listFiles().filter(_.getName.startsWith("ts_bucket="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet")))
    // fast path salts with 2: a bucket's rows land in at most 2 tasks
    assert(perBucket.nonEmpty && perBucket.forall(_ <= 2))
    // explicit splits bypasses both estimation and the fast path
    val log3 = freshLog(bucketMs = 1000L)
    log3.appendBulk(RdfEvent.toDF(spark, rows), parallelism = 8,
      splitsPerBucket = 3)
    val root3 = new java.io.File(
      log3.query(0, 1).inputFiles.head.stripPrefix("file:"))
      .getParentFile.getParentFile
    val perBucket3 = root3.listFiles().filter(_.getName.startsWith("ts_bucket="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet")))
    assert(perBucket3.nonEmpty && perBucket3.forall(_ <= 3))
  }

  test("fresh log reads as empty, not as a missing-path error") {
    val log = freshLog()
    assert(log.read().count() === 0)
    assert(log.query(0, 1000).count() === 0)
    assert(log.pointQuery(0, 1000).isEmpty)
  }

  test("negative timestamps: write buckets agree with query pruning " +
      "(floor division on both sides)") {
    val log = freshLog(bucketMs = 1000L)
    log.append(RdfEvent.toDF(spark,
      Seq(ev(-5000L, 0), ev(-1L, 1), ev(500L, 2))))
    assert(log.query(-6000, -1).count() === 2)
    assert(log.query(-5000, -5000).count() === 1)
    assert(log.query(-6000, 600).count() === 3)
    assert(log.pointQuery(-6000, -1).map(_.timestamp).sorted ===
      Seq(-5000L, -1L))
  }

  test("pointQuery is globally ts-ordered across overlapping files; " +
      "limit takes the earliest") {
    val log = freshLog(bucketMs = 1000000L) // one bucket, many files
    log.append(RdfEvent.toDF(spark, Seq(ev(10, 0), ev(100, 1))))
    log.append(RdfEvent.toDF(spark, Seq(ev(50, 2), ev(150, 3))))
    val all = log.pointQuery(0, 200)
    assert(all.map(_.timestamp) === Seq(10L, 50L, 100L, 150L))
    assert(log.pointQuery(0, 200, limit = 2).map(_.timestamp) ===
      Seq(10L, 50L))
  }

  test("compact recovery: a crash between the rename steps leaves only " +
      ".compact-old — the next compact restores it, no data loss") {
    val log = freshLog(bucketMs = 1000L)
    log.append(RdfEvent.toDF(spark, (0 until 20).map(i => ev(i * 10L, i))))
    val root = new org.apache.hadoop.fs.Path(
      log.read().inputFiles.head).getParent.getParent
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the crash window: bucket dir moved aside, replacement
    // never landed
    val bucket = fs.listStatus(root)
      .find(_.getPath.getName.startsWith("ts_bucket=")).get.getPath
    val old = new org.apache.hadoop.fs.Path(root,
      s".compact-old-${bucket.getName}")
    assert(fs.rename(bucket, old))
    val log2 = new EventLog(spark, root.toString, bucketMs = 1000L)
    log2.compact() // must RESTORE, not delete, the orphaned copy
    assert(log2.read().count() === 20)
  }

  test("quads survive roundtrip with term values intact") {
    val log = freshLog()
    val in = Seq(RdfEvent(42L, "http://e.org/s", "http://e.org/p",
      "a \"quoted\" value", "http://g.org/g1"))
    log.append(RdfEvent.toDF(spark, in))
    val r = log.read().collect()(0)
    assert(r.getString(1) === "http://e.org/s")
    assert(r.getString(3) === "a \"quoted\" value")
    assert(r.getString(4) === "http://g.org/g1")
  }

  test("ReplayBus.ingestFile: N-Quads file → storage (stream_bus contract)") {
    val dir = Files.createTempDirectory("replay")
    val nq = dir.resolve("data.nq")
    Files.writeString(nq,
      """100 <http://e.org/a> <http://e.org/p> "1" .
        |200 <http://e.org/b> <http://e.org/p> "2" <http://g.org/g> .
        |garbage line
        |300 <http://e.org/c> <http://e.org/p> "3.5"^^<http://www.w3.org/2001/XMLSchema#decimal> .
        |""".stripMargin)
    val log = new EventLog(spark, dir.resolve("log").toString, 1000L)
    val (stored, errors) = ReplayBus.ingestFile(spark, nq.toString, log)
    assert(stored === 3)
    assert(errors === 1)
    assert(log.query(0, Long.MaxValue).count() === 3)
  }

  test("ReplayBus paced replay publishes to sink and storage with metrics") {
    val dir = Files.createTempDirectory("replay2")
    val nq = dir.resolve("data.nq")
    Files.writeString(nq,
      (1 to 20).map(i =>
        s"""${i * 10} <http://e.org/s$i> <http://e.org/p> "$i" .""")
        .mkString("", "\n", "\n"))
    val log = new EventLog(spark, dir.resolve("log").toString, 1000L)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Int]
    val bus = new ReplayBus(spark, nq.toString, storage = Some(log),
      sink = Some(evs => seen.synchronized { seen += evs.length }),
      loopCount = 2, batchSize = 7)
    val m = bus.run()
    assert(m.linesRead === 40)
    assert(m.published === 40)
    assert(m.stored === 40)
    assert(m.errors === 0)
    assert(log.read().count() === 40)
    assert(seen.sum === 40)
  }
}
