package graft.pipeline

import graft.TestSpark

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.ConcurrentHashMap

/** Task-retry chaos: the repo's bit-reproducibility claims (quantized
  * k-means, the deterministic corpus shuffle, export manifests) rested
  * on partitioning-independence specs — none injected an ACTUAL task
  * failure. Here a pass-through mapPartitions kills the FIRST attempt
  * of one partition per labelled stage (`TaskContext.attemptNumber`,
  * retried under this suite's dedicated `local[4, 2]` JVM — build.sbt
  * groups it apart so the shared suite keeps maxFailures=1) and the outputs
  * must be bit-identical to the unchaosed run: a retried task
  * re-derives exactly the rows the killed attempt would have produced,
  * because every value is a pure function of the row (hash positions,
  * quantized centroid arithmetic) — nothing depends on attempt-local
  * state, partition order, or `monotonically_increasing_id` leaking
  * into results. */
object TaskRetrySpec {
  /** Tracks which chaos labels actually fired, so a spec can assert
    * the failure was injected (a chaos test that never failed anything
    * proves nothing). Static so the task closure captures no
    * non-serializable spec instance; local mode shares the JVM, so
    * executor-side merges are visible to the assertion. */
  val fired = new ConcurrentHashMap[String, Integer]()

  /** Pass-through that throws on the first attempt of partition 0,
    * forcing Spark to retry that task. */
  def chaos(df: DataFrame, label: String): DataFrame = {
    val enc = Encoders.row(df.schema)
    df.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0) {
        fired.merge(label, 1, (a, b) => a + b)
        throw new RuntimeException(
          s"chaos[$label]: injected first-attempt task failure")
      }
      it
    }(enc)
  }
}

class TaskRetrySpec extends AnyFunSuite {
  import TaskRetrySpec.{chaos, fired}

  private lazy val spark = {
    val s = TestSpark.spark
    // this suite is meaningless without task retries — fail loudly if
    // run outside its build.sbt chaos group (e.g. from an IDE without
    // -Dgraft.test.taskMaxFailures=2)
    assert(s.sparkContext.master == "local[4, 2]",
      s"TaskRetrySpec needs the chaos-group session (local[4, 2]); " +
        s"got ${s.sparkContext.master} — run via sbt, or set " +
        "-Dgraft.test.taskMaxFailures=2")
    s
  }
  import spark.implicits._

  private def docs = (0L until 120L)
    .map(i => (i, s"doc $i body w${i % 11} x${i % 7}"))
    .toDF("doc_id", "text")
    .repartition(4)

  private def vecs = (0L until 90L)
    .map(i => (i, Array.tabulate(8)(j => ((i * 31 + j * 17) % 101).toFloat / 10f)))
    .toDF("vec_id", "embedding")
    .repartition(4)

  test("globalShuffle: a retried task reproduces the exact " +
      "training-order positions") {
    val clean = Sampling.globalShuffle(docs.select(col("doc_id")),
      col("doc_id"), salt = "retry-spec")
      .select("doc_id", "shuffle_pos").collect().map(_.toSeq).toSet
    val chaosed = Sampling.globalShuffle(
      chaos(docs.select(col("doc_id")), "shuffle"),
      col("doc_id"), salt = "retry-spec")
      .select("doc_id", "shuffle_pos").collect().map(_.toSeq).toSet
    assert(fired.getOrDefault("shuffle", 0) >= 1,
      "chaos never fired — the test proved nothing")
    assert(chaosed === clean)
  }

  test("quantized kMeansAssign: retry-identical assignments and d2") {
    val clean = Clustering.kMeansAssign(vecs, k = 4, iterations = 2)
      .select("id", "cluster", "d2").collect().map(_.toSeq).toSet
    val chaosed = Clustering.kMeansAssign(chaos(vecs, "kmeans"),
      k = 4, iterations = 2)
      .select("id", "cluster", "d2").collect().map(_.toSeq).toSet
    assert(fired.getOrDefault("kmeans", 0) >= 1)
    assert(chaosed === clean)
  }

  test("shardedExport + manifest: a write whose task died once still " +
      "yields the identical manifest, read back from the files") {
    val E = Export
    val payload = Seq(col("doc_id"), col("text"))
    def export(src: DataFrame, dir: String): Seq[Seq[Any]] = {
      val sharded = E.shardedExport(src, col("doc_id"), nShards = 4,
        dir, format = "parquet")
      val m = E.manifest(sharded, payload)
        .orderBy("shard").collect().map(_.toSeq).toSeq
      val back = E.manifest(
        spark.read.parquet(dir).select(
          col("shard").cast("long").as("shard"), col("pos"),
          col("doc_id"), col("text")), payload)
        .orderBy("shard").collect().map(_.toSeq).toSeq
      assert(m === back, "read-back manifest drifted from written")
      m
    }
    val d1 = java.nio.file.Files.createTempDirectory("retry-a").toString + "/s"
    val d2 = java.nio.file.Files.createTempDirectory("retry-b").toString + "/s"
    val clean = export(docs, d1)
    val chaosed = export(chaos(docs, "export"), d2)
    assert(fired.getOrDefault("export", 0) >= 1)
    assert(chaosed === clean)
  }
}
