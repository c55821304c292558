package graft.streaming

import graft.TestSpark
import graft.pipeline.Dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Log-structured standing state: the corpus-sized streaming folds
  * (containment, BM25, line dedup) must cost ∝ batch per fold — the
  * old re-pin pattern wrote the FULL standing corpus through the block
  * manager every micro-batch, so per-fold wall grew with fold index
  * and the cumulative cost was quadratic in stream length.
  *
  * Proven two ways: structurally (each fold adds exactly one delta
  * generation per spool, no standing checkpoint pin; compaction fires
  * at the threshold and collapses the spool to one generation) and by
  * measurement (late folds are not systematically slower than early
  * ones when batch size is constant). Correctness ACROSS a compaction
  * boundary is pinned separately: the fold stream still equals the
  * one-shot with a compaction in the middle of the run. */
class DeltaFoldCostSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docBatch(lo: Long, hi: Long) = {
    import spark.implicits._
    (lo until hi).map(i => (i,
      s"tok${i % 13} tok${(i * 7) % 17} tok${(i * 11) % 19} " +
        s"tok${(i * 3) % 23} tok${(i * 5) % 29} shared common tail"))
      .toDF("doc_id", "text")
  }

  test("DeltaFrame: append/read/compact/save/load preserve rows; " +
      "compaction fires at the threshold and bounds generations") {
    import spark.implicits._
    val d = new DeltaFrame(spark, "unit", compactEvery = 3)
    d.append(Seq((1L, "a")).toDF("k", "v"))
    d.append(Seq((2L, "b")).toDF("k", "v"))
    assert(d.generationCount === 2)
    assert(d.read.count() === 2)
    // third append reaches the threshold → compacts to ONE generation
    d.append(Seq((3L, "c")).toDF("k", "v"))
    assert(d.generationCount === 1, "compaction must fire at threshold")
    assert(TestSpark.rows(d.read) ===
      Set(Seq("1", "a"), Seq("2", "b"), Seq("3", "c")))
    // save → load roundtrip into a fresh spool
    val dir = java.nio.file.Files
      .createTempDirectory("deltaframe-save").resolve("t").toString
    d.saveTo(dir)
    val d2 = new DeltaFrame(spark, "unit2", compactEvery = 3)
    d2.loadFrom(dir)
    assert(TestSpark.rows(d2.read) === TestSpark.rows(d.read))
    // fail-loud contracts
    intercept[IllegalArgumentException] {
      new DeltaFrame(spark, "empty").read
    }
    intercept[IllegalArgumentException] { d2.loadFrom(dir) }
    d.delete(); d2.delete()
  }

  test("containment fold across a compaction boundary still equals " +
      "the one-shot kept set") {
    val batches = (0 until 6).map(i => docBatch(i * 20L, i * 20L + 20))
    val sc = new StructuredStreams.StreamingContainmentDedup(
      "doc_id", "text", minPpm = 800000L, compactEvery = 4)
    batches.foreach(sc.fold)
    // 6 folds with compactEvery=4: every spool compacted at least once
    assert(sc.generationCounts.forall(_ < 6),
      s"expected compaction to have fired: ${sc.generationCounts}")
    val streamed = TestSpark.rows(sc.current.get)
    val oneShot = TestSpark.rows(Dedup.containmentDeduplicate(
      docBatch(0L, 120L), col("doc_id"), col("text"),
      minPpm = 800000L).select(col("doc_id").as("id")))
    assert(streamed === oneShot,
      "fold across compaction diverges from one-shot")
    sc.unpersist()
  }

  test("per-fold wall stays flat as the standing corpus grows " +
      "(constant batch size, k batches)") {
    val k = 10
    val sld = new StructuredStreams.StreamingLineDedup("doc_id", "text",
      sep = " ")
    val walls = (0 until k).map { i =>
      val b = docBatch(i * 50L, i * 50L + 50).localCheckpoint(true)
      b.count() // exclude batch construction from the timing
      val t0 = System.nanoTime()
      sld.fold(b)
      val t = (System.nanoTime() - t0) / 1e9
      graft.util.Lineage.release(b)
      t
    }
    // structural: one generation per fold, nothing re-pinned
    assert(sld.generationCounts === Seq(k, k))
    // measured: the mean of the last 3 folds must not exceed 3x the
    // mean of folds 2-4 (fold 0/1 pay first-plan costs; 3x absorbs
    // scheduling noise — the re-pin pattern grew ~linearly, i.e. the
    // last folds cost ~(k-1)/3 ~ 3x the early ones ON TOP of constant
    // overheads, and kept growing with k while this bound does not)
    val early = walls.slice(2, 5).sum / 3.0
    val late = walls.takeRight(3).sum / 3.0
    assert(late < 3.0 * early,
      s"per-fold wall grew with fold index: early=$early late=$late " +
        s"walls=${walls.map(w => f"$w%.2f").mkString(",")}")
    sld.unpersist()
  }
}
