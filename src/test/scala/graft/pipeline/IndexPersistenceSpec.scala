package graft.pipeline

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Restart durability of the standing-state indexes: every standing
  * index in graft is a plain DataFrame with a documented schema, so a
  * session restart is parquet write + read — these specs prove the
  * OPERATIONAL claim that folding resumed from disk equals never
  * having restarted (the fold laws hold across the parquet roundtrip,
  * including types the writer could plausibly mangle). */
class IndexPersistenceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsOf(rows: Seq[(Long, String)]) = rows.toDF("id", "text")

  test("NoveltyIndex: save, reload, fold more batches — identical to " +
      "the uninterrupted fold AND to the one-shot index") {
    val b1 = docsOf((0L until 40L).map(i =>
      i -> s"alpha beta w$i x${i % 7} y${i % 5} gamma"))
    val b2 = docsOf((40L until 80L).map(i =>
      i -> s"alpha beta w${i - 40} x${i % 7} z${i % 3} delta"))
    val all = b1.unionByName(b2)

    val idx1 = TextAnalysis.buildNoveltyIndex(b1, col("id"), col("text"))
    val dir = Files.createTempDirectory("novidx").toString
    idx1.firstOwners.write.mode("overwrite").parquet(dir)
    // ---- simulated restart: state comes back from parquet ----
    val reloaded = TextAnalysis.NoveltyIndex(spark.read.parquet(dir))
    val resumed = TextAnalysis.foldNoveltyIndex(reloaded,
      TextAnalysis.buildNoveltyIndex(b2, col("id"), col("text")))
    val oneShot = TextAnalysis.buildNoveltyIndex(all, col("id"),
      col("text"))
    def asMap(i: TextAnalysis.NoveltyIndex) =
      i.firstOwners.collect()
        .map(r => r.getAs[String]("sh") -> r.getAs[Long]("first_doc"))
        .toMap
    assert(asMap(resumed) === asMap(oneShot))
    // and the scored output through the resumed index matches too
    val viaResumed = TextAnalysis.noveltyWithIndex(all, col("id"),
      col("text"), resumed).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.toSeq.drop(1)).toMap
    val viaOneShot = TextAnalysis.noveltyWithIndex(all, col("id"),
      col("text"), oneShot).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.toSeq.drop(1)).toMap
    assert(viaResumed === viaOneShot)
  }

  test("line-dedup index: parquet roundtrip preserves the fold law") {
    val b1 = (0L until 30L).map(i =>
      (i, s"shared line\nunique-$i line two")).toDF("doc_id", "text")
    val b2 = (30L until 60L).map(i =>
      (i, s"shared line\nunique-$i line two")).toDF("doc_id", "text")
    val all = b1.unionByName(b2)

    val idx1 = Dedup.buildLineIndex(b1, col("doc_id"), col("text"))
    val dir = Files.createTempDirectory("lineidx").toString
    idx1.owners.write.mode("overwrite").parquet(dir)
    val resumed = Dedup.foldLineIndex(
      Dedup.LineIndex(spark.read.parquet(dir)),
      Dedup.buildLineIndex(b2, col("doc_id"), col("text")))
    val oneShot = Dedup.buildLineIndex(all, col("doc_id"), col("text"))
    val a = resumed.owners.collect().map(_.toSeq).toSet
    val b = oneShot.owners.collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
