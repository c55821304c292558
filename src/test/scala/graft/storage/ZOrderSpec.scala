package graft.storage

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Z-order clustering: the Morton code against a bit-twiddling
  * reference, locality monotonicity, the fail-loud range guard, and —
  * the point of the exercise — measured file skipping: a 2-D box query
  * over a z-clustered layout must prune strictly more files than the
  * same data sorted on one dimension only. */
class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mortonRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))
    }.reduce(_ | _)

  test("zValue2 matches the reference interleave on random inputs") {
    val rnd = new scala.util.Random(11)
    val pts = (0 until 500).map(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pts.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue2(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z === mortonRef(a, b, 16)) }
  }

  test("out-of-range coordinates raise instead of silently masking") {
    val ex = intercept[Exception] {
      Seq((65536L, 1L)).toDF("a", "b")
        .select(ZOrder.zValue2(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.contains("zValue2") ||
      Option(ex.getCause).exists(_.getMessage.contains("zValue2")))
  }

  test("z-clustered layout prunes a 2-D box strictly better than " +
    "single-dimension sort") {
    val dir = Files.createTempDirectory("zorder").toString
    // uniform grid: both dimensions carry real selectivity
    val rnd = new scala.util.Random(13)
    val data = (0 until 20_000).map { i =>
      (i.toLong, rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong)
    }.toDF("id", "a", "b")

    val zPath = s"$dir/z"
    val lPath = s"$dir/linear"
    // 64 files, not 32: range-partition boundaries come from SAMPLED
    // splits, so candidate counts jitter by ±1 file — at 32 files the
    // z-vs-linear gap was one file wide (full-suite run 2026-08-15 saw
    // z=4 vs linear=4) and the strict compare flaked; at 64 the
    // expected gap (~4 z cells vs ~8 linear stripes for a 1/8 × 1/8
    // box) absorbs the sampling jitter
    ZOrder.clusterWrite(data, col("a"), col("b"), zPath, nFiles = 64,
      bits = 12)
    data.repartitionByRange(64, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(lPath)

    // box selective in BOTH dims: 1/8 × 1/8 of the space
    val (aLo, aHi, bLo, bHi) = (1024L, 1535L, 1024L, 1535L)
    val zCand = ZOrder.candidateFiles(spark, zPath, "a", "b",
      aLo, aHi, bLo, bHi)
    val lCand = ZOrder.candidateFiles(spark, lPath, "a", "b",
      aLo, aHi, bLo, bHi)
    // the a-sorted layout prunes on a only (≈ 1/8 of 64 ≈ 8 files) but
    // every surviving file spans all of b; z-ordering must beat it
    assert(zCand < lCand,
      s"z-layout candidates ($zCand) should be < linear ($lCand)")
    // and both layouts return the same rows (layout is not semantics)
    val zRows = spark.read.parquet(zPath)
      .where(col("a").between(aLo, aHi) && col("b").between(bLo, bHi))
      .select("id").as[Long].collect().toSet
    val lRows = spark.read.parquet(lPath)
      .where(col("a").between(aLo, aHi) && col("b").between(bLo, bHi))
      .select("id").as[Long].collect().toSet
    assert(zRows === lRows && zRows.nonEmpty)
  }
}
