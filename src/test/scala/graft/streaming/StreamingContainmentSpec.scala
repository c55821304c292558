package graft.streaming

import graft.TestSpark
import graft.pipeline.Dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming containment-dedup fold law: the standing kept set must
  * equal the one-shot [[Dedup.containmentDeduplicate]] over everything
  * ingested for ANY batch split — including arrival orders where the
  * absorber shows up AFTER its victims (the drop rule is order-free
  * and monotone, so the fold needs NO arrival contract, unlike the
  * ascending-id/time folds). Also pins the retro-drop pass (an old
  * kept doc flips to dropped when a bigger absorber finally arrives)
  * and the parquet save/restore roundtrip. */
class StreamingContainmentSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    1L -> "a b c d e f g h i j k l m n o p q r s t",
    2L -> "a b c d e f g h i j k l m n o p q r s t", // exact replica
    3L -> "a b c d e f g h",                         // excerpt of 1
    4L -> "zz yy xx ww vv uu tt ss rr qq",           // unrelated
    5L -> "one two",                                  // no shingles
    6L -> "a b c d e f g h i j k l m n o p q r s t u v w") // superset of 1

  private def df(rows: Seq[(Long, String)]) = rows.toDF("id", "text")

  private def oneShotKept: Set[Long] =
    Dedup.containmentDeduplicate(df(corpus), col("id"), col("text"),
      minPpm = 800000L)
      .collect().map(_.getAs[Long]("id")).toSet

  test("every split — including absorber-last arrival — folds to the " +
      "one-shot kept set") {
    val want = oneShotKept
    // 6 absorbs 1 and 2 (20/20 shingles shared, 6 is bigger); 3 is an
    // excerpt of 1/2/6; sanity-pin the semantics before the fold law
    assert(want === Set(6L, 4L, 5L))
    val splits = Seq(
      Seq(corpus.take(3), corpus.drop(3)),
      Seq(corpus.drop(3), corpus.take(3)),              // absorber first
      Seq(corpus.filter(_._1 != 6L), corpus.filter(_._1 == 6L)), // absorber LAST
      corpus.map(Seq(_)))                                // one doc per batch
    splits.foreach { batches =>
      val s = new StructuredStreams.StreamingContainmentDedup(
        "id", "text", minPpm = 800000L)
      batches.filter(_.nonEmpty).foreach(rows => s.fold(df(rows)))
      val got = s.current.get.collect().map(_.getAs[Long]("id")).toSet
      assert(got === want, s"split ${batches.map(_.map(_._1))} diverged")
      s.unpersist()
    }
  }

  test("retro-drop: a doc kept for several folds flips to dropped the " +
      "moment its absorber arrives") {
    val s = new StructuredStreams.StreamingContainmentDedup(
      "id", "text", minPpm = 800000L)
    s.fold(df(corpus.filter(r => r._1 == 1L || r._1 == 4L)))
    assert(s.current.get.collect().map(_.getLong(0)).toSet ===
      Set(1L, 4L), "doc 1 should be kept while unchallenged")
    s.fold(df(corpus.filter(_._1 == 5L)))
    assert(s.current.get.collect().map(_.getLong(0)).toSet ===
      Set(1L, 4L, 5L))
    s.fold(df(corpus.filter(_._1 == 6L))) // the absorber arrives
    assert(s.current.get.collect().map(_.getLong(0)).toSet ===
      Set(4L, 5L, 6L), "doc 1 must retro-drop into doc 6")
    s.unpersist()
  }

  test("save → restore → fold rest ≡ uninterrupted (all five state " +
      "frames roundtrip)") {
    val s1 = new StructuredStreams.StreamingContainmentDedup(
      "id", "text", minPpm = 800000L)
    s1.fold(df(corpus.take(4)))
    val dir = Files.createTempDirectory("contain-stream").toString
    s1.save(dir); s1.unpersist()
    val s2 = new StructuredStreams.StreamingContainmentDedup(
      "id", "text", minPpm = 800000L)
    s2.restore(spark, dir)
    s2.fold(df(corpus.drop(4)))
    val got = s2.current.get.collect().map(_.getLong(0)).toSet
    assert(got === oneShotKept)
    s2.unpersist()
  }
}
