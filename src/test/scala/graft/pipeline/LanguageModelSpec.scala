package graft.pipeline

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bigram-LM quality scoring: hand-computed smoothed cross-entropies,
  * OOV folding, fluent-vs-gibberish discrimination, vocabulary
  * truncation determinism, short-document handling, partitioning
  * invariance. */
class LanguageModelSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def score(train: Seq[(Long, String)], test: Seq[(Long, String)],
      vocabSize: Int = 256): Map[Long, (Long, Double)] = {
    val tr = train.toDF("doc_id", "text")
    val m = LanguageModel.trainBigramLm(tr, col("doc_id"), col("text"),
      vocabSize)
    val out = LanguageModel.scoreBigramLm(test.toDF("doc_id", "text"),
        col("doc_id"), col("text"), m)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    LanguageModel.unpersist(m)
    out
  }

  test("hand-computed smoothed cross-entropies match") {
    // corpus: "a b", "a b", "a c" -> vocab {a,b,c}, vSmooth = 4,
    // bigram counts (a,b)=2 (a,c)=1, first counts a=3
    val train = Seq((0L, "a b"), (1L, "a b"), (2L, "a c"))
    val s = score(train, Seq(
      (10L, "a b"),   // -ln((2+1)/(3+4)) = ln(7/3)
      (11L, "a d"),   // d folds to <unk>: -ln((0+1)/(3+4)) = ln 7
      (12L, "x y")))  // both <unk>, c1(<unk>) = 0: -ln(1/(0+4)) = ln 4
    assert(s(10L) == ((1L, BigDecimal(math.log(7.0 / 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(s(11L) == ((1L, BigDecimal(math.log(7.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(s(12L) == ((1L, BigDecimal(math.log(4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("fluent text scores lower than gibberish under the corpus LM") {
    val train = (0 until 50).map(i =>
      (i.toLong, "the cat sat on the mat and the dog ran"))
    val s = score(train,
      Seq((100L, "the cat sat on the mat"), (101L, "zq xv qqk wpl zzj")))
    assert(s(100L)._2 < s(101L)._2,
      s"fluent=${s(100L)._2} gibberish=${s(101L)._2}")
  }

  test("documents with fewer than two tokens produce no row") {
    val train = Seq((0L, "a b c"))
    val s = score(train, Seq((1L, "a"), (2L, ""), (3L, "b c")))
    assert(!s.contains(1L) && !s.contains(2L) && s.contains(3L))
  }

  test("vocabulary truncation is deterministic and folds the tail") {
    // 'rare' appears once, everything else twice; vocabSize 3 keeps
    // {a,b,c} (count desc, token asc) and folds 'rare' to <unk>
    val train = Seq((0L, "a b c a b c"), (1L, "rare b"))
    val sFull = score(train, Seq((9L, "rare b")), vocabSize = 10)
    val sCut = score(train, Seq((9L, "rare b")), vocabSize = 3)
    // with the tail folded, (rare,b) scores as (<unk>,b) — a different
    // (still deterministic) value
    assert(sFull(9L)._1 == 1L && sCut(9L)._1 == 1L)
    assert(sFull(9L)._2 != sCut(9L)._2)
  }

  test("scores are identical under repartitioning") {
    val train = (0 until 120).map(i =>
      (i.toLong, s"tok${i % 7} tok${(i * 3) % 11} tok${i % 5} end"))
    val tr = train.toDF("doc_id", "text")
    val m1 = LanguageModel.trainBigramLm(tr, col("doc_id"), col("text"), 16)
    val a = LanguageModel.scoreBigramLm(tr, col("doc_id"), col("text"), m1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    LanguageModel.unpersist(m1)
    val m2 = LanguageModel.trainBigramLm(tr.repartition(13), col("doc_id"),
      col("text"), 16)
    val b = LanguageModel.scoreBigramLm(tr.repartition(7), col("doc_id"),
        col("text"), m2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    LanguageModel.unpersist(m2)
    assert(a.sameElements(b))
  }
}
