package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClassifierSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def table(rows: (Long, String, String)*) =
    rows.toDF("id", "text", "label")

  test("NB: disjoint vocabularies classify perfectly; OOV tokens are " +
      "neutral across classes") {
    val train = table(
      (1L, "aa bb aa cc", "x"), (2L, "aa cc bb", "x"),
      (3L, "dd ee dd ff", "y"), (4L, "ee ff dd", "y"))
    val m = Classifier.trainNaiveBayes(train, col("text"), col("label"))
    assert(m.nTrainDocs === 4L)
    assert(m.vocabSize === 6L)
    val test = table(
      (10L, "aa bb", "?"), (11L, "dd ee ee", "?"),
      (12L, "zz aa zz", "?")) // zz is OOV everywhere: aa decides
    val pred = Classifier
      .scoreNaiveBayes(test, col("id"), col("text"), m)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred === Map(10L -> "x", 11L -> "y", 12L -> "x"))
  }

  test("NB: model counts are exact integers and the vocab cap keeps " +
      "only the top-V tokens with deterministic ties") {
    val train = table(
      (1L, "aa aa aa bb bb cc", "x"), (2L, "dd", "y"))
    val m = Classifier.trainNaiveBayes(train, col("text"), col("label"),
      vocabSize = 2)
    val counts = m.tokenCounts.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // top-2 by tf: aa(3), bb(2) — cc and dd fall outside the cap
    assert(counts === Map(("aa", "x") -> 3L, ("bb", "x") -> 2L))
    assert(m.vocabSize === 2L)
    // class totals count only in-vocab mass; y has none
    val cls = m.classes.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(cls === Map("x" -> ((1L, 5L)), "y" -> ((1L, 0L))))
  }

  test("NB: equal scores break ties by label ascending, and priors " +
      "decide when likelihoods tie") {
    // identical class-conditional token distributions, symmetric docs:
    // every score ties → label asc wins
    val sym = table((1L, "aa", "x"), (2L, "aa", "y"))
    val mSym = Classifier.trainNaiveBayes(sym, col("text"), col("label"))
    val tie = Classifier.scoreNaiveBayes(
      table((9L, "aa", "?")), col("id"), col("text"), mSym)
      .collect().head
    assert(tie.getString(1) === "x")
    // 2:1 priors with identical likelihoods → majority class
    val maj = table((1L, "aa", "y"), (2L, "aa", "y"), (3L, "aa", "x"))
    val mMaj = Classifier.trainNaiveBayes(maj, col("text"), col("label"))
    val p = Classifier.scoreNaiveBayes(
      table((9L, "aa aa", "?")), col("id"), col("text"), mMaj)
      .collect().head
    assert(p.getString(1) === "y")
  }

  test("NB: scoring is partitioning-independent") {
    val train = table(
      (1L, "aa bb aa", "x"), (2L, "cc dd cc", "y"), (3L, "aa cc", "x"))
    val m = Classifier.trainNaiveBayes(train, col("text"), col("label"))
    val test = table((10L, "aa aa cc", "?"), (11L, "dd cc", "?"),
      (12L, "bb", "?"))
    val p1 = Classifier.scoreNaiveBayes(test.repartition(1),
      col("id"), col("text"), m).collect().sortBy(_.getLong(0)).toSeq
    val p7 = Classifier.scoreNaiveBayes(test.repartition(7),
      col("id"), col("text"), m).collect().sortBy(_.getLong(0)).toSeq
    assert(p1 === p7)
  }
}
