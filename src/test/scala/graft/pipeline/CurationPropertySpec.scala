package graft.pipeline

import graft.TestSpark
import graft.expressions.Kernels

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the curation kernels on arbitrary content
  * (raw ScalaCheck generators, deterministic seed — the scalatest
  * bridge artifact is not in the offline cache). */
class CurationPropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def forAll[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(4242L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 10) {
      gen.apply(params, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(produced > 0, "generator produced no samples")
  }

  /** Text with whitespace runs, unicode (incl. decomposable sequences),
    * punctuation, and control characters. */
  private val messyText: Gen[String] =
    Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      Gen.oneOf(" ", "  ", "\t", "\n", ".", ",", "ü", "中",
        "é", "Å", "", "ö"),
      Gen.const(" the "))).map(_.mkString)

  test("topTokenCount kernel equals the brute-force mode on arbitrary " +
      "text") {
    forAll(messyText) { s =>
      val toks = Kernels.loweredTrimmed(UTF8String.fromString(s))
        .split("\\s+", -1)
      val brute =
        if (toks.isEmpty) 0L
        else toks.groupBy(identity).values.map(_.length).max.toLong
      assert(Kernels.topTokenCount(UTF8String.fromString(s)) === brute,
        s"text=${s.take(60)}")
    }
  }

  test("nfc kernel equals java.text.Normalizer and is idempotent") {
    forAll(messyText) { s =>
      val once = Kernels.nfc(UTF8String.fromString(s)).toString
      assert(once === java.text.Normalizer.normalize(s,
        java.text.Normalizer.Form.NFC))
      assert(Kernels.nfc(UTF8String.fromString(once)).toString === once)
    }
  }

  test("wordShingles: distinct, exactly n tokens each, count bounded " +
      "by window count") {
    val gen = Gen.zip(messyText, Gen.choose(1, 4))
    forAll(gen) { case (s, n) =>
      val sh = Kernels.wordShingles(UTF8String.fromString(s), n)
      val arr = (0 until sh.numElements())
        .map(i => sh.getUTF8String(i).toString)
      assert(arr.distinct.length === arr.length)
      assert(arr.forall(_.split(" ", -1).length === n))
      val toks = Kernels.loweredTrimmed(UTF8String.fromString(s))
        .split("\\s+", -1)
      val windows = math.max(0, toks.length - n + 1)
      assert(arr.length <= windows)
      if (windows > 0) assert(arr.nonEmpty)
    }
  }

  test("cleanText is idempotent and leaves no control chars or " +
      "whitespace runs (arbitrary corpus, one distributed pass)") {
    val samples = scala.collection.mutable.ArrayBuffer.empty[String]
    forAll(messyText, n = 200)(samples += _)
    val spark2 = spark
    import spark2.implicits._
    val df = samples.toSeq.zipWithIndex.map(_.swap).toDF("id", "text")
    val once = df.select(col("id"),
      TextAnalysis.cleanText(col("text")).as("c1"))
    val twice = once.select(col("id"),
      col("c1"), TextAnalysis.cleanText(col("c1")).as("c2"))
    val rows = twice.collect()
    rows.foreach { r =>
      val c1 = r.getString(1)
      assert(c1 === r.getString(2), "cleanText not idempotent")
      assert(!c1.exists(_.isControl), "control char survived")
      assert(!c1.contains("  "), "whitespace run survived")
      assert(c1 == c1.trim, "untrimmed")
    }
  }
}
