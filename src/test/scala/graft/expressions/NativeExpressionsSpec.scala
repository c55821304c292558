package graft.expressions

import graft.TestSpark
import graft.pipeline.{Ann, Dedup, TextAnalysis}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native kernels must be VALUE-IDENTICAL to the Column-expression
  * formulations they replaced (the oracle entries were proven green
  * against those) — asserted here on the real sf0.001 documents /
  * embeddings tables plus adversarial edge strings. */
class NativeExpressionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select(col("doc_id"), col("text"))

  // whitespace shapes, short docs, unicode, punctuation-glued markers
  // (ids start above every real doc_id — the simhash/minhash tests join
  // on id, so a collision would compare different documents)
  private lazy val edge = Seq(
    (91100L, ""), (91101L, " "), (91102L, "  a  "), (91103L, "a b"),
    (91104L, "a b c"), (91105L, "Tabs\tand\nnewlines  mixed   in"),
    (91106L, "the, and. of! is? the; and"), (91107L, "UPPER case THE And of"),
    (91108L, "der und die das ist nicht"), (91109L, "数据 処理 the"),
    (91110L, "word " * 50 + "tail")).toDF("doc_id", "text")

  private lazy val all = docs.unionByName(edge)

  test("wordShingles matches the HOF formulation on docs + edges") {
    val mismatch = all.select(
      TextAnalysis.shingles(col("text"), 3).as("native"),
      TextAnalysis.shinglesHof(col("text"), 3).as("hof"))
      .where(not(col("native") === col("hof"))).count()
    assert(mismatch === 0)
  }

  test("wordNgrams matches the transform formulation with multiplicity") {
    // the interpreted shape the LM pair stream replaced: all adjacent
    // bigrams in order, every occurrence kept
    val hof = expr("CASE WHEN size(toks) >= 2 THEN " +
      "transform(sequence(1, size(toks) - 1), " +
      "i -> concat(toks[i-1], ' ', toks[i])) " +
      "ELSE array() END")
    val mismatch = all
      .select(col("text"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(native.wordNgrams(col("text"), 2).as("native"), hof.as("ref"))
      .where(not(col("native") === col("ref"))).count()
    assert(mismatch === 0)
  }

  test("minShingleFingerprint matches the HOF formulation") {
    val mismatch = all.select(
      TextAnalysis.minShingleFingerprint(col("text")).as("native"),
      TextAnalysis.minShingleFingerprintHof(col("text")).as("hof"))
      .where(not(col("native") === col("hof"))).count()
    assert(mismatch === 0)
  }

  test("langId matches the regex formulation") {
    val mismatch = all.select(
      TextAnalysis.langId(col("text")).as("native"),
      TextAnalysis.langIdHof(col("text")).as("hof"))
      .where(not(col("native") === col("hof"))).count()
    assert(mismatch === 0)
  }

  test("rollingHash matches the fold formulation") {
    val mismatch = all.select(
      TextAnalysis.rollingHash(col("text")).as("native"),
      TextAnalysis.rollingHashHof(col("text")).as("hof"))
      .where(not(col("native") === col("hof"))).count()
    assert(mismatch === 0)
  }

  test("meanWordLength and stopwordRatio match the HOF formulations") {
    val sw = TextAnalysis.EnglishStopwords
    val mismatch = all.select(
      TextAnalysis.meanWordLength(col("text")).as("mn"),
      TextAnalysis.meanWordLengthHof(col("text")).as("mh"),
      TextAnalysis.stopwordRatio(col("text"), sw).as("sn"),
      TextAnalysis.stopwordRatioHof(col("text"), sw).as("sh"))
      .where(not(col("mn") <=> col("mh")) or not(col("sn") <=> col("sh")))
      .count()
    assert(mismatch === 0)
  }

  test("simhash32 matches the exploded table for both token hashes") {
    Seq(Dedup.xxTokenHash32 -> false, Dedup.md5TokenHash32 -> true)
      .foreach { case (hash, _) =>
        val native = Dedup.simhashTable(all, col("doc_id"), col("text"), hash)
        val exploded = Dedup.simhashTableExploded(all, col("doc_id"),
          col("text"), hash)
        val diff = native.toDF("id", "a").join(exploded.toDF("id", "b"), "id")
          .where(col("a") =!= col("b")).count()
        assert(diff === 0)
        assert(native.count() === exploded.count())
      }
  }

  test("minhash signatures match the exploded aggregation") {
    val sh = all.select(col("doc_id").as("id"),
      TextAnalysis.shingles(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
    val native = Dedup.minhashSignatureTable(sh, 64).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val exploded = Dedup.minhashSignatureTableExploded(sh, 64).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native === exploded)
  }

  test("cosine is bit-identical to the Column fold on real embeddings") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), Ann.toDouble(col("embedding")).as("v"))
    val pairs = emb.toDF("ida", "va")
      .crossJoin(emb.toDF("idb", "vb")).limit(2000)
    val mismatch = pairs.select(
      Ann.cosine(col("va"), col("vb")).as("native"),
      Ann.cosineHof(col("va"), col("vb")).as("hof"))
      // bit-identical: plain equality, no tolerance
      .where(not(col("native") <=> col("hof"))).count()
    assert(mismatch === 0)
    // zero-norm guard: null, not NaN
    val z = Seq((Array(0.0, 0.0), Array(1.0, 1.0))).toDF("a", "b")
      .select(Ann.cosine(col("a"), col("b")).as("c")).head()
    assert(z.isNullAt(0))
  }

  test("native expressions stay inside whole-stage codegen") {
    val df = docs.select(
      TextAnalysis.minShingleFingerprint(col("text")).as("fp"),
      TextAnalysis.langId(col("text")).as("lang"),
      native.wordNgrams(col("text"), 2).as("bigrams"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // codegen'd project shows as *(n) — no fallback marker
    assert(plan.contains("*(1)"), s"expected codegen in plan:\n$plan")
  }
}
