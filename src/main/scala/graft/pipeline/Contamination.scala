package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: per-document word-n-gram overlap
  * between a training corpus and a (much smaller) evaluation set.
  *
  * The scale shape is the one that matters at 100 TB: the EVAL side is
  * small by construction (benchmarks are thousands of documents, not
  * billions), so its distinct n-gram set is collected into a broadcast
  * hash relation and the corpus side stays a single scan + semi-join +
  * per-document aggregation — one shuffle keyed by doc id, no corpus ×
  * corpus join anywhere. Shingling runs through the native codegen'd
  * kernel ([[graft.expressions.native.wordShingles]]).
  */
object Contamination {

  /** Per-document contamination report of `corpus` against `evalSet`:
    * `(doc_id, n_shingles, overlap_ngrams, contamination)` where
    * `contamination = overlap_ngrams / n_shingles` over DISTINCT word
    * n-grams. Documents with fewer than `n` tokens carry no n-grams and
    * are excluded (they cannot be meaningfully contaminated).
    *
    * `broadcastEval` (default true) asserts the eval side is small
    * enough to broadcast; pass false to fall back to a shuffled
    * semi-join when screening against an unusually large eval corpus.
    */
  def overlapTable(corpus: DataFrame, idCol: Column, textCol: Column,
      evalSet: DataFrame, evalTextCol: Column, n: Int = 3,
      broadcastEval: Boolean = true): DataFrame = {
    val evalGrams = {
      val g = evalSet
        .select(explode(TextAnalysis.shingles(evalTextCol, n)).as("__g"))
        .distinct()
        .withColumn("__hit", lit(1L))
      if (broadcastEval) broadcast(g) else g
    }
    // ONE corpus scan: shingle, explode, left-join the hit marker, and
    // aggregate per doc (every kept doc has >= 1 gram row, and eval
    // grams are distinct, so the join never duplicates rows)
    corpus
      .select(idCol.as("doc_id"),
        TextAnalysis.shingles(textCol, n).as("__sh"))
      .where(size(col("__sh")) > 0)
      .select(col("doc_id"), size(col("__sh")).cast("long").as("__n"),
        explode(col("__sh")).as("__g"))
      .join(evalGrams, Seq("__g"), "left")
      .groupBy(col("doc_id"))
      .agg(max(col("__n")).as("n_shingles"),
        coalesce(sum(col("__hit")), lit(0L)).as("overlap_ngrams"))
      .withColumn("contamination",
        round(col("overlap_ngrams").cast("double") /
          col("n_shingles").cast("double"), 6))
  }

  /** Documents whose contamination fraction meets `threshold` — the
    * decontamination drop-list. Same plan as [[overlapTable]] plus one
    * pushed filter. */
  def contaminated(corpus: DataFrame, idCol: Column, textCol: Column,
      evalSet: DataFrame, evalTextCol: Column, threshold: Double,
      n: Int = 3, broadcastEval: Boolean = true): DataFrame =
    overlapTable(corpus, idCol, textCol, evalSet, evalTextCol, n,
      broadcastEval)
      .where(col("contamination") >= threshold)

  /** Bloom filter over the eval set's distinct n-grams — the STATELESS
    * decontamination carrier for streaming ingest (a per-doc overlap
    * aggregation needs stateful streaming; a membership sketch needs
    * none). Built once batch-side, a few MB at fpp=1e-3 for millions of
    * grams; ship it through [[mightBeContaminated]]. */
  def evalNgramBloom(evalSet: DataFrame, evalTextCol: Column, n: Int = 3,
      expectedItems: Long = 1000000L, fpp: Double = 0.001)
      : org.apache.spark.util.sketch.BloomFilter =
    evalSet
      .select(explode(TextAnalysis.shingles(evalTextCol, n)).as("__g"))
      .distinct()
      .stat.bloomFilter("__g", expectedItems, fpp)

  /** TRUE when any n-gram of `text` is (probably) in the eval bloom —
    * the streaming-safe contamination predicate. One broadcast + a pure
    * per-row filter: works identically on batch and streaming frames.
    * False positives (rate `fpp`) drop clean documents — the
    * conservative direction for decontamination; there are no false
    * negatives. */
  def mightBeContaminated(bloom: org.apache.spark.util.sketch.BloomFilter,
      textCol: Column, n: Int = 3): Column = {
    val check = udf((grams: Seq[String]) =>
      grams != null && grams.exists(g => bloom.mightContainString(g)))
    check(TextAnalysis.shingles(textCol, n))
  }
}
