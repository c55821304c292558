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
      if (broadcastEval) broadcast(g) else g
    }
    val docGrams = corpus
      .select(idCol.as("doc_id"),
        TextAnalysis.shingles(textCol, n).as("__sh"))
      .where(size(col("__sh")) > 0)
      .select(col("doc_id"), size(col("__sh")).cast("long").as("n_shingles"),
        explode(col("__sh")).as("__g"))
    val hits = docGrams
      .join(evalGrams, Seq("__g"), "leftsemi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("overlap_ngrams"))
    corpus
      .select(idCol.as("doc_id"),
        size(TextAnalysis.shingles(textCol, n)).cast("long")
          .as("n_shingles"))
      .where(col("n_shingles") > 0)
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("overlap_ngrams"), lit(0L)).as("overlap_ngrams"))
      .withColumn("contamination",
        round(col("overlap_ngrams").cast("double") /
          col("n_shingles").cast("double"), 6))
  }

  /** Documents whose contamination fraction meets `threshold` — the
    * decontamination drop-list. Same plan as [[overlapTable]] plus one
    * pushed filter. */
  def contaminated(corpus: DataFrame, idCol: Column, textCol: Column,
      evalSet: DataFrame, evalTextCol: Column, threshold: Double,
      n: Int = 3): DataFrame =
    overlapTable(corpus, idCol, textCol, evalSet, evalTextCol, n)
      .where(col("contamination") >= threshold)
}
