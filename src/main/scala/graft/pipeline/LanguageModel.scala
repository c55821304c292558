package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-fit quality scoring via an add-one-smoothed word-bigram
  * language model — the CCNet-style filter: train a small LM on the
  * corpus (or a trusted reference corpus), score every document by its
  * per-token cross-entropy, and gate or bucket on the score.
  * Boilerplate and gibberish score high (poor corpus fit), fluent text
  * scores low; curation pipelines use exactly this signal to drop the
  * tails before training.
  *
  * Cross-engine discipline (the `classify_nb` pattern, green at sf1):
  * every model quantity is an EXACT integer count, vocabulary
  * truncation ties break on (count desc, token asc), smoothing
  * denominators are exact integers, so both engines feed identical
  * doubles to `ln`; per-document sums of a few hundred log terms are
  * rounded to 6 decimals only AFTER the sum, where the float
  * association-order wobble (~1e-15) is nine orders below the rounding
  * grain.
  *
  * Scale shape: vocabulary selection is a distributed top-V
  * (per-partition top-V, merge — never a full sort); bigram counting is
  * ONE key-hash shuffle whose key space is capped at (V+1)² by the
  * out-of-vocabulary fold, so map-side combine collapses it to
  * thousands of rows per partition regardless of corpus size; scoring
  * is scan-bound — three broadcast joins (vocab twice, the bounded
  * count tables) and one doc-keyed aggregation. The model lives in
  * DataFrames; the driver never holds counts.
  */
object LanguageModel {

  /** Reserved token the out-of-vocabulary fold maps to. Whitespace
    * tokenization can never produce it (it contains no letters the
    * corpus would need — but more simply, any collision only merges it
    * with a real token's counts, which both engines do identically). */
  val Unk = "<unk>"

  /** Trained bigram model: exact-count tables plus the smoothing
    * constant. `bigramCounts` is (w1, w2, c) over the OOV-folded token
    * stream — at most (V+1)² rows; `firstCounts` is its (w1, c1)
    * marginal; `vSmooth` = |vocab| + 1 (the UNK slot), the add-one
    * denominator offset. */
  final case class BigramLm(bigramCounts: DataFrame, firstCounts: DataFrame,
      vocab: DataFrame, vSmooth: Long)

  /** Adjacent token pairs of each document: (id, a, b) — one codegen'd
    * map stage, no shuffle. The pair stream comes from the native
    * [[graft.expressions.WordNgramsExpr]] kernel (all word bigrams
    * WITH multiplicity, space-joined); whitespace tokens cannot
    * contain the joining space, so `substring_index` recovers the two
    * sides exactly. Documents with fewer than two tokens vanish (no
    * pairs), identically on any engine. The interpreted
    * `transform(sequence(...), i -> struct(...))` formulation is
    * value-identical but ~10 µs/row — it made the LM entry 3× slower
    * at sf0.1 (LmProbe). */
  private def pairs(df: DataFrame, idCol: Column, textCol: Column)
      : DataFrame =
    df.select(idCol.as("id"),
        explode(graft.expressions.native.wordNgrams(textCol, 2)).as("bg"))
      .select(col("id"),
        substring_index(col("bg"), " ", 1).as("a"),
        substring_index(col("bg"), " ", -1).as("b"))

  /** Pairs with both sides folded through the vocabulary: out-of-vocab
    * tokens become [[Unk]]. Two broadcast joins — scan-bound. */
  private def mappedPairs(df: DataFrame, idCol: Column, textCol: Column,
      vocab: DataFrame): DataFrame =
    pairs(df, idCol, textCol)
      .join(broadcast(vocab.select(col("token").as("__va"))),
        col("a") === col("__va"), "left")
      .join(broadcast(vocab.select(col("token").as("__vb"))),
        col("b") === col("__vb"), "left")
      .select(col("id"),
        coalesce(col("__va"), lit(Unk)).as("w1"),
        coalesce(col("__vb"), lit(Unk)).as("w2"))

  /** Train the bigram model: top-`vocabSize` tokens by corpus frequency
    * (ties to the lexicographically smaller token — deterministic
    * truncation), then exact bigram counts over the OOV-folded stream.
    * One token-count shuffle + one bigram-count shuffle, both key-hash
    * with map-side combine. */
  def trainBigramLm(docs: DataFrame, idCol: Column, textCol: Column,
      vocabSize: Int = 256): BigramLm = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val vocab = docs
      .select(explode(TextAnalysis.tokens(textCol)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(vocabSize)
      .select("token")
      .persist()
    val bc = mappedPairs(docs, idCol, textCol, vocab)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .persist()
    bc.count() // materialize ONCE — scoring broadcasts bc and the fc
    // marginal concurrently, and an unmaterialized cache would let the
    // racing broadcast builds each recompute the counting pass
    val fc = bc.groupBy("w1").agg(sum("c").as("c1"))
    BigramLm(bc, fc, vocab, vocab.count() + 1L)
  }

  /** Score documents against the model: per-document cross-entropy in
    * nats, `xent = -(1/N) Σ ln (c(w1,w2)+1) / (c1(w1)+vSmooth)`, with
    * N the document's bigram count. Output (id, n_bigrams, xent),
    * xent rounded to 6 decimals after the sum. Unseen bigrams smooth
    * to c = 0; an unseen first word smooths to c1 = 0 (uniform over
    * the vocabulary). Documents with < 2 tokens are absent (no
    * bigrams to score). Scan-bound: broadcast joins + one doc-keyed
    * aggregation. */
  def scoreBigramLm(docs: DataFrame, idCol: Column, textCol: Column,
      model: BigramLm): DataFrame =
    mappedPairs(docs, idCol, textCol, model.vocab)
      .join(broadcast(model.bigramCounts), Seq("w1", "w2"), "left")
      .join(broadcast(model.firstCounts), Seq("w1"), "left")
      .withColumn("lp",
        log((coalesce(col("c"), lit(0L)).cast("double") + 1.0) /
          (coalesce(col("c1"), lit(0L)).cast("double") +
            model.vSmooth.toDouble)))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(-sum(col("lp")) / count(lit(1)), 6).as("xent"))

  /** Release the model's cached tables. */
  def unpersist(model: BigramLm): Unit = {
    model.bigramCounts.unpersist()
    model.vocab.unpersist()
    ()
  }
}
