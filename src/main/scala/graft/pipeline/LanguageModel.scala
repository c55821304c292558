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

  /** Pointwise-mutual-information collocations — the classic phrase /
    * multi-word-expression miner (tokenizer seeding, stop-phrase
    * lists): for every adjacent pair seen ≥ `minCount` times,
    * PMI = ln( p(w1,w2) / (p(w1)·p(w2)) )
    *     = ln( c₁₂ · T · T / (B · c₁ · c₂) )
    * with T the corpus token count and B its bigram count. Returns the
    * `topK` pairs by (PMI desc, bigram asc): (w1, w2, c12, pmi).
    *
    * Determinism: all counts are exact integers; the cross-multiplied
    * rational goes through DOUBLE (exact IEEE ops; the integer products
    * overflow int64 at real corpus totals) into ONE round-9 ln — the
    * DSIR discipline. Scale shape: one token-count and one bigram-count
    * shuffle (both map-side combined, vocab-sized outputs), unigram
    * counts joined back BY TOKEN (vocab tables are not broadcastable at
    * 100 TB), corpus totals one broadcast row, then the skew-proof
    * two-phase top-k. The `minCount` floor is applied BEFORE the joins
    * — it prunes the hapax tail, which is most of the bigram table. */
  def pmiCollocations(docs: DataFrame, idCol: Column, textCol: Column,
      minCount: Long, topK: Int): DataFrame = {
    require(minCount >= 1L && topK >= 1, "minCount and topK must be >= 1")
    val uni = docs
      .select(explode(graft.pipeline.TextAnalysis.tokens(textCol))
        .as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val totals = uni.agg(sum(col("c")).as("t"))
    // ONE corpus pass builds the grouped bigram table; the total and
    // the min-count slice both read the pinned aggregate (re-deriving
    // either would re-tokenize the corpus)
    val big = pairs(docs, idCol, textCol)
      .groupBy(col("a").as("w1"), col("b").as("w2"))
      .agg(count(lit(1)).as("c12"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val btot = big.agg(sum(col("c12")).as("bt"))
    val bi = big.where(col("c12") >= minCount)
    val scored = bi
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(btot))
      .select(col("w1"), col("w2"), col("c12"),
        round(log(
          (col("c12").cast("double") * col("t").cast("double") *
            col("t").cast("double")) /
            (col("bt").cast("double") * col("c1").cast("double") *
              col("c2").cast("double"))), 9).as("pmi"))
    val out = Sampling.topKPerGroup(scored, lit(1), col("pmi"),
      concat_ws(" ", col("w1"), col("w2")).asc, topK)
      .select(col("w1"), col("w2"), col("c12"), col("pmi"),
        col("rank").cast("long").as("rank"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    big.unpersist()
    out
  }
}
