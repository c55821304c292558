package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised token classifiers for corpus curation — the
  * fasttext-style language/quality filter every large training-data
  * pipeline runs over its corpus before mixing.
  *
  * Multinomial Naive Bayes over whitespace tokens with a frequency-
  * capped vocabulary and Laplace smoothing. Spark-first shape:
  *
  *  - TRAIN is ONE shuffle: token counts per (label, token) with
  *    map-side combine, then a driverless top-V vocabulary cut
  *    (orderBy+limit → TakeOrdered, no window, no collect of the
  *    corpus). The model is counts — exact integers — so training is
  *    reproducible bit-for-bit and the oracle can state it.
  *  - The MODEL is bounded by construction (V tokens × C classes),
  *    which is what makes SCORE a broadcast join no matter how large
  *    the scoring corpus is: explode tokens × C classes, hash-join the
  *    broadcast count table, one doc-keyed aggregation. No shuffle
  *    touches anything proportional to vocabulary or model size.
  *  - Only bounded metadata (V, the train-doc count) ever reaches the
  *    driver — same budget as the k-means cell sums in [[Ann]].
  *
  * Smoothing: p(token|c) = (cnt + 1) / (tot_c + V + 1), where cnt = 0
  * for any token outside the capped vocabulary (out-of-vocab tokens
  * score like seen-zero tokens — one consistent formula, no OOV
  * special case). score(d, c) = ln(prior_c) + Σ_tokens ln p(token|c).
  */
object Classifier {

  /** Exact-integer NB model. `tokenCounts`: (token, label, cnt) over
    * the capped vocabulary; `classes`: (label, n_docs, tot) with `tot`
    * the class token mass inside the vocabulary; `vocabSize` /
    * `nTrainDocs`: the two scalars of the smoothing formula. */
  final case class NBModel(tokenCounts: DataFrame, classes: DataFrame,
      vocabSize: Long, nTrainDocs: Long)

  /** Train on `docs`: one (label, token) count shuffle + a top-V
    * vocabulary cut (ties broken by token ascending, so the cut is
    * deterministic across partitionings). */
  def trainNaiveBayes(docs: DataFrame, textCol: Column, labelCol: Column,
      vocabSize: Int = 512): NBModel = {
    val lab = docs.select(labelCol.as("label"),
      TextAnalysis.tokens(textCol).as("toks"))
    val tf = lab.select(col("label"), explode(col("toks")).as("token"))
      .groupBy("label", "token").agg(count(lit(1)).as("cnt"))
    val vocab = tf.groupBy("token").agg(sum("cnt").as("tf"))
      .orderBy(col("tf").desc, col("token").asc)
      .limit(vocabSize)
      .select("token")
    val vcnt = tf.join(broadcast(vocab), "token")
      .select("token", "label", "cnt")
      .persist()
    val classes = lab.groupBy("label").agg(count(lit(1)).as("n_docs"))
      .join(vcnt.groupBy("label").agg(sum("cnt").as("tot")),
        Seq("label"), "left")
      .na.fill(0L, Seq("tot"))
    // bounded metadata only: |vocab| and the train-doc count
    val v = vcnt.select(countDistinct("token")).head().getLong(0)
    val n = lab.count()
    NBModel(vcnt, classes, v, n)
  }

  /** Score + predict: explode scoring tokens × C classes, broadcast-
    * join the count table, one doc-keyed sum, then a skew-proof top-1
    * per doc (score desc, label asc on ties). Output: (id, label,
    * logp) with logp rounded to 6 decimals — same cross-engine float
    * discipline as the surprisal oracle. */
  def scoreNaiveBayes(docs: DataFrame, idCol: Column, textCol: Column,
      model: NBModel): DataFrame = {
    val scored = allClassScores(docs, idCol, textCol, model)
    Sampling.topKPerGroup(scored, col("id"), col("score"),
        col("label").asc, k = 1)
      .select(col("id"), col("label"),
        round(col("score"), 6).as("logp"))
  }

  /** Full per-class posterior table (id, label, logp) — one row per
    * (doc, class), round-6 like [[scoreNaiveBayes]]. The input to
    * one-vs-rest evaluation ([[Evaluation.rocCurve]]): pick a class,
    * its `logp` is the ranking score. Same broadcast-join plan as the
    * top-1 scorer, minus the top-k. */
  def scoreNaiveBayesAll(docs: DataFrame, idCol: Column, textCol: Column,
      model: NBModel): DataFrame =
    allClassScores(docs, idCol, textCol, model)
      .select(col("id"), col("label"), round(col("score"), 6).as("logp"))

  private def allClassScores(docs: DataFrame, idCol: Column,
      textCol: Column, model: NBModel): DataFrame = {
    val cls = model.classes
      .withColumn("log_prior",
        log(col("n_docs").cast("double") / model.nTrainDocs.toDouble))
      .withColumn("denom",
        col("tot").cast("double") + (model.vocabSize + 1.0))
      .select("label", "log_prior", "denom")
    val toks = docs.select(idCol.as("id"),
      explode(TextAnalysis.tokens(textCol)).as("token"))
    toks
      .crossJoin(broadcast(cls))
      .join(broadcast(model.tokenCounts), Seq("token", "label"), "left")
      .groupBy("id", "label")
      .agg(
        sum(log((coalesce(col("cnt"), lit(0L)).cast("double") + 1.0) /
          col("denom"))).as("ll"),
        first(col("log_prior")).as("log_prior"))
      .withColumn("score", col("ll") + col("log_prior"))
  }
}
