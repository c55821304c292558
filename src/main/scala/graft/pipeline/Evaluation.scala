package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-evaluation operators for curation pipelines: before a
  * quality/language filter is unleashed on 100 TB of corpus, its
  * threshold is chosen from a ROC sweep on held-out labels. Both
  * operators work on BINNED scores (a fixed rounding of the ranking
  * score), which is what makes them scale- and engine-portable:
  *
  *  - the cumulative scan runs over the per-bin aggregate (bounded by
  *    the score range × bin resolution, never by corpus size), so the
  *    one ordered window here touches thousands of rows, not billions;
  *  - counts per bin are exact integers, so cross-engine equality
  *    never rests on float summation order — the only floats are one
  *    final division per output row, identical IEEE ops on any engine.
  */
object Evaluation {

  /** ROC curve of a binary ranking score: one row per distinct score
    * bin (descending = decision thresholds), with cumulative true/false
    * positive counts for the rule "predict positive when score ≥ bin"
    * and the derived rates. `score` is binned by `round(score,
    * binDecimals)` — the resolution of the threshold sweep.
    *
    * Output: (score_bin, tp, fp, tpr, fpr), tpr/fpr round-6.
    *
    * Scale shape: one map-side-combined aggregation to the bin
    * histogram; the ordered cumulative window runs over bins only (its
    * single-partition frame is bounded by bin cardinality — at round-2
    * binning a log-probability score spans a few thousand bins no
    * matter the corpus). */
  def rocCurve(scored: DataFrame, score: Column, truth: Column,
      binDecimals: Int = 2): DataFrame = {
    val bins = scored
      .select(round(score, binDecimals).as("score_bin"),
        truth.cast("boolean").as("__t"))
      .groupBy(col("score_bin"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("__pos"),
        sum(when(col("__t"), 0L).otherwise(1L)).as("__neg"))
    val byScoreDesc = Window.orderBy(col("score_bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    bins
      .withColumn("tp", sum(col("__pos")).over(byScoreDesc))
      .withColumn("fp", sum(col("__neg")).over(byScoreDesc))
      .withColumn("__p", sum(col("__pos")).over(all))
      .withColumn("__n", sum(col("__neg")).over(all))
      .select(col("score_bin"), col("tp"), col("fp"),
        // degenerate truth (all one class): rate over the absent class
        // is 0, not NaN/Inf — same empty-denominator rule as perClassF1
        round(when(col("__p") > 0L,
          col("tp").cast("double") / col("__p")).otherwise(0d), 6)
          .as("tpr"),
        round(when(col("__n") > 0L,
          col("fp").cast("double") / col("__n")).otherwise(0d), 6)
          .as("fpr"))
  }

  /** Precision–recall curve over the same score bins as [[rocCurve]]:
    * (score_bin, tp, fp, precision, recall) — precision = tp/(tp+fp)
    * of the "predict positive when score ≥ bin" rule. Identical scale
    * and determinism story: the window runs on the bin histogram, the
    * only floats are final IEEE divisions. */
  def prCurve(scored: DataFrame, score: Column, truth: Column,
      binDecimals: Int = 2): DataFrame = {
    val bins = scored
      .select(round(score, binDecimals).as("score_bin"),
        truth.cast("boolean").as("__t"))
      .groupBy(col("score_bin"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("__pos"),
        sum(when(col("__t"), 0L).otherwise(1L)).as("__neg"))
    val byScoreDesc = Window.orderBy(col("score_bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    bins
      .withColumn("tp", sum(col("__pos")).over(byScoreDesc))
      .withColumn("fp", sum(col("__neg")).over(byScoreDesc))
      .withColumn("__p", sum(col("__pos")).over(all))
      .select(col("score_bin"), col("tp"), col("fp"),
        // tp+fp ≥ 1 on every cumulative bin row (each bin aggregates
        // ≥ 1 observation), so precision's denominator is never 0
        round(col("tp").cast("double") / (col("tp") + col("fp")), 6)
          .as("precision"),
        round(when(col("__p") > 0L,
          col("tp").cast("double") / col("__p")).otherwise(0d), 6)
          .as("recall"))
  }

  /** Per-class precision/recall/F1 from a [[confusionMatrix]]: exact
    * integer marginals, rates computed UNROUNDED (integer divisions
    * are identical IEEE ops on any engine) and rounded once on output;
    * empty denominators score 0. Output: (cls, tp, t_tot, p_tot,
    * precision, recall, f1). The matrix is class² rows — driver-free,
    * broadcast-sized at any corpus scale. */
  def perClassF1(cm: DataFrame): DataFrame = {
    val tp = cm.where(col("truth") === col("pred"))
      .select(col("truth").as("cls"), col("n").as("tp"))
    val truthTot = cm.groupBy(col("truth").as("cls"))
      .agg(sum(col("n")).as("t_tot"))
    val predTot = cm.groupBy(col("pred").as("cls"))
      .agg(sum(col("n")).as("p_tot"))
    val joined = truthTot
      .join(predTot, Seq("cls"), "full_outer")
      .join(tp, Seq("cls"), "left")
      .na.fill(0L, Seq("tp", "t_tot", "p_tot"))
    val p = when(col("p_tot") > 0L,
      col("tp").cast("double") / col("p_tot")).otherwise(lit(0.0))
    val r = when(col("t_tot") > 0L,
      col("tp").cast("double") / col("t_tot")).otherwise(lit(0.0))
    joined.select(col("cls"), col("tp"), col("t_tot"), col("p_tot"),
      round(p, 6).as("precision"), round(r, 6).as("recall"),
      round(when(p + r > 0.0, lit(2.0) * p * r / (p + r))
        .otherwise(lit(0.0)), 6).as("f1"))
  }

  /** Multi-class confusion matrix: exact (truth, prediction) pair
    * counts — one map-side-combined aggregation, integer-only, the
    * per-class evaluation table behind accuracy/precision/recall.
    * Output: (truth, pred, n). */
  def confusionMatrix(scored: DataFrame, truth: Column, pred: Column)
      : DataFrame =
    scored.groupBy(truth.as("truth"), pred.as("pred"))
      .agg(count(lit(1)).as("n"))

  /** AUC by the Mann–Whitney U statistic over the same score bins:
    * U = Σ_bins pos(b) · (negBelow(b) + neg(b)/2), AUC = U / (P·N) —
    * ties at a bin contribute a half. Every term is an integer or an
    * exact binary half, so the statistic is deterministic down to the
    * final division (round-6). Returns one row: (auc, n_pos, n_neg).
    *
    * Same scale shape as [[rocCurve]]: the window and final fold run
    * over the bin histogram, not the corpus. */
  def aucBinned(scored: DataFrame, score: Column, truth: Column,
      binDecimals: Int = 2): DataFrame = {
    val bins = scored
      .select(round(score, binDecimals).as("score_bin"),
        truth.cast("boolean").as("__t"))
      .groupBy(col("score_bin"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("__pos"),
        sum(when(col("__t"), 0L).otherwise(1L)).as("__neg"))
    val below = Window.orderBy(col("score_bin").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    bins
      .withColumn("__negBelow",
        coalesce(sum(col("__neg")).over(below), lit(0L)))
      // 2U stays integral (the tie term doubles to an integer); the
      // halving folds into the final division
      .agg(
        sum(col("__pos") * (col("__negBelow") * 2L + col("__neg")))
          .as("__u2"),
        sum(col("__pos")).as("n_pos"),
        sum(col("__neg")).as("n_neg"))
      .select(
        // degenerate truth: P·N = 0 means AUC is undefined — score 0
        // (the perClassF1 empty-denominator rule) instead of NaN
        round(when(col("n_pos") * col("n_neg") > 0L,
          col("__u2").cast("double") /
            (col("n_pos") * col("n_neg") * 2L)).otherwise(0d), 6)
          .as("auc"),
        col("n_pos"), col("n_neg"))
  }
}
