package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training + encoding — the canonical
  * pre-training-corpus job (learn a subword vocabulary from the data,
  * then tokenize the data with it).
  *
  * Scale shape: the corpus is touched ONCE (word-frequency shuffle);
  * every merge round then runs over the distinct-WORD table, which is
  * vocabulary-sized (Heaps' law: ~√N types for N tokens), not
  * corpus-sized — at 100 TB the word table is gigabytes, and each round
  * is a small groupBy + a 1-row argmax to the driver (the sequential
  * driver round-trips are inherent to BPE's greedy definition, and they
  * iterate over the small table). Encoding is a pure map stage with the
  * learned merge ranks broadcast in the UDF closure.
  *
  * Determinism: pair-frequency ties break lexicographically on (left,
  * right), so the learned merge list is identical on any engine and any
  * partitioning.
  */
object Tokenizer {

  /** Word-frequency table of a corpus: lowercased, whitespace-split —
    * the same tokenization convention as the corpus_vocab oracle. One
    * shuffle with map-side combine. */
  def wordCounts(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(split(lower(trim(text)), "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("f"))

  /** Weighted adjacent-symbol-pair counts over a (syms, f) word table —
    * one round's merge candidates. Declarative slice+zip, no UDF. */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("f"), explode(zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (x, y) => struct(x.as("l"), y.as("r")))).as("pr"))
      .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
      .agg(sum(col("f")).as("pf"))

  private val mergeOnce = udf(
    (syms: Seq[String], a: String, b: String) => {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toSeq
    })

  /** Learn `numMerges` BPE merge rules from a corpus. Returns the
    * ordered rule list — rule k was the most frequent adjacent symbol
    * pair (weighted by word frequency) after rules 0..k-1 were applied,
    * ties broken lexicographically. Stops early when no pair remains.
    *
    * Each round: pair-count groupBy over the word table (map-side
    * combine), `limit(1)` argmax (ONE row to the driver), then a narrow
    * map applying the merge. The word table is re-persisted per round
    * and the predecessor unpersisted, so lineage stays one round deep. */
  def trainBpe(docs: DataFrame, text: Column, numMerges: Int)
      : Seq[(String, String)] = {
    require(numMerges > 0, "numMerges must be positive")
    // per-round state is materialized AND lineage-truncated
    // (localCheckpoint): plain persist keeps the logical plan, which
    // compounds across rounds until planning itself OOMs — same
    // discipline as Dedup.duplicateClusters' label-propagation loop
    var words = wordCounts(docs, text)
      .select(split(col("word"), "").as("syms"), col("f"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(desc("pf"), col("l"), col("r")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val next = words
          .withColumn("syms", mergeOnce(col("syms"), lit(a), lit(b)))
          .localCheckpoint(true)
        // checkpoint blocks release through the RDD (Lineage), not
        // Dataset.unpersist (a no-op for checkpoints)
        graft.util.Lineage.release(words)
        words = next
      }
    }
    graft.util.Lineage.release(words)
    merges.toSeq
  }

  /** Tokenize text with a learned merge list: per word, repeatedly
    * merge the adjacent pair with the best (lowest-index) rank until no
    * learned pair remains — the standard rank-greedy BPE encoder.
    * Returns the token array for the whole text (words concatenated in
    * order). Pure map stage; the rank table rides the UDF closure
    * (vocabulary-sized, broadcast with the task binary). */
  def encodeBpe(text: Column, merges: Seq[(String, String)]): Column = {
    val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val enc = udf((t: String) => {
      if (t == null) null
      else t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        .flatMap { w =>
          var syms = w.split("").toVector
          var done = false
          while (!done && syms.length > 1) {
            var bestRank = Int.MaxValue
            var bestIdx = -1
            var i = 0
            while (i < syms.length - 1) {
              val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
              if (r < bestRank) { bestRank = r; bestIdx = i }
              i += 1
            }
            if (bestIdx < 0) done = true
            else {
              // merge every occurrence of the best-ranked pair, left
              // to right (mirrors the training round's application)
              val a = syms(bestIdx)
              val b = syms(bestIdx + 1)
              val out = Vector.newBuilder[String]
              var j = 0
              while (j < syms.length) {
                if (j < syms.length - 1 && syms(j) == a &&
                    syms(j + 1) == b) {
                  out += (a + b); j += 2
                } else { out += syms(j); j += 1 }
              }
              syms = out.result()
            }
          }
          syms
        }
    })
    enc(text)
  }
}
