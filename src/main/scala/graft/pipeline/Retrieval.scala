package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword retrieval over a document corpus: BM25 scoring and top-k —
  * the data-selection / decontamination-retrieval primitive of a
  * training-data pipeline ("find the k documents most relevant to this
  * probe").
  *
  * Scale shape: the query-term filter lands BEFORE the shuffle — after
  * the token explode only rows whose token is one of the |q| query
  * terms survive, so the (doc, term) aggregation shuffles a set
  * proportional to term postings, not corpus tokens. Per-doc length is
  * carried THROUGH the explode (computed once pre-explode), so no join
  * back to a doc-length table is needed. Document frequencies are |q|
  * rows — broadcast. Corpus N/avgdl is one row — broadcast nested loop.
  * Top-k is `orderBy(...).limit(k)` = TakeOrderedAndProject: a per-
  * partition heap plus a driver merge of P×k rows, never a global sort.
  */
object Retrieval {

  /** Okapi BM25 idf with the +1 floor (Lucene form, always positive):
    * ln(1 + (N - df + 0.5) / (df + 0.5)). */
  private def idf(n: Column, df: Column): Column =
    log(lit(1.0) + (n - df + lit(0.5)) / (df + lit(0.5)))

  /** Per-document BM25 scores against `queryTerms`, one row per doc
    * that matches at least one term: (id, bm25, n_terms_hit).
    *
    * Tokenization is the engine-wide rule (`TextAnalysis.tokens`:
    * lowercase, trim, split on whitespace) so retrieval and the rest of
    * the text stack can never disagree on term boundaries.
    */
  def bm25Scores(df: DataFrame, idCol: Column, textCol: Column,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75)
      : DataFrame = {
    val terms = queryTerms.map(_.toLowerCase.trim).distinct
    val toks = df.select(idCol.as("id"),
        TextAnalysis.tokens(textCol).as("__toks"))
      .select(col("id"), size(col("__toks")).cast("double").as("dl"),
        explode(col("__toks")).as("token"))
    // corpus stats: one row (count + mean doc length over ALL docs)
    val stats = df.select(
      count(lit(1)).cast("double").as("n_docs"),
      avg(TextAnalysis.tokenCount(textCol)).as("avgdl"))
    // postings for query terms only — the filter precedes the shuffle
    val tf = toks.where(col("token").isin(terms: _*))
      .groupBy(col("id"), col("token"))
      .agg(count(lit(1)).cast("double").as("tf"),
        first(col("dl")).as("dl"))
    // document frequency per query term: ≤ |q| rows, broadcast back
    val dfreq = tf.groupBy(col("token"))
      .agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfreq), "token")
      .crossJoin(broadcast(stats))
      .withColumn("__contrib",
        idf(col("n_docs"), col("df")) * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("id"))
      .agg(round(sum(col("__contrib")), 6).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
  }

  /** Multi-query BM25: scores for a whole query TABLE in one pass —
    * the shape of retrieval evaluation and of any query-log replay.
    * `queries` is (query_id, token) rows (distinct within a query);
    * returns (query_id, id, bm25, n_terms_hit).
    *
    * Plan: the distinct term set (broadcast) filters the postings
    * BEFORE their shuffle — the corpus is tokenized once regardless of
    * query count; per-term document frequencies are global (scored
    * identically for every query) and broadcast back; the query table
    * joins the filtered postings by token, so cost is
    * Σ_term |postings(term)| · |queries sharing term|, never
    * |corpus| × |queries|. */
  def bm25ScoresForQueries(df: DataFrame, idCol: Column, textCol: Column,
      queries: DataFrame, k1: Double = 1.2, b: Double = 0.75)
      : DataFrame = {
    val q = queries.toDF("query_id", "token")
      .select(col("query_id"), lower(trim(col("token"))).as("token"))
      .distinct()
    val terms = q.select(col("token")).distinct()
    val toks = df.select(idCol.as("id"),
        TextAnalysis.tokens(textCol).as("__toks"))
      .select(col("id"), size(col("__toks")).cast("double").as("dl"),
        explode(col("__toks")).as("token"))
    val stats = df.select(
      count(lit(1)).cast("double").as("n_docs"),
      avg(TextAnalysis.tokenCount(textCol)).as("avgdl"))
    val tf = toks.join(broadcast(terms), Seq("token"), "left_semi")
      .groupBy(col("id"), col("token"))
      .agg(count(lit(1)).cast("double").as("tf"),
        first(col("dl")).as("dl"))
    val dfreq = tf.groupBy(col("token"))
      .agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfreq), "token")
      .join(broadcast(q), "token")
      .crossJoin(broadcast(stats))
      .withColumn("__contrib",
        idf(col("n_docs"), col("df")) * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("query_id"), col("id"))
      .agg(round(sum(col("__contrib")), 6).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
  }

  /** Mean-reciprocal-rank readout per query: where does each query's
    * known-relevant document land in the BM25 ranking? Returns
    * (query_id, rel_rank, rr_ppm) with rel_rank = 0 / rr_ppm = 0 when
    * the relevant doc misses the top-k — the ranking-quality
    * counterpart of the classifier's ROC/PR family and the dedup
    * harness's precision/recall. Integer ppm (10⁶ div rank) keeps the
    * metric engine-exact; ranking order is (bm25 desc, id asc) over
    * the ROUNDED scores, the same total order both engines rank.
    * Rank selection is the skew-proof two-phase top-k per query. */
  def mrrAtK(scores: DataFrame, relevant: DataFrame, k: Int)
      : DataFrame = {
    require(k >= 1, "k must be >= 1")
    val ranked = Sampling.topKPerGroup(scores, col("query_id"),
      col("bm25"), col("id").asc, k)
    val rel = relevant.toDF("query_id", "rel_id")
    rel.join(ranked.select(col("query_id"), col("id").as("rel_id"),
          col("rank").cast("long").as("rel_rank")),
        Seq("query_id", "rel_id"), "left")
      .select(col("query_id"),
        coalesce(col("rel_rank"), lit(0L)).as("rel_rank"),
        when(col("rel_rank").isNotNull,
          expr("1000000 div rel_rank")).otherwise(0L).as("rr_ppm"))
  }

  /** Top-k BM25 retrieval: highest-scoring k docs, score-desc then
    * id-asc for a deterministic total order. */
  def bm25TopK(df: DataFrame, idCol: Column, textCol: Column,
      queryTerms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame =
    bm25Scores(df, idCol, textCol, queryTerms, k1, b)
      .orderBy(col("bm25").desc, col("id"))
      .limit(k)

  // ---- standing inverted index (build once, query many) ----------------

  /** A materialized BM25 index: tokenize the 100 TB corpus ONCE, then
    * serve any number of probes from the postings without touching the
    * text again. `postings` is (token, id, tf, dl) — write it
    * partitioned/bucketed BY TOKEN so a probe prunes to its terms'
    * buckets; `stats` is the one-row (n_docs, avgdl). */
  case class Bm25Index(postings: DataFrame, stats: DataFrame)

  /** Build the standing index: one explode + one map-side-combined
    * aggregation over the corpus (same cost as a single ad-hoc query,
    * amortized over every probe after). */
  def buildBm25Index(df: DataFrame, idCol: Column, textCol: Column)
      : Bm25Index = {
    val toks = df.select(idCol.as("id"),
        TextAnalysis.tokens(textCol).as("__toks"))
      .select(col("id"), size(col("__toks")).cast("double").as("dl"),
        explode(col("__toks")).as("token"))
    val postings = toks.groupBy(col("token"), col("id"))
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
    val stats = df.select(count(lit(1)).cast("double").as("n_docs"),
      avg(TextAnalysis.tokenCount(textCol)).as("avgdl"))
    Bm25Index(postings, stats)
  }

  /** BM25 scores served from a standing [[buildBm25Index]]: an
    * `isin(terms)` filter on the postings (partition/bucket-prunable on
    * the token column) + the same broadcast df/stats joins — the corpus
    * text is never re-read. Identical results to [[bm25Scores]]. */
  def bm25ScoresIndexed(index: Bm25Index, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = queryTerms.map(_.toLowerCase.trim).distinct
    val tf = index.postings.where(col("token").isin(terms: _*))
    val dfreq = tf.groupBy(col("token"))
      .agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfreq), "token")
      .crossJoin(broadcast(index.stats))
      .withColumn("__contrib",
        idf(col("n_docs"), col("df")) * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("id"))
      .agg(round(sum(col("__contrib")), 6).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
  }

  /** Top-k over the standing index. */
  def bm25TopKIndexed(index: Bm25Index, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25ScoresIndexed(index, queryTerms, k1, b)
      .orderBy(col("bm25").desc, col("id"))
      .limit(k)
}
