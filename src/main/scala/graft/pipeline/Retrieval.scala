package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  // ---- incremental index maintenance (fold batches, never rescan) -------

  /** Accumulator form of the BM25 index: postings plus EXACT integer
    * corpus counts (n_docs, sum_dl) instead of the derived float avgdl.
    * Keeping the moments integral is what makes the fold law exact —
    * `avg` of two batch averages is a float expression whose rounding
    * depends on the batch split, but (Σn, Σdl) adds associatively, so
    * ANY batching folds to the bit-identical index. The same discipline
    * as the PCA/kmeans incremental paths. */
  case class Bm25Acc(postings: DataFrame, counts: DataFrame) {
    /** Derive the servable index: avgdl materializes as ONE float
      * division of exact longs — the identical IEEE op `avg(long)`
      * performs, so acc-served scores match the ad-hoc path. */
    def index: Bm25Index = Bm25Index(postings,
      counts.select(col("n_docs").cast("double").as("n_docs"),
        (col("sum_dl").cast("double") /
          col("n_docs").cast("double")).as("avgdl")))
  }

  /** Build the accumulator for one document batch: one explode + one
    * map-side-combined aggregation (the [[buildBm25Index]] cost), plus
    * a one-row integer count. */
  def buildBm25Acc(df: DataFrame, idCol: Column, textCol: Column)
      : Bm25Acc = {
    val toks = df.select(idCol.as("id"),
        TextAnalysis.tokens(textCol).as("__toks"))
      .select(col("id"), size(col("__toks")).cast("double").as("dl"),
        explode(col("__toks")).as("token"))
    val postings = toks.groupBy(col("token"), col("id"))
      .agg(count(lit(1)).cast("double").as("tf"),
        first(col("dl")).as("dl"))
    val counts = df.select(count(lit(1)).as("n_docs"),
      coalesce(sum(TextAnalysis.tokenCount(textCol)), lit(0L))
        .as("sum_dl"))
    Bm25Acc(postings, counts)
  }

  /** Fold a new batch's accumulator into the standing one. Cost is
    * |batch postings| + |standing postings| union glue — the corpus is
    * NEVER rescanned. Contract: batches partition the corpus by
    * document (a doc id appearing in two batches would carry partial
    * tf/dl rows — the same disjointness every append-only ingest
    * already guarantees). Counts add associatively, so fold order
    * cannot change the served index. */
  def foldBm25Acc(a: Bm25Acc, b: Bm25Acc): Bm25Acc =
    Bm25Acc(a.postings.unionByName(b.postings),
      a.counts.unionByName(b.counts)
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("sum_dl")).as("sum_dl")))

  /** Multi-query scoring from a STANDING index — [[bm25ScoresForQueries]]
    * without re-reading the corpus: the query table's distinct terms
    * semi-join the postings (partition/bucket-prunable on token), df
    * stats recompute on the filtered slice, identical results to the
    * ad-hoc path. */
  def bm25ScoresIndexedForQueries(index: Bm25Index, queries: DataFrame,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val q = queries.toDF("query_id", "token")
      .select(col("query_id"), lower(trim(col("token"))).as("token"))
      .distinct()
    val terms = q.select(col("token")).distinct()
    val tf = index.postings
      .join(broadcast(terms), Seq("token"), "left_semi")
    val dfreq = tf.groupBy(col("token"))
      .agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfreq), "token")
      .join(broadcast(q), "token")
      .crossJoin(broadcast(index.stats))
      .withColumn("__contrib",
        idf(col("n_docs"), col("df")) * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("query_id"), col("id"))
      .agg(round(sum(col("__contrib")), 6).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
  }

  /** Hard-negative mining — the training-pair generator for retrieval
    * models: per query, the `perQuery` HIGHEST-scoring documents that
    * are NOT in the relevance set (lexically confusable yet wrong —
    * exactly what a reranker/bi-encoder needs to learn against).
    * `scores` is (query_id, id, bm25), `relevant` is (query_id,
    * rel_id). One broadcast anti-join + the skew-proof two-phase
    * per-query top-k; returns (query_id, rank, id, bm25). */
  def hardNegatives(scores: DataFrame, relevant: DataFrame,
      perQuery: Int): DataFrame = {
    require(perQuery >= 1, "perQuery must be >= 1")
    val rel = relevant.toDF("query_id", "id")
    val negatives = scores.join(rel, Seq("query_id", "id"), "left_anti")
    Sampling.topKPerGroup(negatives, col("query_id"), col("bm25"),
      col("id").asc, perQuery)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("id"), col("bm25"))
  }

  // ---- ranking evaluation & fusion --------------------------------------

  /** NDCG@k over graded relevance — the ranking-quality readout for
    * retrieval with non-binary labels (MRR only sees the first hit).
    * `scores` is (query_id, id, bm25) — any scored candidate table;
    * `relevance` is (query_id, rel_id, grade >= 0). Returns one row per
    * query: (query_id, dcg, idcg, ndcg).
    *
    * DCG = Σ_{rank<=k} (2^grade - 1) / log2(rank + 1) over the rounded-
    * score total order (score desc, id asc); IDCG ranks the query's own
    * grades descending. Both sums are rounded at 6 before the final
    * division (also round-6), so cross-engine float-summation order
    * cannot flip the compare — the [[Evaluation.aucBinned]] discipline.
    * log2 is computed as ln(x) · (1/ln 2): natural log is the one
    * transcendental this gate has already proven bit-portable across
    * engines (the BM25 idf, the A-ES scores), and the rescale is a
    * single exact IEEE multiply by a shared literal. A query with no
    * positive grade scores ndcg 0, not NaN.
    *
    * Scale shape: ranked top-k is the skew-proof two-phase per-group
    * top-k; the ideal ranking windows over the RELEVANCE table
    * (|judgments| rows, keyed by query — never corpus-sized
    * partitions); both reductions are map-side-combinable sums. */
  def ndcgAtK(scores: DataFrame, relevance: DataFrame, k: Int)
      : DataFrame = {
    require(k >= 1, "k must be >= 1")
    val rel = relevance.toDF("query_id", "rel_id", "grade")
    val ranked = Sampling.topKPerGroup(scores, col("query_id"),
      col("bm25"), col("id").asc, k)
      .select(col("query_id"), col("id").as("rel_id"),
        col("rank").cast("double").as("__r"))
    val ln2 = lit(0.6931471805599453) // ln 2: gain/ln(x) · ln2 = gain/log2(x)
    val gain = (pow(lit(2.0), col("grade").cast("double")) - lit(1.0)) /
      log(col("__r") + lit(1.0))
    val dcg = rel.join(ranked, Seq("query_id", "rel_id"))
      .groupBy(col("query_id"))
      .agg(round(sum(gain) * ln2, 6).as("dcg"))
    val byGrade = Window.partitionBy(col("query_id"))
      .orderBy(col("grade").desc, col("rel_id").asc)
    val idcg = rel
      .withColumn("__r", row_number().over(byGrade).cast("double"))
      .where(col("__r") <= k)
      .groupBy(col("query_id"))
      .agg(round(sum(gain) * ln2, 6).as("idcg"))
    idcg.join(dcg, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("dcg"), lit(0.0)).as("dcg"), col("idcg"),
        round(when(col("idcg") > 0.0,
          coalesce(col("dcg"), lit(0.0)) / col("idcg"))
          .otherwise(lit(0.0)), 6).as("ndcg"))
  }

  /** Reciprocal-rank fusion of any number of per-query rankings — the
    * standard lexical+dense hybrid-retrieval combiner (Cormack et al.):
    * fused(d) = Σ_lists 1 / (k0 + rank_list(d)), documents missing from
    * a list contribute nothing. Each input is (query_id, id, rank).
    * Returns (query_id, rank, id, rrf, n_lists) — the fused top-k per
    * query, rank 1 best, ties broken by id.
    *
    * Scale shape: one union of the ranking tables (each already top-k
    * sized, |queries| × k rows — NOT corpus-sized), one map-side-
    * combinable aggregation, then the two-phase per-group top-k. The
    * only floats are the 1/(k0+rank) reciprocals of small integers —
    * identical IEEE divisions on any engine — summed over ≤ |lists|
    * terms and rounded at 9. */
  def rrfFuse(rankings: Seq[DataFrame], topK: Int, k0: Int = 60)
      : DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k0 >= 1 && topK >= 1, "k0 and topK must be >= 1")
    val u = rankings
      .map(_.select(col("query_id"), col("id"),
        col("rank").cast("double").as("__r")))
      .reduce(_ unionByName _)
    val scored = u.groupBy(col("query_id"), col("id"))
      .agg(round(sum(lit(1.0) / (lit(k0.toDouble) + col("__r"))), 9)
          .as("rrf"),
        count(lit(1)).as("n_lists"))
    Sampling.topKPerGroup(scored, col("query_id"), col("rrf"),
      col("id").asc, topK)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("id"), col("rrf"), col("n_lists"))
  }
}
