package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus clustering over the embedding column: fixed-point (integer-
  * quantized) Lloyd's k-means — the grouping primitive behind
  * cluster-balanced sampling, domain discovery, and SemDeDup-style
  * per-cluster near-dup pruning in large-scale training-data curation.
  *
  * Why FIXED-POINT: a float k-means is not reproducible under
  * distribution — centroid means are float sums whose value depends on
  * partition count and reduce order, so a retried stage or a different
  * cluster size can flip an argmin and relabel points. Here every
  * vector is quantized once to integers (`round(x·scale)`, half away
  * from zero), distances and centroid sums are EXACT integer
  * arithmetic (order-free), and the only division per update is one
  * IEEE double division of two exact integers — bit-identical on any
  * engine, partitioning, or retry. The quantization error is bounded
  * by d·(1/scale)² per squared distance, far below cluster geometry at
  * scale = 1e6. The same discipline as [[Ann.int8Codes]], applied to
  * the clustering loop itself.
  *
  * Scale shape: per iteration ONE mapPartitions (assignment against a
  * broadcast k×d integer matrix — straight-line long arithmetic) and
  * ONE reduceByKey over k keys (map-side combine makes the shuffle k
  * rows per partition). The driver only ever holds the k×d centroid
  * matrix. No lineage growth: each iteration's model is a collected
  * array, not a chained plan.
  */
object Clustering {

  /** Quantized k-means model: k centroids in fixed-point integer
    * coordinates (row-major k×d), plus the scale that maps them back
    * to floats (`centroid / scale`). */
  final case class QKMeansModel(centroids: Array[Array[Long]],
      scale: Double) {
    def k: Int = centroids.length
    def d: Int = if (centroids.isEmpty) 0 else centroids(0).length
  }

  /** Half-away-from-zero fixed-point quantization — matches both
    * Spark's `round` (BigDecimal HALF_UP) and DuckDB's `round`, so an
    * oracle can restate it portably. Implemented via the EXACT
    * fractional part (`v - floor(v)` is exact for |v| < 2^52) rather
    * than `floor(v + 0.5)`, whose IEEE addition can cross an integer
    * when v sits within one ulp of a half boundary — the one way two
    * correct half-away `round`s could still disagree. */
  private def quant(x: Double, scale: Double): Long = {
    val v = x * scale
    val f = math.floor(v)
    val frac = v - f
    val r =
      if (frac > 0.5) f + 1
      else if (frac < 0.5) f
      else if (v >= 0) f + 1
      else f
    r.toLong
  }

  private def quantized(corpus: DataFrame, scale: Double)
      : Dataset[(Long, Array[Long])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.toDF("id", "vec")
      .select(col("id").cast("long"), col("vec").cast("array<double>"))
      .as[(Long, Array[Double])]
      .map { case (id, v) => (id, v.map(quant(_, scale))) }
  }

  /** Exact squared L2 distance in fixed-point coordinates. Magnitudes:
    * |q| ≤ max|x|·scale, so d·(2·max|x|·scale)² must stay under 2^63 —
    * unit-norm-ish embeddings at scale 1e6 and d ≤ 1000 leave four
    * orders of margin. */
  private def dist2(v: Array[Long], c: Array[Long]): Long = {
    var s = 0L
    var i = 0
    val d = math.min(v.length, c.length)
    while (i < d) { val t = v(i) - c(i); s += t * t; i += 1 }
    s
  }

  /** Index of the nearest centroid; ties go to the LOWEST index
    * (strict `<` while scanning ascending) — the deterministic tie rule
    * an oracle can restate as `ORDER BY d2, j`. */
  private def nearest(cents: Array[Array[Long]], v: Array[Long]): Int = {
    var best = 0
    var bestD = dist2(v, cents(0))
    var j = 1
    while (j < cents.length) {
      val dj = dist2(v, cents(j))
      if (dj < bestD) { best = j; bestD = dj }
      j += 1
    }
    best
  }

  /** Train `iterations` rounds of quantized Lloyd's k-means.
    *
    * Deterministic end-to-end: seeds are the first k vectors (in id
    * order) whose `id % max(n/k, 1) == 0` — an id-ordered systematic
    * sample, the same rule as [[Ann.trainIvf]]; assignment ties break
    * on the lowest centroid index; the centroid update
    * `round(Σq / count)` divides two EXACT integers (centroid sums are
    * integer adds, immune to reduce order), so the updated model is
    * bit-identical however the data is partitioned. Empty cells keep
    * their previous centroid. */
  /** One round's EXACT integer sufficient statistics for a batch under
    * fixed centroids: per cell, (Σ quantized vectors, count). Integer
    * adds are order-free AND associative across batches, so round sums
    * fold exactly ([[foldRoundSums]]) — the merge law incremental /
    * streaming k-means training rests on. Driver-side size is k×d. */
  def roundSums(batch: DataFrame, model: QKMeansModel)
      : Map[Int, (Array[Long], Long)] = {
    val cur = model.centroids
    quantized(batch, model.scale).rdd.mapPartitions { it =>
      it.map { case (_, v) => (nearest(cur, v), (v, 1L)) }
    }.reduceByKey { (a, b) =>
      val m = a._1.clone()
      var i = 0
      while (i < m.length && i < b._1.length) { m(i) += b._1(i); i += 1 }
      (m, a._2 + b._2)
    }.collect().toMap
  }

  /** Fold two rounds' sufficient statistics — exact, associative,
    * commutative (integer adds), so ANY batch split folds to the
    * one-shot statistics. */
  def foldRoundSums(a: Map[Int, (Array[Long], Long)],
      b: Map[Int, (Array[Long], Long)]): Map[Int, (Array[Long], Long)] =
    (a.keySet ++ b.keySet).map { cell =>
      (a.get(cell), b.get(cell)) match {
        case (Some(x), None) => cell -> x
        case (None, Some(y)) => cell -> y
        case (Some((xs, xc)), Some((ys, yc))) =>
          val m = xs.clone()
          var i = 0
          while (i < m.length && i < ys.length) { m(i) += ys(i); i += 1 }
          cell -> ((m, xc + yc))
        case (None, None) => throw new IllegalStateException("unreachable")
      }
    }.toMap

  /** Apply one centroid update from folded round statistics: the same
    * `round(Σq / count)` rule as the one-shot fit (one double division
    * of two exact integers — engine-portable); empty cells keep their
    * previous centroid. */
  def updatedModel(model: QKMeansModel,
      sums: Map[Int, (Array[Long], Long)]): QKMeansModel = {
    val next = model.centroids.map(_.clone())
    sums.foreach { case (cell, (s, cnt)) =>
      next(cell) = s.map(x => quant(x.toDouble / cnt, 1.0))
    }
    QKMeansModel(next, model.scale)
  }

  /** Systematic seed model over the full corpus (the deterministic
    * id-ordered stride rule; see [[fitQuantizedKMeans]]). */
  def seedModel(corpus: DataFrame, k: Int, scale: Double = 1e6)
      : QKMeansModel = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = quantized(corpus, scale)
    val n = base.count()
    require(n >= k, s"need at least k=$k vectors, got $n")
    val stride = math.max(n / k, 1L)
    val seeds = base.filter(_._1 % stride == 0).sort("_1")
      .map(_._2)(org.apache.spark.sql.Encoders.kryo[Array[Long]])
      .take(k)
    require(seeds.length == k,
      s"systematic seed sample found ${seeds.length} of $k seeds " +
        "(ids too sparse for stride-based seeding)")
    QKMeansModel(seeds, scale)
  }

  def fitQuantizedKMeans(corpus: DataFrame, k: Int, iterations: Int,
      scale: Double = 1e6): QKMeansModel = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = quantized(corpus, scale)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = base.count()
      require(n >= k, s"need at least k=$k vectors, got $n")
      val stride = math.max(n / k, 1L)
      val seeds = base.filter(_._1 % stride == 0).sort("_1")
        .map(_._2).take(k)
      require(seeds.length == k,
        s"systematic seed sample found ${seeds.length} of $k seeds " +
          "(ids too sparse for stride-based seeding)")
      var cents = seeds
      (0 until iterations).foreach { _ =>
        val cur = cents
        // exact integer partial sums per cell; k keys → the shuffle is
        // k rows per partition after map-side combine
        val sums = base.rdd.mapPartitions { it =>
          it.map { case (_, v) => (nearest(cur, v), (v, 1L)) }
        }.reduceByKey { (a, b) =>
          val m = a._1.clone()
          var i = 0
          while (i < m.length && i < b._1.length) { m(i) += b._1(i); i += 1 }
          (m, a._2 + b._2)
        }.collect()
        val next = cur.map(_.clone())
        sums.foreach { case (cell, (s, cnt)) =>
          // one double division of two exact integers (|Σq| < 2^53 for
          // any corpus this fits on a driver-collected k×d update),
          // rounded half away from zero — engine-portable
          next(cell) = s.map(x => quant(x.toDouble / cnt, 1.0))
        }
        cents = next
      }
      QKMeansModel(cents, scale)
    } finally base.unpersist()
  }

  /** Assign every vector to its nearest centroid under `model`:
    * `(id, cluster, d2)` with the EXACT integer squared distance —
    * a pure map against the broadcast k×d matrix, scan-bound. */
  def assign(corpus: DataFrame, model: QKMeansModel): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = model.centroids
    quantized(corpus, model.scale)
      .map { case (id, v) =>
        val j = nearest(cents, v)
        (id, j, dist2(v, cents(j)))
      }
      .toDF("id", "cluster", "d2")
  }

  /** Fit-and-assign convenience: `iterations` update rounds, then one
    * final assignment under the trained model. */
  def kMeansAssign(corpus: DataFrame, k: Int, iterations: Int,
      scale: Double = 1e6): DataFrame =
    assign(corpus, fitQuantizedKMeans(corpus, k, iterations, scale))

  /** Per-cluster diagnostics from an [[assign]] output: member count
    * and inertia (Σ d2 — EXACT, the distances are integers). The elbow
    * / balance readout for choosing k; one k-key aggregation with
    * map-side combine. */
  def clusterStats(assigned: DataFrame): DataFrame =
    assigned.groupBy("cluster")
      .agg(count(lit(1)).as("n"), sum("d2").as("inertia"))

  /** Distinctive top terms per cluster — the "what is this cluster
    * about" readout after clustering a corpus: for every (cluster,
    * token), the integer lift of the token's in-cluster rate over its
    * corpus rate, in parts-per-million
    * (`tf_c·T_total·10⁶ div (T_c·tf_total)` — ×1e6 BEFORE the floor
    * division, no float anywhere), then the `topK` highest-lift terms
    * per cluster (ties by token asc).
    *
    * Scale shape: one doc-level broadcast-able join (cluster table is
    * one row per doc id), one explode, ONE map-side-combined
    * (cluster, token) count — every other table ((cluster), (token),
    * grand total) derives from that count table, so the corpus is
    * tokenized exactly once. Selection is the skew-proof two-phase
    * top-k. Intermediate `tf_c·T_total·10⁶` stays under 2⁶³ for
    * corpora to ~10¹² tokens per the worst token — beyond that, drop
    * the scale to 10³.
    *
    * `assigned` is an [[assign]] output (id, cluster, …). */
  def clusterTopTerms(assigned: DataFrame, docs: DataFrame,
      idCol: Column, textCol: Column, topK: Int = 5): DataFrame = {
    val tok = docs.select(idCol.as("id"), textCol.as("__text"))
      .join(assigned.select(col("id"), col("cluster")), "id")
      .select(col("cluster"),
        explode(TextAnalysis.tokens(col("__text"))).as("token"))
    val ct = tok.groupBy("cluster", "token")
      .agg(count(lit(1)).as("tf_c"))
    val ctot = ct.groupBy("cluster").agg(sum("tf_c").as("t_c"))
    val gt = ct.groupBy("token").agg(sum("tf_c").as("tf_all"))
    val scored = ct
      .join(broadcast(ctot), "cluster")
      .join(gt, "token")
      .crossJoin(broadcast(gt.agg(sum("tf_all").as("t_all"))))
      .select(col("cluster"), col("token"), col("tf_c"),
        expr("tf_c * t_all * 1000000 div (t_c * tf_all)")
          .as("lift_ppm"))
    Sampling.topKPerGroup(scored, col("cluster"), col("lift_ppm"),
        col("token").asc, topK)
      .select("cluster", "token", "tf_c", "lift_ppm", "rank")
  }

  /** Cluster-balanced subset: at most `quota` rows per cluster, chosen
    * by the deterministic row hash (so the subset is reproducible and
    * unbiased within each cluster) — the standard counter to majority-
    * domain dominance after clustering a mixed corpus. Two-phase
    * broadcast-prefix selection, no one-task global window. */
  def clusterBalancedSample(assigned: DataFrame, quota: Int): DataFrame =
    Sampling.quotaSample(assigned, col("cluster"), col("id"), quota)

  /** IVF recall@k evaluation with BOTH sides under the cross-engine
    * oracle — the ANN counterpart of [[Dedup.lshCandidateEval]]'s
    * "measure your approximation before trusting it" harness. Clusters
    * with the QUANTIZED (integer-exact, engine-portable) k-means, probes
    * each query's `nprobe` nearest cells, ranks candidates by exact
    * cosine, and scores recall against brute-force truth. Because cell
    * assignment, probe selection (exact integer d2, ties to the lower
    * cell), and both rankings (round-6 cosine, id tiebreak) are all
    * deterministic AND SQL-restatable, even the APPROXIMATE side is
    * under the oracle — run at a pilot SF to size (kCells, nprobe)
    * before committing a 100 TB ANN pass. Returns ONE row:
    * (n_queries, n_truth, n_hits, recall_ppm).
    *
    * `corpus` and `queries` are (id, vec) tables, queries ⊆ corpus
    * id-space (self-matches excluded on both sides). */
  def ivfRecallEval(corpus: DataFrame, queries: DataFrame, k: Int,
      nprobe: Int, kCells: Int = 8, iterations: Int = 2): DataFrame = {
    require(k >= 1 && nprobe >= 1 && nprobe <= kCells,
      "need 1 <= nprobe <= kCells and k >= 1")
    val spark = corpus.sparkSession
    import spark.implicits._
    val model = fitQuantizedKMeans(corpus, kCells, iterations)
    val assigned = assign(corpus, model)
      .select(col("id").as("cid"), col("cluster"))
    val cents = model.centroids
    // per-query exact integer distance to EVERY centroid → top-nprobe
    // cells (d2 asc, cell asc — the oracle's ORDER BY)
    val qCells = quantized(queries, model.scale)
      .flatMap { case (id, v) =>
        cents.iterator.zipWithIndex
          .map { case (c, j) => (id, j, dist2(v, c)) }
      }
      .toDF("query_id", "cluster", "__qd2")
    val probe = Sampling.topKPerGroup(
      qCells.withColumn("__neg", -col("__qd2")),
      col("query_id"), col("__neg"), col("cluster").asc, nprobe)
      .select(col("query_id"), col("cluster"))
    val cand = probe.join(assigned, "cluster")
      .where(col("cid") =!= col("query_id"))
      .select("query_id", "cid")
    val vecs = corpus.toDF("id", "vec")
    val scored = cand
      .join(vecs.toDF("cid", "__vc"), "cid")
      .join(broadcast(vecs.toDF("query_id", "__vq")), "query_id")
      .withColumn("__sim", round(Ann.cosine(Ann.toDouble(col("__vc")),
        Ann.toDouble(col("__vq"))), 6))
    val ivf = Sampling.topKPerGroup(scored, col("query_id"),
      col("__sim"), col("cid").asc, k)
      .select(col("query_id"), col("cid").as("id"))
    val truth = Ann.bruteForceTopK(corpus, queries, k)
      .select(col("query_id"), col("id"))
    truth.join(ivf.withColumn("__hit", lit(1L)),
        Seq("query_id", "id"), "left")
      .agg(countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("n_truth"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_hits"))
      .select(col("n_queries"), col("n_truth"), col("n_hits"),
        expr("n_hits * 1000000 div n_truth").as("recall_ppm"))
  }
}
