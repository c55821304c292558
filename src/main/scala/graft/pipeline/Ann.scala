package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * [[bruteForceTopK]] is the exact baseline (broadcast the query set,
  * one scan over the corpus — correct at any corpus size as long as the
  * QUERY set is broadcastable). [[lshTopK]] and [[cosineNearDuplicates]]
  * are the scale paths: random-hyperplane signatures bucket the corpus
  * so candidate generation is an equi-join on (table, signature), never
  * an all-pairs product.
  */
object Ann {

  /** Dot product of two double-array columns (sequential fold — exact
    * same summation order on every engine/partition). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** L2-normalized copy of a vector column (unit length; zero vectors →
    * NULL). Native codegen'd kernel — one O(d) pass per row; an
    * `aggregate` norm inlined into a per-element `transform` lambda
    * would re-fold the whole vector per element (O(d²), interpreted).
    * Map stage at any scale. */
  def normalize(a: Column): Column =
    graft.expressions.native.l2normalize(a)

  /** Reference Column-fold formulation of [[normalize]] (kept for
    * cross-validation of the native kernel). */
  private[graft] def normalizeHof(a: Column): Column = {
    val d = toDouble(a)
    val n = norm(d)
    when(n > 0.0, transform(d, x => x / n))
      .otherwise(lit(null))
  }

  /** Cosine similarity with zero-norm guard (NULL when either side has
    * zero magnitude). Native codegen'd kernel
    * ([[graft.expressions.CosineSimExpr]]) with the same sequential
    * accumulation order as the Column fold — bit-identical doubles, an
    * order of magnitude faster on candidate-verification joins. */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.native.cosine(a, b)

  /** Reference Column-fold formulation of [[cosine]] (kept for
    * cross-validation of the native kernel). */
  private[graft] def cosineHof(a: Column, b: Column): Column = {
    val na = norm(a)
    val nb = norm(b)
    when(na > 0.0 && nb > 0.0, dot(a, b) / (na * nb))
  }

  /** Exact top-k cosine neighbors for each query vector.
    * `queries(query_id, query_vec)` is broadcast; the corpus
    * `(id, vec)` streams through one scan + per-query top-k
    * (rank window partitioned by query). Ranking is on cosine rounded
    * to 1e-6 with id tie-break — fully deterministic. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int)
      : DataFrame = {
    val scored = corpus.toDF("id", "vec")
      .crossJoin(broadcast(queries.toDF("query_id", "query_vec")))
      .where(col("id") =!= col("query_id"))
      .withColumn("sim",
        round(cosine(toDouble(col("vec")), toDouble(col("query_vec"))), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "id", "sim")
  }

  /** Deterministic random hyperplanes: `tables × planes` unit-free
    * normal vectors of dimension `dim`, seeded. */
  private def hyperplanes(dim: Int, planes: Int, tables: Int)
      : Seq[(Int, Seq[Seq[Double]])] = {
    val rnd = new scala.util.Random(7)
    (0 until tables).map { t =>
      (t, Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian())))
    }
  }

  /** (id, table, signature) — sign-bit signature of each vector under
    * each table's hyperplanes. The projection kernel runs as a typed
    * mapPartitions JVM loop (tables × planes × dim multiply-adds per
    * vector — a numeric kernel where interpreted Column folds would
    * dominate; the planes array is built once per partition). */
  def lshSignatures(df: DataFrame, idCol: Column, vecCol: Column,
      dim: Int, planes: Int = 8, tables: Int = 24): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val planeArr: Array[Array[Array[Double]]] =
      hyperplanes(dim, planes, tables)
        .map(_._2.map(_.toArray).toArray).toArray
    df.select(idCol.cast("long").as("id"),
        toDouble(vecCol).as("v"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        it.flatMap { case (id, v) =>
          planeArr.iterator.zipWithIndex.map { case (table, t) =>
            var sig = 0L
            var p = 0
            while (p < table.length) {
              val plane = table(p)
              var s = 0.0
              var i = 0
              val n = math.min(plane.length, v.length)
              while (i < n) { s += plane(i) * v(i); i += 1 }
              if (s > 0.0) sig |= (1L << p)
              p += 1
            }
            (id, t, sig)
          }
        }
      }
      .toDF("id", "table", "signature")
  }

  /** Bucketed approximate top-k: candidates share at least one
    * (table, signature) bucket with the query, then exact cosine
    * re-ranking. Recall rises with `tables`; candidate volume with
    * fewer `planes`. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      planes: Int = 8, tables: Int = 24): DataFrame = {
    val c = corpus.toDF("id", "vec")
    val q = queries.toDF("query_id", "query_vec")
    val cSig = lshSignatures(c, col("id"), col("vec"), dim, planes, tables)
    val qSig = lshSignatures(q, col("query_id"), col("query_vec"), dim,
      planes, tables).toDF("query_id", "table", "signature")
    val candidates = cSig.join(qSig, Seq("table", "signature"))
      .where(col("id") =!= col("query_id"))
      .select("query_id", "id").distinct()
    val scored = candidates
      .join(c, "id").join(q, "query_id")
      .withColumn("sim",
        round(cosine(toDouble(col("vec")), toDouble(col("query_vec"))), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "id", "sim")
  }

  // ---- IVF (inverted-file) index --------------------------------------

  /** Trained IVF model: k centroid vectors (tiny — ships as a literal /
    * closure to executors). */
  final case class IvfModel(centroids: Array[Array[Double]]) {
    def nCells: Int = centroids.length
  }

  private def nearestCells(model: IvfModel, v: Array[Double], n: Int)
      : Seq[Int] = {
    val scored = model.centroids.zipWithIndex.map { case (c, i) =>
      var s = 0.0; var cn = 0.0; var vn = 0.0
      var j = 0
      val d = math.min(c.length, v.length)
      while (j < d) { s += c(j) * v(j); cn += c(j) * c(j); vn += v(j) * v(j); j += 1 }
      val denom = math.sqrt(cn) * math.sqrt(vn)
      (if (denom > 0) s / denom else -1.0, i)
    }
    scored.sortBy { case (sim, i) => (-sim, i) }.take(n).map(_._2).toSeq
  }

  /** Lloyd's k-means over the corpus (cosine-normalized), distributed:
    * assignment is a partition-local JVM kernel, centroid update a
    * groupBy-average; only the k×dim centroid matrix ever reaches the
    * driver. Deterministic: seeds are an id-ordered systematic sample. */
  def trainIvf(corpus: DataFrame, nCells: Int, iterations: Int = 2)
      : IvfModel = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus.toDF("id", "vec")
      .select(col("id").cast("long").as("id"), toDouble(col("vec")).as("v"))
      .as[(Long, Array[Double])]
      // the loop makes iterations+2 passes (seed sample, count, one
      // assignment per iteration) — persist so only the first touches
      // the source scan
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = base.count()
    val stride = math.max(n / nCells, 1L)
    // systematic id sample; ids need not be dense (or include a
    // stride-divisible one at all), so top up deterministically from
    // the id-ordered head when the sample runs short — excluding the
    // stride-divisible ids already sampled, or the top-up would seed
    // duplicate (dead) centroids
    val sampled = base.filter(_._1 % stride == 0).map(_._2).take(nCells)
    val seedVecs =
      if (sampled.length >= nCells) sampled
      else (sampled ++ base.filter(_._1 % stride != 0).sort("_1")
        .map(_._2).take(nCells - sampled.length))
    var model = IvfModel(seedVecs.toArray)
    (0 until iterations).foreach { _ =>
      val m = model
      val sums = base.mapPartitions { it =>
        it.map { case (_, v) => (nearestCells(m, v, 1).head, (v, 1L)) }
      }.rdd.reduceByKey {
        (x: (Array[Double], Long), y: (Array[Double], Long)) =>
          val merged = x._1.clone()
          var i = 0
          while (i < merged.length && i < y._1.length) {
            merged(i) += y._1(i); i += 1
          }
          (merged, x._2 + y._2)
      }.collect()
      val next = m.centroids.clone()
      sums.foreach { case (cell, (sum, count)) =>
        next(cell) = sum.map(_ / count)
      }
      model = IvfModel(next)
    }
    base.unpersist()
    model
  }

  /** Materialized IVF index: `(id, cell, vec)` — the standing,
    * persistable form (write it to parquet partitioned/bucketed by
    * `cell` and searches prune to the probed cells at the SCAN). Build
    * once, query many times; [[ivfTopK]] rebuilds the assignment per
    * call, which is the right shape only for one-shot searches. New
    * batches append through the same map (assignment is stateless given
    * the model). */
  def buildIvfIndex(corpus: DataFrame, model: IvfModel): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.toDF("id", "vec")
      .select(col("id").cast("long").as("id"), toDouble(col("vec")).as("v"))
      .as[(Long, Array[Double])]
      .map { case (id, v) => (id, nearestCells(model, v, 1).head, v) }
      .toDF("id", "cell", "vec")
  }

  /** IVF top-k over a standing [[buildIvfIndex]] table: probe-cell
    * equi-join + exact re-rank, no corpus re-assignment. */
  def ivfTopKIndexed(index: DataFrame, queries: DataFrame, k: Int,
      model: IvfModel, nprobe: Int = 3): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val q = queries.toDF("query_id", "query_vec")
    val queryCells = q
      .select(col("query_id").cast("long").as("query_id"),
        toDouble(col("query_vec")).as("v"))
      .as[(Long, Array[Double])]
      .flatMap { case (id, v) =>
        nearestCells(model, v, nprobe).map(cell => (id, cell)) }
      .toDF("query_id", "cell")
    val scored = index.join(broadcast(queryCells), "cell")
      .join(broadcast(q), "query_id")
      .where(col("id") =!= col("query_id"))
      .withColumn("sim",
        round(cosine(col("vec"), toDouble(col("query_vec"))), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "id", "sim")
  }

  /** IVF top-k: corpus rows live in their nearest cell; each query
    * probes its `nprobe` nearest cells and re-ranks candidates exactly.
    * Candidate generation is an equi-join on cell id — the classic
    * IVF-flat search, shuffle-bounded by cell sizes. One-shot form of
    * [[ivfTopKIndexed]] (assignment + search in one call; build the
    * index once with [[buildIvfIndex]] when querying repeatedly). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      model: IvfModel, nprobe: Int = 3): DataFrame =
    ivfTopKIndexed(buildIvfIndex(corpus, model), queries, k, model, nprobe)

  // ---- incremental IVF maintenance --------------------------------------

  /** Standing IVF index with incremental-maintenance state: the trained
    * model, the materialized (id, cell, vec) assignment table
    * (lineage-truncated — an always-on ingest must not grow the plan),
    * and the drift bookkeeping that decides when to recluster.
    * Mirrors [[graft.pipeline.Dedup.CorpusIndex]]: batch-∝ append cost,
    * full rebuild only past a drift threshold. */
  final case class IvfIndex(model: IvfModel, index: DataFrame,
      rowsAtTrain: Long, appendedRows: Long, reclusters: Int) {
    def totalRows: Long = rowsAtTrain + appendedRows
    /** Fraction of the standing corpus assigned with a model that was
      * not trained on it — the staleness measure appends accumulate. */
    def drift: Double =
      if (totalRows == 0) 0.0 else appendedRows.toDouble / totalRows
    def unpersist(): Unit = graft.util.Lineage.release(index)
  }

  /** Train + build a standing incremental IVF index over the corpus. */
  def buildIvf(corpus: DataFrame, nCells: Int, iterations: Int = 2)
      : IvfIndex = {
    val model = trainIvf(corpus, nCells, iterations)
    val idx = buildIvfIndex(corpus, model).localCheckpoint(true)
    IvfIndex(model, idx, idx.count(), 0L, 0)
  }

  /** Append a vector batch to a standing [[IvfIndex]]: one stateless
    * assignment map with the standing centroids (a broadcast of the
    * k×dim model inside the closure — NO shuffle, NO re-clustering) +
    * union. Cost ∝ batch, not corpus — the always-on ingest shape.
    *
    * Drift bookkeeping: once the appended fraction of the standing
    * corpus exceeds `reclusterAt`, the model is retrained over the full
    * corpus and every row re-assigned — after which the index is BY
    * CONSTRUCTION identical to a one-shot [[buildIvfIndex]] with the
    * new model (assignment is a stateless per-row map given the model),
    * so incremental-after-N-appends search ≡ rebuild search exactly
    * (the `ann_ivf_incremental` oracle pins this in both regimes). */
  def appendToIvfIndex(idx: IvfIndex, batch: DataFrame,
      reclusterAt: Double = 0.5, iterations: Int = 2): IvfIndex = {
    require(reclusterAt > 0 && reclusterAt <= 1,
      s"reclusterAt must be in (0, 1], got $reclusterAt")
    val merged = idx.index
      .unionByName(buildIvfIndex(batch, idx.model))
      .localCheckpoint(true) // eager: safe to drop the superseded blocks
    graft.util.Lineage.release(idx.index)
    val newTotal = merged.count()
    val appended = idx.appendedRows + (newTotal - idx.totalRows)
    if (appended.toDouble / math.max(newTotal, 1L) <= reclusterAt)
      idx.copy(index = merged, appendedRows = appended)
    else {
      val corpus = merged.select(col("id"), col("vec"))
      val model = trainIvf(corpus, idx.model.nCells, iterations)
      val rebuilt = buildIvfIndex(corpus, model).localCheckpoint(true)
      graft.util.Lineage.release(merged)
      IvfIndex(model, rebuilt, newTotal, 0L, idx.reclusters + 1)
    }
  }

  // ---- PQ (product quantization) ---------------------------------------

  /** Trained product quantizer: `m` codebooks of `ksub` sub-centroids
    * over equal subspace splits of the L2-normalized vectors. m×ksub×dsub
    * doubles — tiny, ships to executors as a closure. A PQ code is m
    * bytes per vector: the 100 TB memory story for embedding search
    * (64-dim float = 256 B → 8 B at m=8). */
  final case class PqModel(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def ksub: Int = codebooks(0).length
    def dsub: Int = codebooks(0)(0).length
  }

  /** Index of the L2-nearest sub-centroid for the subspace starting at
    * `off` (deterministic: first minimum wins). */
  private def nearestSub(book: Array[Array[Double]], v: Array[Double],
      off: Int): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < book.length) {
      val cen = book(c)
      var d = 0.0; var j = 0
      while (j < cen.length) {
        val x = v(off + j) - cen(j); d += x * x; j += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def normalized(v: Array[Double]): Array[Double] = {
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    val s = math.sqrt(n)
    if (s == 0.0) v else v.map(_ / s)
  }

  /** Per-subspace Lloyd's k-means, all `m` codebooks trained jointly in
    * one distributed loop: assignment is a partition-local kernel
    * emitting ((subspace, cell), partial sums), the update one
    * reduceByKey — only the m×ksub×dsub codebook matrix reaches the
    * driver. Vectors are L2-normalized first so PQ inner product
    * approximates cosine. Deterministic seeding: an id-ordered
    * systematic sample sliced into subspaces. */
  def trainPq(corpus: DataFrame, m: Int, ksub: Int = 16,
      iterations: Int = 2): PqModel = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus.toDF("id", "vec")
      .select(col("id").cast("long").as("id"), toDouble(col("vec")).as("v"))
      .as[(Long, Array[Double])]
      .map { case (id, v) => (id, normalized(v)) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = base.count()
    val dim = base.head()._2.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val stride = math.max(n / ksub, 1L)
    // systematic id sample, topped up from the id-ordered head when ids
    // are sparse/hashed and few (or none) are stride-divisible — an
    // empty sample would otherwise crash, a short one would train
    // duplicate dead sub-centroids (hence the top-up excludes already-
    // sampled stride-divisible ids)
    val sampled = base.filter(_._1 % stride == 0).map(_._2).take(ksub)
    val seeds =
      if (sampled.length >= ksub) sampled
      else (sampled ++ base.filter(_._1 % stride != 0).sort("_1")
        .map(_._2).take(ksub - sampled.length))
    var books: Array[Array[Array[Double]]] = Array.tabulate(m, ksub) {
      (j, c) => seeds(c % seeds.length).slice(j * dsub, (j + 1) * dsub)
    }
    (0 until iterations).foreach { _ =>
      val cur = books
      val sums = base.mapPartitions { it =>
        it.flatMap { case (_, v) =>
          (0 until cur.length).iterator.map { j =>
            val cell = nearestSub(cur(j), v, j * dsub)
            ((j, cell), (v.slice(j * dsub, (j + 1) * dsub), 1L))
          }
        }
      }.rdd.reduceByKey { (x, y) =>
        val s = x._1.clone()
        var i = 0
        while (i < s.length) { s(i) += y._1(i); i += 1 }
        (s, x._2 + y._2)
      }.collect()
      val next = books.map(_.clone())
      sums.foreach { case ((j, cell), (sum, count)) =>
        next(j)(cell) = sum.map(_ / count)
      }
      books = next
    }
    base.unpersist()
    PqModel(books)
  }

  /** PQ-encode the corpus: `(id, code array<int> of length m)` — the
    * compressed representation an ADC scan reads instead of the raw
    * vectors. Pure map stage. */
  def pqEncode(corpus: DataFrame, model: PqModel): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.toDF("id", "vec")
      .select(col("id").cast("long").as("id"), toDouble(col("vec")).as("v"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        val nv = normalized(v)
        val code = Array.tabulate(model.m)(j =>
          nearestSub(model.codebooks(j), nv, j * model.dsub))
        (id, code)
      }
      .toDF("id", "code")
  }

  /** Standing PQ code table — [[pqEncode]] under the index-building
    * name: persist it (parquet) and pass to [[pqTopKIndexed]] so
    * repeated searches skip the encode scan; new batches append through
    * the same stateless encode. */
  def buildPqIndex(corpus: DataFrame, model: PqModel): DataFrame =
    pqEncode(corpus, model)

  // ---- incremental PQ maintenance ---------------------------------------

  /** Standing PQ index with incremental maintenance — the PQ mirror of
    * [[IvfIndex]]. Holds the trained quantizer, the standing (id, vec)
    * corpus (the re-rank side of ADC search needs it anyway), and the
    * (id, code) table; both frames are lineage-truncated. Appends
    * re-encode only the batch (PQ encoding is a stateless per-row map
    * given the codebooks); drift past `reclusterAt` retrains the
    * quantizer on the full standing corpus and re-encodes — after which
    * the code table is BY CONSTRUCTION identical to a one-shot
    * [[pqEncode]] with the new model (`ann_pq_incremental` pins it). */
  final case class PqIndex(model: PqModel, corpus: DataFrame,
      codes: DataFrame, rowsAtTrain: Long, appendedRows: Long,
      reclusters: Int) {
    def totalRows: Long = rowsAtTrain + appendedRows
    def drift: Double =
      if (totalRows == 0) 0.0 else appendedRows.toDouble / totalRows
    def unpersist(): Unit = {
      graft.util.Lineage.release(corpus)
      graft.util.Lineage.release(codes)
    }
  }

  /** Train + encode a standing incremental PQ index over the corpus. */
  def buildPq(corpus: DataFrame, m: Int, ksub: Int = 16,
      iterations: Int = 2): PqIndex = {
    val model = trainPq(corpus, m, ksub, iterations)
    val c = corpus.toDF("id", "vec").localCheckpoint(true)
    val codes = pqEncode(c, model).localCheckpoint(true)
    PqIndex(model, c, codes, c.count(), 0L, 0)
  }

  /** Append a vector batch: encode with the STANDING codebooks (pure
    * map, cost ∝ batch) + union both frames; retrain + re-encode once
    * the appended fraction exceeds `reclusterAt`. */
  def appendToPqIndex(idx: PqIndex, batch: DataFrame,
      reclusterAt: Double = 0.5, iterations: Int = 2): PqIndex = {
    require(reclusterAt > 0 && reclusterAt <= 1,
      s"reclusterAt must be in (0, 1], got $reclusterAt")
    val b = batch.toDF("id", "vec")
    val corpus = idx.corpus.unionByName(b).localCheckpoint(true)
    graft.util.Lineage.release(idx.corpus)
    val newTotal = corpus.count()
    val appended = idx.appendedRows + (newTotal - idx.totalRows)
    if (appended.toDouble / math.max(newTotal, 1L) <= reclusterAt) {
      val codes = idx.codes.unionByName(pqEncode(b, idx.model))
        .localCheckpoint(true)
      graft.util.Lineage.release(idx.codes)
      idx.copy(corpus = corpus, codes = codes, appendedRows = appended)
    } else {
      val model = trainPq(corpus, idx.model.m, idx.model.ksub, iterations)
      val codes = pqEncode(corpus, model).localCheckpoint(true)
      graft.util.Lineage.release(idx.codes)
      PqIndex(model, corpus, codes, newTotal, 0L, idx.reclusters + 1)
    }
  }

  /** Per-query ADC lookup tables, `table(j)(cell) = <q_sub_j,
    * centroid(j)(cell)>` — one m×ksub double grid per query, built on
    * the driver (queries are the small side by contract) and broadcast;
    * the code scan then scores a candidate with m array lookups and no
    * raw-vector access. */
  private def adcTables(q: DataFrame, model: PqModel)
      : Array[(Long, Array[Array[Double]])] = {
    val spark = q.sparkSession
    import spark.implicits._
    q.select(col("query_id").cast("long"), toDouble(col("query_vec")))
      .as[(Long, Array[Double])]
      .collect()
      .map { case (qid, v) =>
        val nv = normalized(v)
        val t = Array.tabulate(model.m, model.ksub) { (j, cell) =>
          val cen = model.codebooks(j)(cell)
          var s = 0.0; var i = 0
          while (i < cen.length) { s += cen(i) * nv(j * model.dsub + i); i += 1 }
          s
        }
        (qid, t)
      }
  }

  /** PQ top-k with exact re-rank: asymmetric-distance (ADC) scan over
    * the m-byte codes shortlists `k × rerank` candidates per query —
    * each query ships only its m×ksub inner-product lookup table, and
    * the scan never touches raw corpus vectors — then the shortlist
    * joins back to the full vectors for exact cosine ordering. The
    * output sims are exact; PQ error only affects WHICH candidates are
    * shortlisted (recall), the classic IVF-PQ search contract.
    * One-shot form of [[pqTopKIndexed]]. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, model: PqModel,
      rerank: Int = 4): DataFrame =
    pqTopKIndexed(pqEncode(corpus, model), corpus, queries, k, model,
      rerank)

  /** PQ top-k over a standing [[buildPqIndex]] code table (`codes` =
    * `(id, code)`); `corpus` supplies the raw vectors for the exact
    * re-rank join only — the ADC scan reads codes alone. */
  def pqTopKIndexed(codes: DataFrame, corpus: DataFrame,
      queries: DataFrame, k: Int, model: PqModel,
      rerank: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus.toDF("id", "vec")
    val q = queries.toDF("query_id", "query_vec")
    val bTables = spark.sparkContext.broadcast(adcTables(q, model))
    // two-phase shortlist: each input partition keeps its own local
    // top-(k·rerank) per query BEFORE the global rank, so the
    // query-keyed window sees ≤ partitions × k × rerank rows per query
    // instead of the whole corpus funneling through one task
    val take = k * rerank
    val shortlist = codes.toDF("id", "code")
      .select(col("id").cast("long"), col("code"))
      .as[(Long, Array[Int])]
      .mapPartitions { it =>
        val heaps = collection.mutable.Map
          .empty[Long, collection.mutable.PriorityQueue[(Double, Long)]]
        // min-heap by (adc, -id): evict the weakest candidate
        val ord = Ordering.by[(Double, Long), (Double, Long)] {
          case (s, id) => (-s, id)
        }
        it.foreach { case (id, code) =>
          bTables.value.foreach { case (qid, t) =>
            if (qid != id) {
              var s = 0.0; var j = 0
              while (j < code.length) { s += t(j)(code(j)); j += 1 }
              val heap = heaps.getOrElseUpdate(qid,
                collection.mutable.PriorityQueue.empty(ord))
              heap.enqueue((s, id))
              if (heap.size > take) heap.dequeue()
            }
          }
        }
        heaps.iterator.flatMap { case (qid, heap) =>
          heap.iterator.map { case (s, id) => (qid, id, s) }
        }
      }
      .toDF("query_id", "id", "adc")
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("id"))
    val candidates = shortlist
      .withColumn("r", row_number().over(wAdc))
      .where(col("r") <= take)
      .select("query_id", "id")
    val scored = candidates.join(c, "id").join(broadcast(q), "query_id")
      .withColumn("sim",
        round(cosine(toDouble(col("vec")), toDouble(col("query_vec"))), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "id", "sim")
  }

  /** IVF-PQ top-k — the standard billion-vector composition of the two
    * already-separately-oracled components: IVF cells prune the scan
    * (each query touches only its `nprobe` nearest cells), the PQ ADC
    * scan ranks the probed rows from m-byte codes alone (no raw-vector
    * reads), and the `k × rerank` shortlist joins back to full vectors
    * for exact cosine ordering. Output sims are exact; IVF probing and
    * PQ error affect only WHICH candidates are shortlisted (recall).
    * At 100 TB: the index is (id, cell, code) — bytes per vector —
    * partitioned by cell so probing prunes at the scan; raw vectors
    * are touched for shortlist rows only. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      ivfModel: IvfModel, pqModel: PqModel, nprobe: Int = 3,
      rerank: Int = 4): DataFrame = {
    val index = buildIvfIndex(corpus, ivfModel)
      .join(pqEncode(corpus, pqModel), "id")
    ivfPqTopKIndexed(index, queries, k, ivfModel, pqModel, nprobe,
      rerank)
  }

  /** IVF-PQ search over a standing composed index `(id, cell, code,
    * vec)` — build once ([[buildIvfIndex]] ⋈ [[pqEncode]]), query many
    * times. `vec` rides along for the exact re-rank join; a
    * deployment that stores vectors separately can pass codes-only
    * rows joined back by id at the same place. */
  def ivfPqTopKIndexed(index: DataFrame, queries: DataFrame, k: Int,
      ivfModel: IvfModel, pqModel: PqModel, nprobe: Int = 3,
      rerank: Int = 4): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val q = queries.toDF("query_id", "query_vec")
    val queryCells = q
      .select(col("query_id").cast("long").as("query_id"),
        toDouble(col("query_vec")).as("v"))
      .as[(Long, Array[Double])]
      .flatMap { case (id, v) =>
        nearestCells(ivfModel, v, nprobe).map(cell => (id, cell)) }
      .toDF("query_id", "cell")
    val bTables =
      spark.sparkContext.broadcast(adcTables(q, pqModel).toMap)
    val take = k * rerank
    // probed rows only: equi-join on cell, then the ADC scan with
    // partition-local per-query top-take heaps (the pqTopK two-phase
    // shape, fed by the pruned candidate stream instead of the corpus)
    val shortlist = index.join(broadcast(queryCells), "cell")
      .where(col("id") =!= col("query_id"))
      .select(col("query_id").cast("long"), col("id").cast("long"),
        col("code"))
      .as[(Long, Long, Array[Int])]
      .mapPartitions { it =>
        val tables = bTables.value
        val heaps = collection.mutable.Map
          .empty[Long, collection.mutable.PriorityQueue[(Double, Long)]]
        val ord = Ordering.by[(Double, Long), (Double, Long)] {
          case (s, id) => (-s, id)
        }
        it.foreach { case (qid, id, code) =>
          val t = tables(qid)
          var s = 0.0; var j = 0
          while (j < code.length) { s += t(j)(code(j)); j += 1 }
          val heap = heaps.getOrElseUpdate(qid,
            collection.mutable.PriorityQueue.empty(ord))
          heap.enqueue((s, id))
          if (heap.size > take) heap.dequeue()
        }
        heaps.iterator.flatMap { case (qid, heap) =>
          heap.iterator.map { case (s, id) => (qid, id, s) }
        }
      }
      .toDF("query_id", "id", "adc")
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("id"))
    val candidates = shortlist
      .withColumn("r", row_number().over(wAdc))
      .where(col("r") <= take)
      .select("query_id", "id")
    val scored = candidates
      .join(index.select(col("id"), col("vec")), "id")
      .join(broadcast(q), "query_id")
      .withColumn("sim",
        round(cosine(col("vec"), toDouble(col("query_vec"))), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "id", "sim")
  }

  /** Standing incremental IVF-PQ index — the composed always-on form:
    * the IVF assignment table prunes searches to probed cells, the PQ
    * code table serves the ADC scan, and BOTH components append
    * statelessly and recluster past the same drift threshold (each is
    * separately pinned incremental ≡ rebuild, so the composition is
    * too — `ann_ivfpq_incremental`). */
  final case class IvfPqIndex(ivf: IvfIndex, pq: PqIndex) {
    /** Composed (id, cell, vec, code) search table. */
    def composed: DataFrame = ivf.index.join(pq.codes, "id")
    def reclusters: Int = math.max(ivf.reclusters, pq.reclusters)
    def unpersist(): Unit = { ivf.unpersist(); pq.unpersist() }
  }

  /** Run the independent IVF and PQ component builds CONCURRENTLY
    * (guide §2.6 — actions are only sequential because the driver
    * calls them sequentially): the two halves share no state, each is
    * a chain of small driver-steered jobs whose scheduling floor, not
    * compute, dominates at any corpus size, and overlapping them lets
    * one half's jobs back-fill the executor idle time of the other's.
    * Results are bit-identical to the sequential form — both halves
    * are deterministic functions of their inputs. */
  private def joinHalves[A, B](ivfHalf: => A, pqHalf: => B): (A, B) = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val f = Future(ivfHalf)
    val pq = pqHalf
    (Await.result(f, Duration.Inf), pq)
  }

  /** Train + build a standing incremental IVF-PQ index. */
  def buildIvfPq(corpus: DataFrame, nCells: Int, m: Int,
      ksub: Int = 16, iterations: Int = 2): IvfPqIndex = {
    val (ivf, pq) = joinHalves(
      buildIvf(corpus, nCells, iterations),
      buildPq(corpus, m, ksub, iterations))
    IvfPqIndex(ivf, pq)
  }

  /** Append a vector batch to both components (stateless maps, cost ∝
    * batch); either reclusters independently past `reclusterAt` —
    * after which each is BY CONSTRUCTION identical to a one-shot
    * rebuild with its final model. */
  def appendToIvfPqIndex(idx: IvfPqIndex, batch: DataFrame,
      reclusterAt: Double = 0.5, iterations: Int = 2): IvfPqIndex = {
    val (ivf, pq) = joinHalves(
      appendToIvfIndex(idx.ivf, batch, reclusterAt, iterations),
      appendToPqIndex(idx.pq, batch, reclusterAt, iterations))
    IvfPqIndex(ivf, pq)
  }

  /** IVF-PQ search over a standing [[IvfPqIndex]]. */
  def ivfPqTopKOnIndex(idx: IvfPqIndex, queries: DataFrame, k: Int,
      nprobe: Int = 3, rerank: Int = 4): DataFrame =
    ivfPqTopKIndexed(idx.composed, queries, k, idx.ivf.model,
      idx.pq.model, nprobe, rerank)

  /** Embedding-cosine near-duplicate pairs at `threshold`, LSH-bucketed
    * with exact verification. */
  /** Cross-corpus cosine matching — the semantic-contamination /
    * retrieval-overlap shape: every (left, right) pair above
    * `threshold`, candidates from the SAME deterministic hyperplane
    * tables on both sides (so a qualifying pair collides in some
    * table with the familiar LSH probability), verified with the exact
    * cosine. Same scale shape as [[cosineNearDuplicates]]: the
    * signature join shuffles (table, signature) keys, vectors are
    * fetched only for surviving candidates. */
  def cosineMatches(left: DataFrame, leftId: Column, leftVec: Column,
      right: DataFrame, rightId: Column, rightVec: Column,
      threshold: Double, dim: Int, planes: Int = 8, tables: Int = 24)
      : DataFrame = {
    val l = left.select(leftId.as("id_a"), leftVec.as("vec_a"))
    val r = right.select(rightId.as("id_b"), rightVec.as("vec_b"))
    val sa = lshSignatures(l, col("id_a"), col("vec_a"), dim, planes,
      tables).toDF("id_a", "table", "signature")
    val sb = lshSignatures(r, col("id_b"), col("vec_b"), dim, planes,
      tables).toDF("id_b", "table", "signature")
    val pairs = sa.join(sb, Seq("table", "signature"))
      .select("id_a", "id_b").distinct()
    pairs.join(l, "id_a").join(r, "id_b")
      .withColumn("sim",
        cosine(toDouble(col("vec_a")), toDouble(col("vec_b"))))
      .where(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  def cosineNearDuplicates(df: DataFrame, idCol: Column, vecCol: Column,
      threshold: Double, dim: Int, planes: Int = 8, tables: Int = 24)
      : DataFrame = {
    val base = df.select(idCol.as("id"), vecCol.as("vec"))
    val sigs = lshSignatures(base, col("id"), col("vec"), dim, planes, tables)
    val a = sigs.toDF("id_a", "table", "signature")
    val b = sigs.toDF("id_b", "table", "signature")
    val pairs = a.join(b, Seq("table", "signature"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val va = base.toDF("id_a", "vec_a")
    val vb = base.toDF("id_b", "vec_b")
    pairs.join(va, "id_a").join(vb, "id_b")
      .withColumn("sim",
        cosine(toDouble(col("vec_a")), toDouble(col("vec_b"))))
      .where(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  // ---- semantic dedup (SemDeDup shape) ---------------------------------

  /** SemDeDup-style semantic deduplication: assign each embedding to its
    * nearest k-means cell, generate candidates ONLY within a cell (the
    * equi-join on the cell id is the single shuffle — candidate volume
    * is Σ|cell|²/2, tunable via nCells, never corpus²), verify exact
    * cosine ≥ threshold, and drop every vector that has a smaller-id
    * near-duplicate in its cell (min-id keeper, the same keeper rule as
    * text dedup). Returns (drop_id, keep_id, sim) — `keep_id` the
    * smallest near-dup partner, `sim` the highest partner similarity
    * (transitive-group flattening, when wanted, composes with
    * [[graft.pipeline.Dedup.connectedComponents]] exactly as the text
    * path does).
    *
    * Approximation contract: near-dups straddling a cell boundary are
    * MISSED (SemDeDup's own trade-off). On well-separated clusters the
    * result equals brute force — `PipelineSpec` pins both properties. */
  def semanticDedup(df: DataFrame, idCol: Column, vecCol: Column,
      model: IvfModel, threshold: Double): DataFrame = {
    val indexed = buildIvfIndex(df.select(idCol, vecCol), model)
    val a = indexed.toDF("id_a", "cell", "vec_a")
    val b = indexed.toDF("id_b", "cell", "vec_b")
    a.join(b, "cell")
      .where(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("vec_a"), col("vec_b")))
      .where(col("sim") >= threshold)
      .groupBy(col("id_b").as("drop_id"))
      .agg(min(col("id_a")).as("keep_id"),
        round(max(col("sim")), 6).as("sim"))
  }

  // ---- int8 embedding quantization -------------------------------------

  /** Symmetric per-vector int8 codes: scale = max|x|/127,
    * code_i = round(x_i·127 / max|x|) ∈ [-127, 127] (all-zero vector →
    * all-zero codes). Pure codegen'd column arithmetic — the 4×
    * embedding-compression map stage of a serving/training pipeline.
    * The arithmetic (float→double cast, (x·127)/amax, half-away-from-
    * zero round) is engine-portable, so codes are integer-exact on any
    * IEEE implementation — the oracle checks them verbatim. */
  def int8Codes(vec: Column): Column = {
    val v = toDouble(vec)
    val amax = array_max(transform(v, x => abs(x)))
    when(amax === 0d, transform(v, _ => lit(0L)))
      .otherwise(transform(v, x =>
        round(x * lit(127d) / amax).cast("long")))
  }

  /** Quantization report per vector: dimension, the dequantization
    * scale, and code-space summaries (max |code|, Σ|code|) — integer
    * ground truth for the quantizer. */
  def int8QuantStats(df: DataFrame, idCol: Column, vecCol: Column)
      : DataFrame = {
    val v = toDouble(vecCol)
    val amax = array_max(transform(v, x => abs(x)))
    val codes = int8Codes(vecCol)
    df.select(idCol.as("vec_id"),
      size(vecCol).cast("long").as("dim"),
      round(amax / lit(127d), 6).as("scale"),
      array_max(transform(codes, c => abs(c))).as("max_code"),
      aggregate(codes, lit(0L), (a, c) => a + abs(c)).as("sum_abs_code"))
  }
}
