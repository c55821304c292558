package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for corpus curation.
  *
  * All selection decisions derive from a content-addressed hash of a key
  * column (md5 prefix → uniform [0,1)), never from `rand()`: the same
  * row is selected on every run, on every engine, at any partitioning —
  * which makes samples reproducible, incrementally extendable (raising
  * the rate only ADDS rows), and externally auditable.
  */
object Sampling {

  /** Deterministic uniform [0,1) from a key: the first 8 hex digits of
    * `md5(key)` as an integer, divided by 2^32. Both operands are exact
    * in double precision, so the comparison against a rate is
    * bit-reproducible across engines. */
  def hashUnit(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("double") /
      lit(4294967296.0)

  /** Bernoulli sample at `rate`, keyed on `key` — a pure filter: no
    * shuffle, pushes down past column pruning, scan-bound at 100 TB. */
  def sampleByKey(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.where(hashUnit(key) < lit(rate))

  /** Stratified Bernoulli sample: per-stratum rates with a default for
    * unlisted strata. Still a pure filter (the rate lookup is a CASE
    * chain) — the canonical shape for class-rebalancing a web corpus
    * (e.g. downsample boilerplate-heavy domains, keep rare languages). */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    val rateCol = rates.foldLeft(lit(defaultRate): Column) {
      case (acc, (s, r)) => when(stratum === lit(s), lit(r)).otherwise(acc)
    }
    df.where(hashUnit(key) < rateCol)
  }

  /** Deterministic dataset split: assigns each row a split label by
    * cumulative hash ranges — `("train" -> 0.9, "val" -> 0.05,
    * "test" -> 0.05)` sends hashUnit ∈ [0, 0.9) to train, [0.9, 0.95)
    * to val, [0.95, 1.0) to test. Reproducible on any engine and
    * partitioning; a document never migrates between splits when other
    * data arrives (membership depends only on its own key). Fractions
    * must sum to 1 (±1e-9). Pure map stage, no shuffle. */
  def hashSplit(df: DataFrame, key: Column,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0) &&
      math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must be non-negative and sum to 1")
    val u = hashUnit(key)
    val uppers = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
      .tail.init // cumulative upper bound of every split but the last
    // the last split is the open-ended otherwise, so the hash
    // 0.999999… edge always lands somewhere
    df.withColumn("split",
      splits.init.zip(uppers).reverse.foldLeft(lit(splits.last._1)) {
        case (acc, ((name, _), upper)) =>
          when(u < upper, lit(name)).otherwise(acc)
      })
  }

  /** Split-hygiene audit: content hashes that appear in MORE THAN ONE
    * split of [[hashSplit]]'s output — the train/test leakage a
    * key-hashed split cannot prevent when the corpus still holds exact
    * duplicates under different keys (dedup before splitting, or accept
    * contaminated eval). Emits one row per leaking content hash with
    * its blast radius. One groupBy on the content hash (map-side
    * combined); the shuffle carries (hash, split) pairs, never text. */
  def splitLeakage(split: DataFrame, contentCol: Column): DataFrame =
    split.groupBy(md5(contentCol).as("content_hash"))
      .agg(count_distinct(col("split")).as("n_splits"),
        count(lit(1)).as("n_docs"),
        sort_array(collect_set(col("split"))).as("splits"))
      .where(col("n_splits") > 1)
      .select(col("content_hash"), col("n_splits"), col("n_docs"),
        concat_ws(",", col("splits")).as("splits"))

  /** Deterministic global shuffle for training order: every row gets a
    * contiguous 0-based `shuffle_pos` under the total order
    * `(md5(salt || key), key)`. Changing the salt re-deals the whole
    * order; the same salt reproduces it exactly on any engine or
    * partitioning.
    *
    * Scale shape: the hash order is uniform, so `repartitionByRange` +
    * partition-local sort is a balanced distributed sort (Spark samples
    * range bounds), and the contiguous index comes from
    * `RDD.zipWithIndex` — one extra count job for per-partition offsets,
    * no single-partition window, no driver materialization. */
  def globalShuffle(df: DataFrame, key: Column, salt: String): DataFrame = {
    val spark = df.sparkSession
    val withH = df.withColumn("__h",
      md5(concat(lit(salt), key.cast("string"))))
    val sorted = withH
      .repartitionByRange(col("__h"), key)
      .sortWithinPartitions(col("__h"), key)
    val outSchema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        "shuffle_pos", org.apache.spark.sql.types.LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i)
    }
    spark.createDataFrame(indexed, outSchema).drop("__h")
  }

  /** Deterministic token-budget mixing: per stratum (source/domain/
    * language), admit documents in key-hash order until the stratum's
    * token budget is reached — the "data mixing" step that assembles a
    * training corpus to per-source token targets. A document is admitted
    * iff the tokens admitted BEFORE it fall short of the budget, so the
    * first overshooting document is included: budgets are met, never
    * silently undershot. Same hash ⇒ the mix is reproducible and
    * monotone in the budgets (raising one only adds documents).
    *
    * Scale shape: an exact running sum without a per-stratum window
    * (which would funnel each stratum through ONE task). Rows are
    * range-sorted by (stratum, hash); phase 1 aggregates per-(partition,
    * stratum) token subtotals (≤ P×S tiny rows to the driver); phase 2
    * rescans with each partition's per-stratum prefix offset broadcast,
    * keeping the cumulative check partition-local. A giant stratum
    * spans many partitions and still parallelizes. The sorted input is
    * localCheckpoint-pinned so both phases see identical partitioning.
    */
  def tokenBudgetSample(df: DataFrame, stratum: Column, key: Column,
      tokens: Column, budgets: Map[String, Long],
      defaultBudget: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .withColumn("__s", stratum.cast("string"))
      .withColumn("__u", hashUnit(key))
      .withColumn("__k", key.cast("string"))
      .withColumn("__t", tokens.cast("long"))
      .repartitionByRange(col("__s"), col("__u"), col("__k"))
      .sortWithinPartitions(col("__s"), col("__u"), col("__k"))
      .localCheckpoint() // pin rows to partitions across the two passes
    val subtotals = sorted
      .select(spark_partition_id().as("__p"), col("__s"), col("__t"))
      .groupBy("__p", "__s").agg(sum("__t").as("__sum"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // per-stratum running sum in partition order: one driver scan over
    // the sorted subtotals (O(P·S log) — not the quadratic pairwise
    // sum, which would bite at cluster-scale partition counts)
    val offsets: Map[(Int, String), Long] = {
      val acc = collection.mutable.Map.empty[String, Long]
      subtotals.toSeq.sortBy(_._1._1).map { case ((p, s), v) =>
        val before = acc.getOrElse(s, 0L)
        acc(s) = before + v
        (p, s) -> before
      }.toMap
    }
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val bBudgets = spark.sparkContext.broadcast(budgets)
    val schema = sorted.schema
    val kept = sorted.rdd.mapPartitionsWithIndex { case (pid, rows) =>
      val running = collection.mutable.Map.empty[String, Long]
      rows.filter { row =>
        val s = row.getAs[String]("__s")
        val t = row.getAs[Long]("__t")
        val before = running.getOrElse(s,
          bOffsets.value.getOrElse((pid, s), 0L))
        running(s) = before + t
        before < bBudgets.value.getOrElse(s, defaultBudget)
      }
    }
    spark.createDataFrame(kept, schema)
      .drop("__s", "__u", "__k", "__t")
  }

  /** Skew-proof two-phase top-n (shared skeleton of [[quotaSample]],
    * [[weightedSample]], [[topKPerGroup]]): phase 1 ranks per
    * (part ++ input-partition id) — the shuffle key is salted by
    * partition id, so one giant group spreads across the cluster —
    * and phase 2 re-ranks the surviving ≤ n × P rows per `part`. Any
    * global top-n row is a top-n row of whichever partition it lands
    * in, so phase 1 never drops a winner and the result is independent
    * of the input partitioning. Keeps a 1-based `__rn` rank. */
  private def twoPhaseTopN(df: DataFrame, part: Seq[Column],
      order: Seq[Column], n: Int): DataFrame = {
    val phase1 = df
      .withColumn("__p", spark_partition_id())
      .withColumn("__rn", row_number().over(
        Window.partitionBy(part :+ col("__p"): _*).orderBy(order: _*)))
      .where(col("__rn") <= n)
      .drop("__p")
    phase1
      .withColumn("__rn", row_number().over(
        Window.partitionBy(part: _*).orderBy(order: _*)))
      .where(col("__rn") <= n)
  }

  /** Exact per-stratum quota: the `n` rows with the smallest key hashes
    * in each stratum (ties broken by key) — a deterministic "random"
    * sample of fixed size.
    *
    * Two-phase top-n so a giant stratum never funnels through one
    * reducer: phase 1 takes the per-(stratum, input-partition) top-n —
    * the shuffle key is salted by partition id, so skew spreads across
    * the cluster — and phase 2 re-ranks the surviving ≤ n × P rows per
    * stratum. Any global top-n row is a top-n row of whichever partition
    * it lands in, so phase 1 never drops a winner and the result is
    * independent of the input partitioning. */
  def quotaSample(df: DataFrame, stratum: Column, key: Column, n: Int)
      : DataFrame =
    twoPhaseTopN(df.withColumn("__u", hashUnit(key)),
      Seq(stratum), Seq(col("__u").asc, key.asc), n)
      .drop("__rn", "__u")

  /** Temperature-based stratum rebalancing (the multilingual-corpus
    * mixing rule: sample stratum s with probability ∝ N_s^alpha, so
    * alpha = 1 keeps natural proportions and alpha → 0 flattens toward
    * uniform — low-resource strata get boosted). Selects ≈ `targetN`
    * rows via per-stratum Bernoulli rates `min(1, targetN·w_s/N_s)`
    * with `w_s = N_s^alpha / Σ N_t^alpha`, keyed on the deterministic
    * row hash — reproducible on any engine and partitioning.
    *
    * The stratum-count table is collected to the driver (bounded
    * metadata: one row per language/source, same discipline as the
    * NB class priors); the selection itself is a broadcast join + pure
    * filter, scan-bound at 100 TB. Rates are rounded to 9 decimals so
    * the engine computing `pow` cannot flip a hash-threshold compare. */
  def temperatureSample(df: DataFrame, stratum: Column, key: Column,
      alpha: Double, targetN: Long): DataFrame = {
    require(alpha >= 0 && targetN > 0, "need alpha >= 0 and targetN > 0")
    val spark = df.sparkSession
    import spark.implicits._
    // null strata carry no stratum identity to rebalance on — they are
    // excluded (filter nulls upstream, or assign a sentinel stratum)
    val nonNull = df.where(stratum.isNotNull)
    // powSum is accumulated in CANONICAL (sorted-stratum) order: double
    // addition is order-sensitive at the last ulp, and the streaming
    // twin ([[graft.streaming.StructuredStreams
    // .StreamingTemperatureSample]]) re-derives the same sum from its
    // own count map — both sides summing sorted-by-stratum is what
    // makes fold ≡ one-shot bit-identical, not merely
    // round-to-9-identical
    val counts = nonNull.groupBy(stratum.as("__stratum")).count()
      .collect().map(r => (r.get(0), r.getLong(1)))
      .sortBy(_._1.toString)
    val powSum = counts.map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    val rates = counts.map { case (s, n) =>
      val w = math.pow(n.toDouble, alpha) / powSum
      val rate = math.min(1.0, targetN.toDouble * w / n)
      (s.toString, BigDecimal(rate)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.toDF("__stratum", "__rate")
    nonNull
      .join(broadcast(rates), stratum.cast("string") === col("__stratum"))
      .where(hashUnit(key) < col("__rate"))
      .drop("__stratum", "__rate")
  }

  /** Distribution-MATCHED resampling: the largest subset whose bin
    * composition follows the target integer weights exactly (floor
    * rounding) — "make the output look like the reference mix", the
    * rebalancing rule behind DoReMi-style domain reweighting and
    * length-distribution matching.
    *
    * With weights w_b (sum W) and per-bin availability a_b, the
    * largest feasible matched size is N* = min over weighted bins of
    * `a_b·W div w_b`, and each quota is `N*·w_b div W` (≤ a_b by
    * construction — all integer arithmetic, engine-exact). Bins
    * ABSENT from the target get quota 0 and are dropped; a weighted
    * bin with no rows forces N* = 0 (loudly empty, not silently
    * unbalanced). Rows are chosen per bin by the deterministic md5
    * hash of `key` (ties by key), so the subset is reproducible on
    * any engine or partitioning.
    *
    * Scale shape: the bin histogram is bounded driver metadata (the
    * [[temperatureSample]] discipline); selection is the skew-proof
    * two-phase top-n capped at the LARGEST quota, then a broadcast
    * quota join trims each bin — no global sort, no one-reducer bin.
    *
    * `maxN` caps the matched size (N* = min(feasible, maxN)) — the
    * fixed-budget form ingest-time mixing wants ("maintain a 100k-doc
    * matched sample"), and the form whose streaming twin
    * ([[graft.streaming.StructuredStreams.StreamingMatchedSample]])
    * folds with bounded state. */
  def matchedSample(df: DataFrame, bin: Column, key: Column,
      targetWeights: Seq[(String, Long)], maxN: Option[Long] = None)
      : DataFrame = {
    require(targetWeights.nonEmpty, "need at least one target bin")
    require(targetWeights.forall(_._2 > 0),
      "target weights must be positive (omit a bin to exclude it)")
    require(targetWeights.map(_._1).distinct.length == targetWeights.length,
      "duplicate target bin")
    require(maxN.forall(_ > 0), "maxN must be positive when given")
    val spark = df.sparkSession
    import spark.implicits._
    val w = targetWeights.map(_._2).sum
    val binned = df.withColumn("__bin", bin.cast("string"))
      .where(col("__bin").isNotNull)
    val avail = binned.groupBy("__bin").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // optional CAP on the matched size (maxN): the fixed-budget form —
    // quotas then never exceed maxN·w_b div W, which is what makes the
    // streaming twin's per-bin candidate pools bounded
    val nStar = math.min(
      targetWeights.map { case (b, wb) =>
        avail.getOrElse(b, 0L) * w / wb
      }.min,
      maxN.getOrElse(Long.MaxValue))
    val quotas = targetWeights.map { case (b, wb) => (b, nStar * wb / w) }
    val maxQ = quotas.map(_._2).max
    if (maxQ == 0L) binned.drop("__bin").limit(0)
    else {
      val qdf = quotas.toDF("__bin", "__quota")
      topKPerGroup(binned, col("__bin"),
          lit(0.0) - hashUnit(key), key.asc, maxQ.toInt)
        .join(broadcast(qdf), Seq("__bin"))
        .where(col("rank") <= col("__quota"))
        .drop("__bin", "__quota", "rank")
    }
  }

  /** Deterministic weighted sample WITHOUT replacement (Efraimidis–
    * Spirakis A-ES): each row draws a reproducible uniform u from its
    * key and is ranked by `-ln(u) / weight` ascending — the classical
    * exponential-jitter formulation of "select n with probability
    * proportional to weight, no replacement". Rows with `weight <= 0`
    * or null are excluded. The rank score is rounded to 9 decimals
    * (with the key as tiebreak) so the float `ln` agrees across engines
    * — the same cross-engine rounding discipline as the aggregate
    * oracles.
    *
    * u is derived as (md5-prefix + 0.5) / 2^32, strictly inside (0,1),
    * so `ln` never sees 0 (Spark yields null there, other engines -inf
    * — an engine-visible divergence this parameterization removes).
    *
    * Same skew-proof two-phase top-n as [[quotaSample]]: the global
    * top-n is a subset of the per-input-partition top-n, so no single
    * reducer ever sees more than n × P candidate rows. */
  def weightedSample(df: DataFrame, key: Column, weight: Column, n: Int)
      : DataFrame = {
    val u = (conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val score = round(-log(u) / weight.cast("double"), 9)
    twoPhaseTopN(
      df.where(weight.isNotNull && weight > 0).withColumn("__s", score),
      Seq.empty, Seq(col("__s").asc, key.asc), n)
      .drop("__rn", "__s")
  }

  /** Exact curriculum binning: assign every row to one of `nBins`
    * contiguous buckets of a global (order)-sort — `ntile(nBins)`
    * semantics exactly (the first `total % nBins` buckets get one extra
    * row), but WITHOUT ntile's single-task global window: the global
    * row index comes from [[Packing.withGlobalPrefix]]'s range-sort +
    * two-phase broadcast prefix, then the bin is a closed-form
    * expression. `bin` is 1-based like ntile. The standard shape for
    * curriculum learning (train easy→hard by quality/length deciles).
    *
    * `order` must be a total order for a deterministic result — pass
    * `struct(score, id)` to break score ties. */
  def curriculumBins(df: DataFrame, order: Column, nBins: Int)
      : DataFrame = {
    require(nBins > 0, "nBins must be positive")
    val (idxed, _, total) = Packing.withGlobalPrefixTotals(df, order,
      lit(0L), offsetName = "__off", idxName = "__idx")
    val q = total / nBins
    val r = total % nBins
    val qSafe = math.max(q, 1L) // r == total when q == 0: branch unused
    val idx = col("__idx")
    val bin = when(idx < lit((q + 1) * r),
        floor(idx / lit(q + 1)).cast("long"))
      .otherwise(lit(r) +
        floor((idx - lit((q + 1) * r)) / lit(qSafe)).cast("long"))
    idxed.withColumn("bin", bin + 1L).drop("__off", "__idx")
  }

  /** Group-wise top-k by an arbitrary ordering ("the k best documents
    * per domain by quality score"): the k rows per group with the
    * HIGHEST `order` values, ties broken by the tiebreak column
    * ascending for a deterministic result on any engine.
    *
    * Same skew-proof two-phase shape as [[quotaSample]]: phase 1 ranks
    * per (group, input-partition) — salted by partition id, so one
    * giant group spreads over the cluster — and phase 2 re-ranks the
    * surviving ≤ k × P candidates per group. Any global top-k row is a
    * top-k row of its own partition, so phase 1 never drops a winner. */
  def topKPerGroup(df: DataFrame, group: Column, order: Column,
      tiebreak: Column, k: Int): DataFrame =
    // tiebreak passes through VERBATIM — callers may hand a SortOrder
    // (e.g. col("label").asc); wrapping it again breaks evaluation
    twoPhaseTopN(df.withColumn("__o", order),
      Seq(group), Seq(col("__o").desc, tiebreak), k)
      .withColumnRenamed("__rn", "rank")
      .drop("__o")

  /** Per-stratum nucleus (top-p) selection: keep the highest-weight
    * rows of each stratum until at least fraction `p` of the stratum's
    * total integer weight is covered. The cut is WEIGHT-ATOMIC — every
    * row tied at the boundary weight is kept — which is both the
    * deterministic choice (no arbitrary tie order) and the scalable
    * one: the cumulative scan runs over the per-(stratum, weight)
    * HISTOGRAM, never over rows.
    *
    * Scale shape: one map-side-combined histogram aggregation (output
    * ∝ distinct weight values, not corpus size), a window over that
    * small histogram to find each stratum's threshold weight, then a
    * broadcast threshold join + filter — a pure map stage over the
    * corpus. No per-stratum row sort anywhere, so a skewed stratum
    * costs nothing extra. Integer weights keep the cumulative masses
    * exact (`p * total` is one double product — engine-portable).
    *
    * Edge semantics (fail-loud / explicit, not silent): a NEGATIVE
    * weight corrupts the cumulative-mass scan, so it raises at
    * execution time; an ALL-ZERO stratum carries no mass, and the
    * weight-atomic rule keeps every row tied at its only weight — the
    * whole stratum survives rather than silently vanishing. */
  def topPPerGroup(df: DataFrame, stratum: Column, key: Column,
      weight: Column, p: Double): DataFrame = {
    require(p > 0.0 && p <= 1.0, "need 0 < p <= 1")
    val w0 = weight.cast("long")
    val w = when(w0 < 0L, raise_error(concat(
      lit("topPPerGroup: negative weight "), w0.cast("string")))
      .cast("long")).otherwise(w0)
    val hist = df.select(stratum.as("__s"), w.as("__w"))
      .groupBy(col("__s"), col("__w"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__m", col("__w") * col("__c"))
    val byWDesc = Window.partitionBy(col("__s")).orderBy(col("__w").desc)
    val thresholds = hist
      .withColumn("__cumBefore", coalesce(sum(col("__m")).over(
        byWDesc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__tot",
        sum(col("__m")).over(Window.partitionBy(col("__s"))))
      // all-zero stratum: tot = 0 makes `cumBefore < p*tot` vacuously
      // false — keep its (single, zero-weight) histogram row explicitly
      // so the stratum survives instead of silently vanishing
      .where(col("__cumBefore") < lit(p) * col("__tot") ||
        col("__tot") === 0L)
      .groupBy(col("__s"))
      .agg(min(col("__w")).as("__wmin"))
    df.select(stratum.as("stratum"), key.as("id"), w.as("weight"))
      .join(broadcast(thresholds), col("stratum") === col("__s"))
      .where(col("weight") >= col("__wmin"))
      .select(col("stratum"), col("id"), col("weight"))
  }

  /** Per-group quantile buckets of a score — the CCNet head/middle/
    * tail shape for perplexity-based corpus partitioning, generalized
    * to any ascending `fractions` (k fractions → k+1 buckets; bucket 0
    * holds the LOWEST scores). The cut is BIN-ATOMIC at
    * `round(score, binDecimals)` resolution: every row in a score bin
    * lands in the same bucket — the deterministic choice (no arbitrary
    * tie order inside a bin) and the scalable one.
    *
    * Scale shape (the [[topPPerGroup]] histogram pattern): one
    * map-side-combined count aggregation to the (group, bin) histogram,
    * one cumulative window over that histogram (rows ∝ groups × bins,
    * never corpus size), then a broadcast label join back — a pure map
    * stage over the corpus. A skewed group costs nothing extra.
    * Boundaries are `ceil(f · n)` row counts: with binary-exact
    * fractions (1/4, 1/2, …) the product is exact on any engine.
    *
    * Output: (group, id, score_bin, bucket). */
  def bucketByScoreBins(df: DataFrame, group: Column, key: Column,
      score: Column, fractions: Seq[Double], binDecimals: Int = 2)
      : DataFrame = {
    require(fractions.nonEmpty &&
      fractions.forall(f => f > 0.0 && f < 1.0) &&
      fractions == fractions.sorted,
      "fractions must be ascending within (0, 1)")
    val b = df.select(group.as("group"), key.as("id"),
      round(score, binDecimals).as("score_bin"))
    val hist = b.groupBy(col("group"), col("score_bin"))
      .agg(count(lit(1)).as("__c"))
    val byBin = Window.partitionBy(col("group"))
      .orderBy(col("score_bin").asc)
    val cum = hist
      .withColumn("__cumBefore", coalesce(sum(col("__c")).over(
        byBin.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n",
        sum(col("__c")).over(Window.partitionBy(col("group"))))
    // a bin's bucket = how many boundaries its cumulative-before count
    // has crossed; the bin CONTAINING a boundary stays below it
    val bucket = fractions.map(f =>
        when(col("__cumBefore") >= ceil(lit(f) * col("__n")), 1L)
          .otherwise(0L))
      .reduce(_ + _)
    val labels = cum.select(col("group"), col("score_bin"),
      bucket.cast("long").as("bucket"))
    b.join(broadcast(labels), Seq("group", "score_bin"))
      .select(col("group"), col("id"), col("score_bin"), col("bucket"))
  }

  /** Exact lower median per group over an integer column, computed on
    * the (group, value) COUNT histogram: smallest v whose cumulative
    * count reaches ⌈n/2⌉. Engine-exact (no interpolation) and
    * histogram-scale — the window sees distinct values, never rows. */
  private def lowerMedian(b: DataFrame, vcol: String, out: String)
      : DataFrame = {
    val hist = b.groupBy(col("group"), col(vcol))
      .agg(count(lit(1)).as("__c"))
    val byV = Window.partitionBy(col("group")).orderBy(col(vcol).asc)
    hist
      .withColumn("__cum", sum(col("__c")).over(
        byV.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__n",
        sum(col("__c")).over(Window.partitionBy(col("group"))))
      .where(col("__cum") >= expr("(__n + 1) div 2"))
      .groupBy(col("group")).agg(min(col(vcol)).as(out))
  }

  /** Robust per-group outlier detection by median absolute deviation:
    * a row is an outlier when |value − median| > k · MAD, with both
    * the median and the MAD as EXACT lower medians of the integer
    * value — the distribution-free alternative to z-scores for
    * quality-metric filtering (an extreme tail cannot drag its own
    * threshold the way it drags a mean/σ). Output: one row per input
    * (group, id, value, med, dev, mad, outlier).
    *
    * Scale shape: two histogram median passes ([[lowerMedian]]: the
    * ordered window runs over distinct values per group, not rows) and
    * two broadcast joins back — the corpus is touched by pure map
    * stages only. Degenerate MAD = 0 (over half the group at one
    * value) flags EVERY deviating row — the strict, documented choice.
    * All arithmetic is integer until the one k·MAD comparison. */
  def madOutliers(df: DataFrame, group: Column, key: Column,
      value: Column, k: Double = 3.0): DataFrame = {
    require(k > 0.0, "k must be positive")
    val b = df.select(group.as("group"), key.as("id"),
      value.cast("long").as("value"))
    val med = lowerMedian(b, "value", "med")
    val withDev = b.join(broadcast(med), Seq("group"))
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = lowerMedian(withDev.select(col("group"), col("dev")),
      "dev", "mad")
    withDev.join(broadcast(mad), Seq("group"))
      .select(col("group"), col("id"), col("value"), col("med"),
        col("dev"), col("mad"),
        (col("dev") > lit(k) * col("mad")).as("outlier"))
  }

  /** Water-filling token-budget allocation across domains: given each
    * domain's available token count and one total `budget`, find the
    * unique integer cap `c` such that every domain receives
    * `quota = min(avail, c)` and the total allocated is the largest
    * value ≤ budget of that form — the standard fair-mixture solver
    * (small domains keep everything, large domains are clipped at a
    * common ceiling). The derived quotas feed [[tokenBudgetSample]]
    * as its per-domain budget map. Tokens the cap leaves unallocated
    * (< number of clipped domains) stay unallocated — deterministic,
    * rather than distributed by an arbitrary tie rule.
    *
    * Scale shape: ONE map-side-combined aggregation over the corpus to
    * the per-domain token totals; everything after runs on that domain
    * histogram (rows = domain count, never corpus size) — an ordered
    * window and a 1-row broadcast of the solved cap. All arithmetic is
    * integer-exact, so the result is engine-portable bit-for-bit.
    *
    * Output: (domain, avail, quota). */
  def waterfillBudget(df: DataFrame, domain: Column, tokens: Column,
      budget: Long): DataFrame = {
    require(budget >= 0L, "budget must be non-negative")
    val a = df.groupBy(domain.as("domain"))
      .agg(sum(tokens.cast("long")).as("avail"))
    // the ascending-availability prefix that can be FULLY funded:
    // domain i (1-based, asc by (avail, domain)) is funded iff giving
    // its avail to it and every remaining domain still fits the
    // remaining budget: avail_i · (n − i + 1) ≤ budget − S_{i−1};
    // fundedness is monotone along the order, so `k = max funded i`
    // defines the cap segment and c = ⌊(budget − S_k) / (n − k)⌋
    val byAvail = Window.orderBy(col("avail").asc, col("domain").asc)
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    // pin the domain histogram (rows = domain count — tiny): the cap
    // solve and the final projection both read it, and without the pin
    // the corpus aggregation runs once per branch
    val ranked = a
      .withColumn("__i", row_number().over(byAvail))
      .withColumn("__sb", coalesce(sum(col("avail")).over(
        byAvail.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__funded",
        col("avail") * (col("__n") - col("__i") + 1L) <=
          lit(budget) - col("__sb"))
      .localCheckpoint(true)
    // the cap is THREE scalars of a bounded histogram — solve it on
    // the driver and attach as literals (no second plan branch at all)
    val capRow = ranked.agg(
      coalesce(max(when(col("__funded"), col("__i"))), lit(0L)),
      coalesce(max(when(col("__funded"), col("__sb") + col("avail"))),
        lit(0L)),
      max(col("__n"))).collect()(0)
    if (capRow.isNullAt(2)) // empty input: no domains, no quotas
      return ranked.select(col("domain"), col("avail"),
        col("avail").as("quota"))
    val (k, sk, nn) =
      (capRow.getLong(0), capRow.getLong(1), capRow.getLong(2))
    val quota =
      if (k == nn) col("avail")
      else least(col("avail"), lit((budget - sk) / (nn - k)))
    ranked.select(col("domain"), col("avail"), quota.as("quota"))
  }

  // ---- importance resampling (DSIR) --------------------------------------

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how much more likely its tokens are under a TARGET
    * distribution than under the raw-corpus distribution, using
    * hashed-unigram bag models —
    * w(doc) = Σ_tokens [ln p̂(bucket) − ln q̂(bucket)], with p̂/q̂ the
    * add-one-smoothed bucket frequencies of the target / raw corpora.
    * Selecting the top-weight raw docs shifts a generic crawl toward
    * the target domain — the standard pretraining data-selection
    * recipe. Returns (id, n_toks, dsir_w) for every doc with ≥ 1 token.
    *
    * Engine-portable determinism: buckets use the repo's md5-hex
    * convention (`bigint(md5(token)[0,15)) % buckets` — replayable in
    * any engine with an md5), bucket counts are exact integers, each
    * bucket's log-ratio is ONE float ln of an exact rational (round-9,
    * a B-row table), and the per-doc weight is a ≤ B-term sum of
    * count·logratio products (round-6) — the aggregate-rounding
    * discipline of the rest of the gate.
    *
    * Scale shape: one token explode + one map-side-combined (id,
    * bucket) count per corpus pass; the bucket model is ≤ `buckets`
    * rows — broadcast back; nothing corpus-sized ever meets a window
    * or the driver. The target corpus is typically small (it rides the
    * same aggregation); the raw corpus is the 100 TB side and touches
    * exactly one shuffle keyed by (id, bucket). */
  def dsirWeights(df: DataFrame, idCol: Column, textCol: Column,
      isTarget: Column, buckets: Int = 256): DataFrame =
    dsirWeightsWithModel(df, idCol, textCol,
      buildDsirModel(df, idCol, textCol, isTarget, buckets))

  /** The DSIR bucket model as standing state: exact integer (raw,
    * target) counts per hashed-unigram bucket. Counts add
    * associatively, so batch models FOLD to the bit-identical model
    * ([[foldDsirModel]]) — the same incremental discipline as the BM25
    * accumulator and the PCA moments. ≤ `buckets` rows. */
  case class DsirModel(counts: DataFrame, buckets: Int)

  /** Build the bucket model for one document batch: one token explode
    * + one map-side-combined (bucket) count. */
  def buildDsirModel(df: DataFrame, idCol: Column, textCol: Column,
      isTarget: Column, buckets: Int = 256): DsirModel = {
    require(buckets >= 2, "need at least 2 hash buckets")
    val counts = df.select(isTarget.as("__t"),
        explode(TextAnalysis.tokens(textCol)).as("token"))
      .withColumn("bucket",
        conv(substring(md5(col("token")), 1, 15), 16, 10)
          .cast("long") % buckets)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cr"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("ctg"))
    DsirModel(counts, buckets)
  }

  /** Fold a batch model into the standing one — one aggregation over
    * ≤ 2·buckets rows, NEVER a corpus rescan; integer adds are
    * associative, so any batching folds to the bit-identical model. */
  def foldDsirModel(a: DsirModel, b: DsirModel): DsirModel = {
    require(a.buckets == b.buckets,
      s"bucket counts differ: ${a.buckets} vs ${b.buckets}")
    DsirModel(a.counts.unionByName(b.counts)
      .groupBy(col("bucket"))
      .agg(sum(col("cr")).as("cr"), sum(col("ctg")).as("ctg")),
      a.buckets)
  }

  /** Score documents against a (possibly folded) standing model. */
  def dsirWeightsWithModel(df: DataFrame, idCol: Column,
      textCol: Column, model0: DsirModel): DataFrame = {
    val buckets = model0.buckets
    val toks = df.select(idCol.as("id"),
        explode(TextAnalysis.tokens(textCol)).as("token"))
      .withColumn("bucket",
        conv(substring(md5(col("token")), 1, 15), 16, 10)
          .cast("long") % buckets)
    val docBucket = toks.groupBy(col("id"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val model = model0.counts
    val totals = model.agg(sum(col("cr")).as("tr"),
      sum(col("ctg")).as("tt"))
    val logRatio = model.crossJoin(broadcast(totals))
      .select(col("bucket"),
        // ln(p̂/q̂) with add-one smoothing, as one ln of the exact
        // cross-multiplied rational — absent-from-target buckets get
        // the smoothed floor instead of -inf
        // multiply as DOUBLE: the cross-product of two corpus-total
        // longs overflows int64 at real scale; double mul is an exact
        // IEEE op both engines share
        round(log(
          ((col("ctg") + 1L).cast("double") *
            (col("tr") + buckets).cast("double")) /
            ((col("cr") + 1L).cast("double") *
              (col("tt") + buckets).cast("double"))),
          9).as("lr"))
    // a scored doc may hit a bucket the standing model never saw (new
    // vocabulary): both smoothed counts floor to 1, so its log-ratio
    // is ln((tr+B)/(tt+B)) — joined LEFT and coalesced, never dropped
    val floorLr = round(log((col("tr") + buckets).cast("double") /
      (col("tt") + buckets).cast("double")), 9)
    docBucket.crossJoin(broadcast(totals))
      .join(broadcast(logRatio), Seq("bucket"), "left")
      .withColumn("__lr", coalesce(col("lr"), floorLr))
      .groupBy(col("id"))
      // c·lr is an EXACT decimal (integer × 9-decimal rational): the
      // weight sum accumulates order-free, so dsir_w is bit-stable for
      // EVERY doc — a double Σ(c·lr) flips its round-6 on boundary
      // docs with summation order, which the top-50 outputs tolerate
      // but any all-docs aggregate (ESS) does not
      .agg(sum(col("c")).as("n_toks"),
        round(sum(col("c").cast("decimal(20,0)") *
          col("__lr").cast("decimal(15,9)")), 6)
          .cast("double").as("dsir_w"))
  }

  /** Deterministic DSIR selection: the `n` highest-weight documents
    * (weight desc, id asc — the engine's total-order tiebreak), via the
    * skew-proof two-phase top-n. The greedy top-n variant of DSIR's
    * Gumbel resampling — reproducible run to run, which is what a
    * gated data pipeline wants. */
  def dsirSelect(weights: DataFrame, n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    twoPhaseTopN(weights, Seq.empty,
      Seq(col("dsir_w").desc, col("id").asc), n)
      .withColumnRenamed("__rn", "rank")
  }

  /** Effective sample size of an importance-weighted corpus — the
    * one-row diagnostic that tells you whether a DSIR-style reweighting
    * still carries signal (ESS ≈ n: weights are flat, selection is
    * meaningless; ESS ≪ n: a handful of docs dominate, variance blows
    * up): ESS = (Σ eʷ)² / Σ e²ʷ, computed on MAX-SHIFTED exponents
    * (e^{w−max}) so nothing overflows at any weight scale — the shift
    * cancels exactly in the ratio. Returns (n_docs, ess, ess_ratio).
    *
    * Determinism: the max is an exact reduction over the round-6
    * weights; each exponent is one IEEE exp of an exact difference,
    * rounded to 9 and accumulated as exact DECIMAL — a double Σe over
    * the corpus WILL eventually land on a rounding boundary and flip
    * with summation order (it did, at sf0.1); decimal sums are
    * order-free. Only the final ratio is a double. One map stage + one
    * all-reduce. */
  def effectiveSampleSize(weights: DataFrame, logWeight: Column)
      : DataFrame = {
    // pin the projected weights ONCE (eager localCheckpoint of one
    // double per row): the max branch and the sum scan both read this
    // plan, and without the pin each would re-run the full upstream —
    // fed from dsirWeights that is the whole tokenize+shuffle DSIR
    // pass, twice
    val w = weights.select(logWeight.cast("double").as("__w"))
      .localCheckpoint(true)
    val mx = w.agg(max(col("__w")).as("__mx"))
    val e9 = round(exp(col("__w") - col("__mx")), 9)
    w.crossJoin(broadcast(mx))
      .select(e9.cast("decimal(20,9)").as("__e"),
        round(e9 * e9, 9).cast("decimal(20,9)").as("__e2"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__e")).cast("double").as("__s1"),
        sum(col("__e2")).cast("double").as("__s2"))
      .select(col("n_docs"),
        round(col("__s1") * col("__s1") / col("__s2"), 6).as("ess"),
        round(col("__s1") * col("__s1") / col("__s2") /
          col("n_docs").cast("double"), 6).as("ess_ratio"))
  }

  /** Gumbel-top-k sampling WITHOUT replacement ∝ exp(logWeight) — the
    * sampling DSIR actually prescribes (the greedy [[dsirSelect]] is
    * its zero-temperature limit): perturb each row's log-weight with
    * deterministic Gumbel noise g = −ln(−ln u) and take the top `n`
    * perturbed scores; by the Gumbel-max trick the selected set is an
    * exact weighted sample without replacement. u derives from
    * md5(key) exactly as [[weightedSample]]'s uniform — reproducible
    * run to run AND engine-portable, strictly inside (0,1) so neither
    * ln sees 0. Perturbed scores round-9 with key-asc tiebreak (the
    * cross-engine float discipline); one map stage + the skew-proof
    * two-phase top-n. Returns the selected rows with (gumbel_score,
    * rank). */
  def gumbelTopK(df: DataFrame, key: Column, logWeight: Column, n: Int)
      : DataFrame = {
    require(n >= 1, "n must be >= 1")
    val u = (conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val g = round(logWeight.cast("double") - log(-log(u)), 9)
    twoPhaseTopN(df.withColumn("gumbel_score", g),
      Seq.empty, Seq(col("gumbel_score").desc, key.asc), n)
      .withColumnRenamed("__rn", "rank")
  }
}
