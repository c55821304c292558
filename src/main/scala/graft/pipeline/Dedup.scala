package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication operators for 100 TB-scale corpora.
  *
  * Every near-dup path is BUCKETED — candidates come from equi-joins on
  * LSH band keys / simhash chunks, never an all-pairs crossJoin. The
  * candidate step is the only shuffle; verification is an equi-join back
  * to per-doc state. Expansion factors are tunable (bands × rows,
  * chunks) so the same plan runs at any corpus size.
  */
object Dedup {

  /** Exact duplicates by content hash: one row per duplicated content
    * (hash, n copies, min doc id as keeper). Map-side combine via
    * groupBy — the canonical exact-dedup shape. */
  def exactDuplicates(df: DataFrame, idCol: Column, textCol: Column)
      : DataFrame =
    df.groupBy(md5(textCol).as("content_hash"))
      .agg(count(lit(1)).as("n"), min(idCol).as("keep_id"))
      .where(col("n") > 1)

  /** The engine's ONE content-normalization rule for exact dedup:
    * lowercase, trim, collapse whitespace runs. Batch and streaming
    * dedup share this definition so they can never disagree on what
    * counts as a duplicate. */
  def normalizedText(textCol: Column): Column =
    regexp_replace(lower(trim(textCol)), "\\s+", " ")

  /** Exact duplicates after whitespace/case normalization. */
  def normalizedDuplicates(df: DataFrame, idCol: Column, textCol: Column)
      : DataFrame =
    exactDuplicates(df, idCol, normalizedText(textCol))

  // ---- MinHash + LSH ---------------------------------------------------

  /** Deterministic seeds for the k min-hash "permutations". */
  private[pipeline] def seeds(k: Int): Seq[Long] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(k)(rnd.nextLong())
  }

  /** k-element MinHash signature over a shingle array column. Computed
    * entirely inside one expression tree (no explode): shingle → base
    * hash → per-seed re-hash `xxhash64(h ⊕ seed)` → array_min.
    *
    * The per-seed hash must be a full avalanche mix: an affine map
    * `(a*h+b) mod P` with products below ~2P barely wraps and stays
    * order-preserving, collapsing every min-hash onto the same
    * min-base-hash element (observed agreement 0.46 where J=0.94 —
    * a one-in-1e22 event under real permutations). */
  def minhashSignature(shingleCol: Column, k: Int = 128): Column = {
    val seedCol = typedLit(seeds(k))
    val baseHashes = transform(shingleCol, s => xxhash64(s))
    when(size(shingleCol) > 0,
      transform(seedCol, seed =>
        array_min(transform(baseHashes,
          h => xxhash64(h.bitwiseXOR(seed))))))
      .otherwise(lit(null))
  }

  /** Engine-portable MinHash signature: per-seed hash
    * `bigint(md5(shingle || ':' || seed)[0,15))` (the repo's md5-hex
    * cross-engine convention, 60-bit positive) → array_min. ~an order
    * of magnitude more hashing than [[minhashSignature]]'s xxhash64
    * path — the price of being replayable bit-for-bit in any engine
    * with an md5(), which is what lets [[lshCandidateEval]] put the
    * CANDIDATE SET itself (not just the verified output) under the
    * cross-engine oracle. */
  def portableMinhashSignature(shingleCol: Column, k: Int): Column = {
    require(k >= 1 && k <= 64, "k in [1,64] — each seed re-hashes the set")
    when(size(shingleCol) > 0,
      array((0 until k).map(i =>
        array_min(transform(shingleCol, s =>
          conv(substring(md5(concat(s, lit(s":$i"))), 1, 15), 16, 10)
            .cast("long")))): _*))
      .otherwise(lit(null))
  }

  /** Candidate-quality evaluation of MinHash-LSH against exact Jaccard
    * truth — the "measure your approximation before trusting it"
    * harness. Returns ONE summary row: true-pair count at `threshold`,
    * LSH candidate-pair count (UNverified — the raw banding output),
    * their intersection, and integer precision/recall ppm. Run this at
    * a pilot scale factor before committing a (k, bands, rows) choice
    * to a 100 TB dedup pass: recall_ppm is the fraction of real
    * near-dup pairs the banding would even consider.
    *
    * Both sides are deterministic and engine-portable: candidates come
    * from [[portableMinhashSignature]] banding (no hot-bucket cap —
    * a cap would bias the measurement; eval corpora are pilot-sized),
    * truth from the prefix-filtered exact [[jaccardNearDuplicates]].
    * The expensive stages are the same bucketed shapes as the
    * production path; the final count is one full-outer join of two
    * pair tables. */
  def lshCandidateEval(df: DataFrame, idCol: Column, textCol: Column,
      threshold: Double, shingleSize: Int = 3, k: Int = 16,
      bands: Int = 4, rows: Int = 4): DataFrame = {
    require(bands * rows <= k, "bands*rows must not exceed k")
    val docs = df.select(idCol.as("id"),
      TextAnalysis.shingles(textCol, shingleSize).as("sh"))
      .where(size(col("sh")) > 0)
    val sigs = docs.select(col("id"),
      portableMinhashSignature(col("sh"), k).as("sig"))
    val cand = candidatePairs(lshBands(sigs, col("id"), col("sig"),
      bands, rows))
    val truth = jaccardNearDuplicates(df, idCol, textCol, threshold,
      shingleSize).select(col("id_a"), col("id_b"))
    cand.withColumn("__c", lit(1L))
      .join(truth.withColumn("__t", lit(1L)), Seq("id_a", "id_b"),
        "full_outer")
      .agg(sum(coalesce(col("__t"), lit(0L))).as("n_true"),
        sum(coalesce(col("__c"), lit(0L))).as("n_candidates"),
        sum(when(col("__c").isNotNull && col("__t").isNotNull, 1L)
          .otherwise(0L)).as("n_hit"))
      .select(col("n_true"), col("n_candidates"), col("n_hit"),
        when(col("n_candidates") > 0,
          expr("n_hit * 1000000 div n_candidates")).otherwise(0L)
          .as("precision_ppm"),
        when(col("n_true") > 0,
          expr("n_hit * 1000000 div n_true")).otherwise(0L)
          .as("recall_ppm"))
  }

  /** (id, band_id, band) rows — the LSH banding step. Docs agreeing on
    * any full band become candidates. */
  def lshBands(df: DataFrame, idCol: Column, signatureCol: Column,
      bands: Int, rows: Int): DataFrame =
    df.where(signatureCol.isNotNull)
      .select(idCol.as("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => slice(signatureCol, b * rows + 1, lit(rows)))))
      .toDF("id", "band_id", "band")

  /** Candidate pairs: equi-join on (band_id, band) — bucketed, never
    * all-pairs. Returns distinct (id_a < id_b).
    *
    * `maxBandWidth` is the hot-bucket safety valve for web-scale
    * corpora: a degenerate band shared by w documents contributes
    * w²/2 candidate pairs (one stopword-ish signature pattern over a
    * billion docs is a joined-table explosion no cluster survives).
    * Buckets wider than the cap are dropped BEFORE the self-join,
    * bounding the join output by bands × cap²/2 per bucket. Recall
    * cost is negligible for real near-dups: at J ≥ 0.8 with 32×4
    * banding a pair agrees on ~13 bands in expectation, so it still
    * meets in a non-degenerate bucket. */
  def candidatePairs(bands: DataFrame,
      maxBandWidth: Int = Int.MaxValue): DataFrame = {
    // normalize POSITIONALLY first — the function's contract is any
    // 3-column (id, band_id, band)-shaped frame, independent of names
    val named = bands.toDF("id", "band_id", "band")
    val pruned =
      if (maxBandWidth == Int.MaxValue) named
      else {
        val narrow = named.groupBy("band_id", "band")
          .agg(count(lit(1)).as("__w"))
          .where(col("__w") <= maxBandWidth)
          .select("band_id", "band")
        // a using-join moves the join keys first — restore the
        // (id, band_id, band) order the positional toDF below expects
        named.join(narrow, Seq("band_id", "band"))
          .select("id", "band_id", "band")
      }
    val a = pruned.toDF("id_a", "band_id", "band")
    val b = pruned.toDF("id_b", "band_id", "band")
    a.join(b, Seq("band_id", "band"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Exact Jaccard verification of candidate pairs against per-doc
    * shingle sets. */
  def verifyJaccard(pairs: DataFrame, docShingles: DataFrame,
      threshold: Double): DataFrame =
    verifyJaccardSides(pairs, docShingles, docShingles, threshold)

  /** [[verifyJaccard]] generalized to DIFFERENT shingle tables per pair
    * side (e.g. new-batch ids vs standing-corpus ids) — one copy of the
    * inter/union/threshold semantics. */
  private[pipeline] def verifyJaccardSides(pairs: DataFrame,
      shinglesA: DataFrame, shinglesB: DataFrame, threshold: Double)
      : DataFrame = {
    val sa = shinglesA.toDF("id_a", "sh_a")
    val sb = shinglesB.toDF("id_b", "sh_b")
    pairs.join(sa, "id_a").join(sb, "id_b")
      .withColumn("inter",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni",
        (size(col("sh_a")) + size(col("sh_b"))).cast("double") - col("inter"))
      .withColumn("jaccard",
        when(col("uni") > 0, col("inter") / col("uni")).otherwise(lit(0.0)))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: shingle → signature → bands →
    * bucketed candidates → exact-Jaccard verify.
    *
    * Default bands×rows = 32×4: miss probability (1-(1-J^rows)^bands) is
    * < 5e-8 at J=0.8 and < 1e-3 at J=0.65 — effectively exact recall for
    * thresholds ≥ 0.7 while keeping false-candidate volume low (4-hash
    * band agreement ≈ J^4). For lower thresholds drop `rows` to 2 and
    * accept more candidates.
    */
  /** Signature table — same values as [[minhashSignature]], computed by
    * the native [[graft.expressions.MinHashSigExpr]] kernel: one
    * codegen'd map stage, NO shuffle (the earlier explode + k
    * min-aggregates shape shuffled every shingle row; the interpreted
    * array-fold shape was an order of magnitude slower still). Docs with
    * an empty shingle array are dropped (they have no signature). */
  def minhashSignatureTable(docShingles: DataFrame, k: Int): DataFrame =
    docShingles.toDF("id", "sh")
      .select(col("id"),
        graft.expressions.native.minhashSig(col("sh"), seeds(k)).as("sig"))
      .where(col("sig").isNotNull)

  /** Explode + k codegen'd min-aggregates formulation (kept for
    * cross-validation of the native kernel). */
  private[graft] def minhashSignatureTableExploded(docShingles: DataFrame,
      k: Int): DataFrame = {
    val ss = seeds(k)
    val exploded = docShingles.toDF("id", "sh")
      .select(col("id"), explode(col("sh")).as("s"))
      .withColumn("h", xxhash64(col("s")))
    val aggs = ss.zipWithIndex.map { case (seed, i) =>
      min(xxhash64(col("h").bitwiseXOR(lit(seed)))).as(s"m$i")
    }
    exploded.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
      .select(col("id"),
        array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  def nearDuplicates(df: DataFrame, idCol: Column, textCol: Column,
      threshold: Double, shingleSize: Int = 3, k: Int = 128,
      bands: Int = 32, rows: Int = 4,
      maxBandWidth: Int = Int.MaxValue): DataFrame = {
    require(bands * rows <= k, "bands*rows must not exceed k")
    // the shingle table feeds three branches (signatures + both verify
    // sides) — cache it so the scan+shingling runs once
    val docs = df.select(idCol.as("id"),
      TextAnalysis.shingles(textCol, shingleSize).as("sh"))
      .where(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val signatures = minhashSignatureTable(docs, k)
    val pairs = candidatePairs(
      lshBands(signatures, col("id"), col("sig"), bands, rows),
      maxBandWidth)
    // materialize the verified pairs (tiny by construction: actual
    // near-dups) while the shingle cache is alive, then RELEASE the big
    // intermediate — long-lived sessions must not accumulate shingle
    // caches across calls
    val out = verifyJaccard(pairs, docs.select(col("id"), col("sh")),
      threshold).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    docs.unpersist()
    out
  }

  /** EXACT n-gram-Jaccard near-dup pairs via prefix filtering (the
    * AllPairs/PPJoin candidate rule). Unlike MinHash-LSH this has
    * guaranteed recall: if J(A,B) ≥ t, then in ANY global total order on
    * the shingle universe the first `|S| - ⌈t·|S|⌉ + 1` elements of A
    * and of B must intersect — so indexing only those prefix elements
    * and equi-joining on them finds every qualifying pair, at a fraction
    * of the inverted-index volume (1-t of it, ~20% at t=0.8).
    *
    * The canonical order is GLOBAL DOCUMENT FREQUENCY ascending (hash
    * as tiebreak) — the AllPairs/PPJoin rarest-first rule. The
    * pigeonhole recall argument holds for ANY fixed order (the
    * minimum common element of A∩B must sit in both prefixes), but
    * the order choice governs candidate VOLUME: a hash order is
    * content-independent yet puts globally-frequent shingles into
    * prefixes, and each frequent prefix shingle costs df² candidate
    * pairs — measured at sf10 (500k short docs), hash-ordered
    * prefixes exploded into a >60 GB candidate spill where the
    * df-ordered join finishes in seconds, the same 8.5× super-linear
    * growth the containment path's probe measured before it moved to
    * df order. The df table is one extra map-side-combined
    * aggregation over the shingle rows — linear, and the difference
    * between quadratic and output-sized candidates at 100 TB. Hash
    * collisions can only ADD candidates (two shingles merging raises
    * hash-set Jaccard above true Jaccard), never drop a true pair;
    * the exact-Jaccard verification step removes them. Two shuffles
    * for candidates (df + the prefix join), one equi-join back for
    * verification — same 100 TB shape as the LSH paths, with the
    * candidate volume governed by the prefix rule instead of
    * band-collision probability.
    */
  def jaccardNearDuplicates(df: DataFrame, idCol: Column, textCol: Column,
      threshold: Double, shingleSize: Int = 3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0,1]")
    val docs = df.select(idCol.as("id"),
      TextAnalysis.shingles(textCol, shingleSize).as("sh"))
      .where(size(col("sh")) > 0)
      // distinct-hash view of the shingle set (prefix rule counts |H|)
      .withColumn("hs",
        array_distinct(transform(col("sh"), s => xxhash64(s))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val eh = docs.select(col("id"), size(col("hs")).as("n"),
      explode(col("hs")).as("h"))
    val dfreq = eh.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val prefix = eh.join(dfreq, Seq("h"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
          .orderBy(col("df").asc, col("h").asc)))
      .where(col("rk") <=
        col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select(col("id"), col("h"))
    val pairs = prefix.toDF("id_a", "h")
      .join(prefix.toDF("id_b", "h"), Seq("h"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val out = verifyJaccard(pairs, docs.select(col("id"), col("sh")),
      threshold).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    docs.unpersist()
    out
  }

  /** EXACT shingle-containment pairs: every ordered pair (a, b) with
    * |S(a) ∩ S(b)| / |S(a)| ≥ t — the ASYMMETRIC near-dup relation
    * Jaccard misses. A 100-word excerpt quoted inside a 10 000-word
    * page has Jaccard ≈ 0.01 but containment ≈ 1.0: this is the
    * quote / subset / boilerplate-inclusion detector, the C(A,B) of
    * the set-similarity-join literature.
    *
    * Candidate rule (the asymmetric prefix filter): if C(A,B) ≥ t then
    * in any FIXED global total order on the shingle universe the first
    * `|A| - ⌈t·|A|⌉ + 1` elements of A must intersect B's FULL set —
    * only the probe side gets prefix-truncated (the indexed side can't
    * be, which is exactly why this costs more than the symmetric
    * Jaccard prefix join and why the threshold governs the probe
    * volume). The order used is GLOBAL DOCUMENT FREQUENCY ascending
    * (hash as tiebreak) — the PPJoin rarest-first rule: the pigeonhole
    * recall argument holds for any fixed order, and df-ascending makes
    * each probe hit the SMALLEST postings lists, which is the
    * difference between linear and quadratic growth on a corpus full
    * of near-copies (ScaleProbe measured 8.5× super-linear per-doc
    * growth at 10× under hash-ordered prefixes; df-ordered probes cut
    * candidate volume to ≈ output size). Hash-collision caveat: unlike
    * the symmetric Jaccard prefix (where merging shingles can only
    * raise similarity, so collisions only ADD candidates), here an
    * xxhash64 collision INSIDE one doc's shingle set shrinks both
    * |H(A)| and the hashed intersection, so a pair sitting exactly at
    * the threshold can in principle be dropped — probability
    * ~|shingles|²·2⁻⁶⁴ per doc, negligible in practice but the recall
    * guarantee is modulo 64-bit collisions, not absolute. The exact
    * verify removes all false positives either way.
    *
    * Scale shape: one df aggregation + one (hash) equi-join for
    * candidates + one array-intersect verify over pair rows — no
    * all-pairs stage, and the per-doc prefix window partitions by doc
    * id (bounded by the doc's own shingle count). Output: (id_a, id_b,
    * inter, n_a, containment_ppm) — integer-exact, id_a ≠ id_b, BOTH
    * directions reported when both qualify (the relation is
    * asymmetric). */
  def containmentPairs(df: DataFrame, idCol: Column, textCol: Column,
      minPpm: Long, shingleSize: Int = 3): DataFrame = {
    require(minPpm > 0L && minPpm <= 1000000L,
      "minPpm must be in (0, 1000000]")
    val docs = df.select(idCol.as("id"),
      TextAnalysis.shingles(textCol, shingleSize).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("hs",
        sort_array(array_distinct(transform(col("sh"), s => xxhash64(s)))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the qualifying-intersection floor is ⌈(minPpm/1e6)·n⌉ — computed
    // in EXACT integer arithmetic (`div`): a float `ceil(t · n)` can
    // land one ulp above the true rational and silently shorten the
    // prefix below the recall-safe bound
    val prefLen = expr(
      s"cast(size(hs) - ((cast(size(hs) as bigint) * $minPpm + 999999)" +
        " div 1000000) + 1 as int)")
    val index = docs.select(col("id").as("id_b"),
      explode(col("hs")).as("h"))
    val dfTab = index.groupBy(col("h")).agg(count(lit(1)).as("__df"))
    val byRarity = Window.partitionBy(col("id"))
      .orderBy(col("__df").asc, col("h").asc)
    val probe = docs.select(col("id"), prefLen.as("__pl"),
        explode(col("hs")).as("h"))
      .join(dfTab, "h")
      .withColumn("__rk", row_number().over(byRarity))
      .where(col("__rk") <= col("__pl"))
      .select(col("id").as("id_a"), col("h"))
    val pairs = probe.join(index, Seq("h"))
      .where(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val sa = docs.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val sb = docs.select(col("id").as("id_b"), col("sh").as("sh_b"))
    val out = pairs.join(sa, "id_a").join(sb, "id_b")
      .withColumn("inter",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("n_a", size(col("sh_a")).cast("long"))
      .withColumn("containment_ppm",
        expr("inter * 1000000 div n_a"))
      .where(col("containment_ppm") >= minPpm)
      .select(col("id_a"), col("id_b"), col("inter"), col("n_a"),
        col("containment_ppm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    docs.unpersist()
    out
  }

  /** Containment dedup APPLY path: the kept corpus under the
    * drop-if-dominated rule, computed WITHOUT materializing the
    * O(K²) pair relation [[containmentPairs]] emits. A document `a`
    * is dropped iff some other document `b` absorbs it:
    * |S(a) ∩ S(b)| · 10⁶ div |S(a)| ≥ `minPpm` AND `b` outranks `a`
    * in the keeper order (more distinct shingles, smaller id on ties).
    * The keeper order is a strict total order, so the rule is
    * well-defined without iteration; like [[deduplicate]], a dropped
    * document may itself dominate others (drop-if-dominated-by-ANY,
    * the same single-pass semantics as the Jaccard `deduplicate` —
    * not a transitive keeper chain). Documents with NO shingles
    * (under `shingleSize` tokens) carry no signature and are always
    * kept.
    *
    * Why this exists: on a corpus full of near-copies the pair
    * RELATION is quadratic per replica group (sf10 measured ~50 M
    * pairs ≈ 90 GB for a corpus whose keep/drop answer is ~1 M rows) —
    * a 100 TB excerpt-dedup pass needs the DECISION, not the pairs.
    * And the decision needs only ONE witness per dropped document, so
    * the algorithm is WITNESS-SENSITIVE rather than pair-complete:
    *
    *  1. Prefix filter over RAW shingle strings (df-ascending global
    *     order — absolute recall, no hash-collision caveat): if b
    *     absorbs a, b shares at least one of a's `|A| − ⌈t·|A|⌉ + 1`
    *     rarest shingles (pigeonhole, any fixed order).
    *  2. NEAREST-FIRST CURSOR probing. Postings of prefix shingles
    *     are ranked by the keeper order (n desc, id asc) — so for any
    *     doc a, the postings that COULD absorb it (priority above
    *     a's) are exactly the contiguous head of each list, ranks
    *     1..rank(a)−1. The drop rule is dominated-by-ANY, so the
    *     ENUMERATION ORDER inside that window is free — and each
    *     cursor probes it BOTTOM-UP, nearest bigger doc first
    *     (offset o = 1 is rank(a)−1), because on a replica corpus the
    *     absorber is overwhelmingly the SLIGHTLY-bigger sibling, not
    *     the corpus giant that happens to share a shingle: probing
    *     head-first, sf10 spent three full rounds (137 M candidate
    *     pairs, ranks 8–64) confirming nothing. Rounds proceed
    *     driver-steered (the pageRank/kCore loop discipline): in
    *     round r each still-undecided doc verifies the next batch of
    *     offsets of each prefix cursor — a hashed-prefilter +
    *     exact-array-intersect on those ≤ prefixLen·batch candidate
    *     pairs — and every dominated doc leaves the live set the
    *     moment ONE witness confirms. Batch doubles per round, so a
    *     cursor whose witness sits at bottom-up offset d finishes in
    *     ≤ log₂ d rounds at ≤ 2× d probes.
    *
    * On a replica-heavy corpus (the sf10 shape that OOM-killed the
    * pair-complete formulation at ~98 GB of shuffle) round 1 already
    * drops near-every non-top family member — its offset-1 posting IS
    * the next-bigger sibling — leaving live ∝ families; nothing
    * pair-shaped is ever persisted, returned, or collected, and
    * per-round state (live cursor rows, ∝ docs × prefixLen) is
    * checkpoint-rotated like every iterative operator here. Returns
    * the kept rows of `df` unchanged (the [[cdcDeduplicate]] output
    * contract). */
  def containmentDeduplicate(df: DataFrame, idCol: Column,
      textCol: Column, minPpm: Long, shingleSize: Int = 3,
      maxRounds: Int = 64): DataFrame = {
    require(minPpm > 0L && minPpm <= 1000000L,
      "minPpm must be in (0, 1000000]")
    val L = graft.util.Lineage
    val docs = df.select(idCol.as("id"),
      TextAnalysis.shingles(textCol, shingleSize).as("sh0"))
      .where(size(col("sh0")) > 0)
      .select(col("id"), sort_array(array_distinct(col("sh0"))).as("sh"))
      .withColumn("n", size(col("sh")).cast("long"))
      // hashed twin of the shingle set, for the verify PREFILTER: the
      // long arrays are ~3x smaller than the shingle strings on the
      // wire, and the verify join is the algorithm's dominant shuffle
      .withColumn("shh",
        sort_array(transform(col("sh"), x => xxhash64(x))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    // the prefilter is EXACT-COMPLETE only if xxhash64 is injective
    // within every doc's shingle set (then |h(A)∩h(B)| ≥ |A∩B| always
    // — hashing can merge cross terms, never split shared ones — so
    // stage 1 admits every true drop and stage 2's exact string
    // intersect removes the rare cross-collision false positive).
    // One scan proves it; a 64-bit intra-doc collision is ~2⁻⁴⁴ even
    // at 10⁶ shingles per doc, but if it ever fires this must not
    // silently under-drop:
    require(docs.where(size(array_distinct(col("shh"))) =!=
        size(col("sh"))).isEmpty,
      "containmentDeduplicate: xxhash64 collision inside one document's " +
        "shingle set — the hashed verify prefilter cannot guarantee " +
        "completeness on this corpus; raise shingleSize")
    val elems = docs.select(col("id"), col("n"), explode(col("sh")).as("t"))
    // document frequency as a PARTIAL aggregate (map-side combine →
    // vocabulary-sized shuffle), then joined back — deliberately NOT a
    // count-over-window, which would shuffle the whole exploded
    // element table by t with no combine and sort hot shingles'
    // partitions (measured ~15% slower end-to-end when tried)
    val dfTab = elems.groupBy(col("t")).agg(count(lit(1)).as("__df"))
    // recall-safe prefix length in EXACT integer arithmetic (the
    // containmentPairs discipline): |A| - ceil(t·|A|) + 1
    val prefLen = expr(
      s"cast(n - ((n * $minPpm + 999999) div 1000000) + 1 as int)")
    val byRarity = Window.partitionBy(col("id"))
      .orderBy(col("__df").asc, col("t").asc)
    val prefix = elems
      .join(dfTab, "t")
      .withColumn("__rk", row_number().over(byRarity))
      .where(col("__rk") <= prefLen)
      .select(col("id").as("id_a"), col("n").as("n_a"), col("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    prefix.count()
    // priority-ranked postings, built ONLY for shingles some prefix
    // uses (rare by df-asc construction — the window never sees a
    // stop-shingle's postings list)
    val ranked = elems
      .join(prefix.select(col("t")).distinct(), Seq("t"), "left_semi")
      .withColumn("__rk", row_number().over(Window.partitionBy(col("t"))
        .orderBy(col("n").desc, col("id").asc)))
      .select(col("t"), col("id").as("id_b"), col("__rk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ranked.count()

    // each cursor's qualifying depth is known UP FRONT: a doc sits in
    // its own prefix shingles' postings, so the postings that outrank
    // it are exactly ranks 1..(own rank − 1) — carry __m = rank(a)−1
    // per (doc, prefix shingle) and a cursor dies (and a fully
    // exhausted doc is KEPT and leaves the live set) the moment the
    // window passes __m. A replica-family keeper is rank 1 of its own
    // shingles (__m = 0): it exits round 1 instead of riding every
    // round to the global max posting depth.
    val live0 = prefix
      .join(ranked.withColumnRenamed("id_b", "id_a"), Seq("t", "id_a"))
      .select(col("id_a"), col("t"),
        (col("__rk") - 1).cast("long").as("__m"))
      .where(col("__m") > 0)
    val dropped = cursorDrops(live0, ranked,
      docs.select(col("id"), col("sh"), col("shh")), minPpm, maxRounds)
    try {
      val out = df.join(dropped, idCol === col("__drop_id"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count()
      out
    } finally {
      L.release(dropped)
      docs.unpersist(); prefix.unpersist(); ranked.unpersist()
    }
  }

  /** The witness-sensitive nearest-first cursor loop shared by
    * [[containmentDeduplicate]] and the streaming twin
    * (`StreamingContainmentDedup`). Inputs: `live0` — one cursor per
    * (probe doc, prefix shingle) as (id_a, t, __m) with __m = the
    * number of qualifying (keeper-order-higher) postings in t's list,
    * all > 0; `ranked` — postings (t, id_b, __rk) ranked per t by the
    * keeper order (n desc, id asc); `sets` — (id, sh, shh) for exact
    * verification (shh: the xxhash64 twin, intra-doc injectivity
    * already proven by the caller). Drop rule: id_a is dropped iff
    * some candidate posting (ranks 1..__m of a cursor's list) passes
    * the exact containment test. Probes run BOTTOM-UP (offset 1 =
    * rank __m, the nearest bigger doc — on replica corpora the
    * absorber) in doubling windows with early exit the moment one
    * witness confirms; verification is two-stage (hashed prefilter,
    * exact string intersect). Returns the dropped ids as a PINNED
    * (__drop_id) frame — the caller releases it.
    *
    * Window sizing is BUDGETED, not fixed: each round's window is
    * `max(doubling schedule, candidateBudget / live cursors)` — when
    * the live set is corpus-sized (sf10 round 1, ~10⁶ cursors) that is
    * the plain nearest-first doubling with its ≤2× probe bound, and as
    * the live set collapses the window widens so a handful of
    * stragglers don't buy log₂(depth) more driver-steered rounds whose
    * ~0.3 s scheduling floor dwarfs their candidate joins. Probe
    * overshoot per round is ≤ candidateBudget rows through the
    * (t, rank) equi-join — bounded at any scale. */
  /** Mutable per-call observability for [[cursorDrops]] (scale-probe
    * instrumentation: rounds run and cumulative candidate pairs probed
    * — the work terms a fold's wall should be proportional to).
    * Counting candidates costs one extra action per round, so it only
    * happens when a holder is passed (or the debug channel is on). */
  final class CursorLoopStats {
    var rounds: Int = 0
    var candidatePairs: Long = 0L
  }

  private[graft] def cursorDrops(live0: DataFrame, ranked: DataFrame,
      sets: DataFrame, minPpm: Long, maxRounds: Int = 64,
      candidateBudget: Long = 1L << 20,
      stats: Option[CursorLoopStats] = None): DataFrame = {
    val L = graft.util.Lineage
    val setsA = sets.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val setsB = sets.select(col("id").as("id_b"), col("sh").as("sh_b"))
    val setsHA = sets.select(col("id").as("id_a"), col("shh").as("shh_a"))
    val setsHB = sets.select(col("id").as("id_b"), col("shh").as("shh_b"))
    var live = live0.localCheckpoint(true)
    var liveN = live.count()
    // dropped is a UNION of per-round checkpointed verified frames —
    // checkpointing only the round's (small) increment instead of
    // re-materializing the whole growing union every round
    val droppedParts =
      scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val emptyDropped: DataFrame = live0
      .select(col("id_a").as("__drop_id"))
      .where(lit(false)).localCheckpoint(true)
    def dropped: DataFrame =
      (emptyDropped +: droppedParts.toSeq).reduce(_ unionByName _)
    var lo = 1L
    var batch = 1L
    var round = 0
    val debug = sys.props.contains("graft.debug.containment")
    // fail-loud exits (maxRounds, any mid-round failure) must not
    // leave the pinned state behind — mirror pageRankConverged's
    // try/finally; on success only `live` (empty by then) is released
    // and the pinned `dropped` is returned
    try {
      while (liveN > 0) {
        require(round < maxRounds,
          s"containment cursorDrops did not converge in $maxRounds " +
            "rounds — raise maxRounds (cursor depth grows log2(max " +
            "posting))")
        // budgeted window (see scaladoc): the doubling schedule is the
        // floor, and a collapsed live set widens to spend the round's
        // candidate budget instead of buying more rounds
        val batchEff = math.max(batch,
          candidateBudget / math.max(liveN, 1L))
        // bottom-up offsets lo..lo+batchEff-1 from the cursor's own
        // rank: offset o probes rank __m − o + 1, so the round's window
        // is ranks [__m − (lo+batchEff−1) + 1, __m − lo + 1] ∩ [1, __m]
        // — exactly the next untested qualifying postings, nearest
        // bigger doc first. Each cursor EXPLODES its window ranks so
        // the postings join stays a plain (t, rank) equi-join (a
        // per-cursor range predicate against the unsliced postings
        // would fan the t-join out to full posting lists before
        // filtering)
        val hi = lo + batchEff - 1
        val cand = live
          .withColumn("__rk", explode(sequence(
            greatest(col("__m") - hi + 1L, lit(1L)),
            col("__m") - lo + 1L)))
          .join(ranked, Seq("t", "__rk"))
          .select(col("id_a"), col("id_b")).distinct()
        // debug/stats-only: must count before the generation swap
        // releases cand's parent checkpoints
        val candN = if (debug || stats.nonEmpty) cand.count() else 0L
        stats.foreach { s => s.rounds += 1; s.candidatePairs += candN }
        // two-stage verify: (1) hashed prefilter — admits every true
        // drop (intra-doc injectivity proven by the caller), long
        // arrays on the wire; (2) exact string intersect on the
        // survivors only (true drops + the ~never cross-collision
        // false positive)
        val prelim = cand
          .join(setsHA, Seq("id_a")).join(setsHB, Seq("id_b"))
          .where(expr("size(array_intersect(shh_a, shh_b)) * 1000000L " +
            s"div size(shh_a) >= $minPpm"))
          .select(col("id_a"), col("id_b"))
        val verified = prelim
          .join(setsA, Seq("id_a")).join(setsB, Seq("id_b"))
          .where(expr("size(array_intersect(sh_a, sh_b)) * 1000000L " +
            s"div size(sh_a) >= $minPpm"))
          .select(col("id_a").as("__drop_id")).distinct()
          .localCheckpoint(true)
        droppedParts += verified
        // surviving cursors: anti-join against THIS round's drops only
        // — live already excludes every earlier round's drops (the
        // invariant this line maintains), so re-scanning the whole
        // accumulated drop set each round bought nothing
        val nextLive = live
          // cursor still has candidates
          .where(col("__m") >= lo + batchEff)
          .join(verified, col("id_a") === col("__drop_id"), "left_anti")
          .localCheckpoint(true)
        L.release(live)
        live = nextLive
        liveN = live.count() // the loop guard; also sizes the window
        lo += batchEff
        batch = batchEff * 2
        round += 1
        if (debug)
          println(s"  [containment] round=$round lo=$lo " +
            s"live=$liveN dropped=${dropped.count()} " +
            s"cand=$candN")
      }
      dropped
    } catch {
      case t: Throwable =>
        L.release(dropped); throw t
    } finally L.release(live)
  }

  /** [[containmentPairs]] generalized to a pre-exploded ELEMENT table
    * (id, elem) — for signatures that aren't text shingles: keyframe
    * hashes of a video, chunk fingerprints of a file, feature ids of a
    * record. Returns every ordered pair with
    * |E(a) ∩ E(b)| · 10⁶ div |E(a)| ≥ minPpm as (id_a, id_b, inter,
    * n_a, containment_ppm) — integer-exact, both directions when both
    * qualify.
    *
    * Scale shape: one map-side-combined distinct + per-id count, one
    * inverted-index self-join on the element (candidates ∝
    * Σ_elem df(elem)², the usual postings bound — a pathologically hot
    * element is the caller's signal to lengthen the signature), one
    * pair-count aggregation. Nothing all-pairs, no driver state. */
  def elementContainmentPairs(elems: DataFrame, minPpm: Long)
      : DataFrame = {
    require(minPpm > 0L && minPpm <= 1000000L,
      "minPpm must be in (0, 1000000]")
    val e = elems.toDF("id", "elem").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = e.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val shared = e.toDF("id_a", "elem")
      .join(e.toDF("id_b", "elem"), Seq("elem"))
      .where(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    val out = shared
      .join(counts.toDF("id_a", "n_a"), "id_a")
      .withColumn("containment_ppm", expr("inter * 1000000 div n_a"))
      .where(col("containment_ppm") >= minPpm)
      .select(col("id_a"), col("id_b"), col("inter"), col("n_a"),
        col("containment_ppm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    e.unpersist()
    out
  }

  /** Corpus-level deduplication: drop every document that near-matches a
    * lower-id document (exact dups at Jaccard 1.0 included). The keeper
    * of each duplicate cluster is its smallest id (any doc appearing as
    * the higher id of a verified pair is dropped — transitively this
    * keeps one representative per connected chain). Anti-join against
    * the pair table: fully distributed, no driver state. */
  def deduplicate(df: DataFrame, idCol: Column, textCol: Column,
      threshold: Double, shingleSize: Int = 3, k: Int = 128,
      bands: Int = 32, rows: Int = 4): DataFrame = {
    val pairs = nearDuplicates(df, idCol, textCol, threshold, shingleSize,
      k, bands, rows)
    val drop = pairs.select(col("id_b").as("__drop_id")).distinct()
    df.join(drop, idCol === col("__drop_id"), "leftanti")
  }

  // ---- substring (token-window) dedup ----------------------------------

  /** Exact duplicated token spans across documents: every distinct
    * `windowTokens`-token window (stride 1) shared verbatim by at least
    * `minDocs` documents — the substring-level signal that document-hash
    * dedup misses (boilerplate paragraphs, license blocks, quoted
    * passages duplicated inside otherwise-distinct documents; the
    * motivation behind suffix-array training-data dedup).
    *
    * Windows come from the native shingle kernel (distinct per document,
    * one codegen'd pass), are md5-keyed, and meet ONE map-side-combined
    * aggregation; the shuffle carries (span_hash, partial doc count) —
    * never document text. Returns `(span_hash, n_docs)`. At 100 TB the
    * span table is token-count-proportional: use a larger window or a
    * pre-filter (e.g. only docs that shared a fingerprint band) to bound
    * it; the aggregation itself has no hot key worse than the most
    * duplicated span. */
  def duplicatedSpans(df: DataFrame, textCol: Column,
      windowTokens: Int, minDocs: Long = 2L): DataFrame =
    df.select(explode(
        TextAnalysis.shingles(textCol, windowTokens)).as("__span"))
      .select(md5(col("__span")).as("span_hash"))
      .groupBy(col("span_hash"))
      .agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") >= minDocs)

  /** Which documents contain which duplicated spans — `(id, span_hash)`
    * rows for every span meeting `minDocs`, the locate step a span-cut
    * pass downstream needs. Second scan + semi-join against the
    * (already small) duplicated-span table. */
  def duplicatedSpanOccurrences(df: DataFrame, idCol: Column,
      textCol: Column, windowTokens: Int, minDocs: Long = 2L): DataFrame = {
    val spans = df.select(idCol.as("id"), explode(
        TextAnalysis.shingles(textCol, windowTokens)).as("__span"))
      .select(col("id"), md5(col("__span")).as("span_hash"))
    spans.join(
      duplicatedSpans(df, textCol, windowTokens, minDocs)
        .select("span_hash"),
      Seq("span_hash"), "leftsemi")
  }

  /** ExactSubstr-style span CUTTING (the apply step after
    * [[duplicatedSpans]] locates repeats — Lee et al.'s "Deduplicating
    * Training Data Makes Language Models Better" rule): every
    * `windowTokens`-token window repeated anywhere in the corpus keeps
    * only its FIRST occurrence (min packed (doc, pos) — intra-doc
    * repeats included); every other occurrence's token range is cut
    * from its document and the survivors are reassembled in order.
    * Overlapping windows of a long repeated region union into one cut,
    * so the whole region vanishes from non-owner documents while the
    * owner keeps one intact copy.
    *
    * Scale shape: the occurrence table is token-count-proportional but
    * carries (hash, packed position) — never text; ownership is ONE
    * map-side-combined aggregation (min + count per distinct span);
    * the cut list returns doc-keyed (bounded by the doc's own window
    * count) and reassembly is a per-row higher-order filter — the
    * exists() scan is O(tokens·cuts) per document, both bounded by
    * document length, so the stage stays scan-shaped. Returns
    * (doc_id, n_tokens, n_cut, clean_text). */
  def cutDuplicatedSpans(df: DataFrame, idCol: Column, textCol: Column,
      windowTokens: Int): DataFrame = {
    require(windowTokens >= 2, s"window must be >= 2, got $windowTokens")
    val w = windowTokens
    // null text = no tokens: a null array would turn size() into -1
    // and feed sequence() a descending range downstream
    val base = df.select(idCol.as("doc_id"),
      coalesce(TextAnalysis.tokens(textCol),
        array().cast("array<string>")).as("__toks"))
    val occ = base.where(size(col("__toks")) >= w)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(col("__toks")) - w),
          i => md5(concat_ws(" ", slice(col("__toks"), i + 1, lit(w))))))
          .as(Seq("pos", "span_hash")))
      .select(col("doc_id"), col("pos"), col("span_hash"),
        (col("doc_id") * lit(LineIdxSpan) + col("pos")).as("occ_key"))
    val owners = occ.groupBy("span_hash")
      .agg(min("occ_key").as("owner_key"), count(lit(1)).as("n_occ"))
    val cuts = occ.join(owners, Seq("span_hash"))
      .where(col("n_occ") >= 2L && col("occ_key") =!= col("owner_key"))
      .groupBy("doc_id")
      .agg(collect_list(col("pos")).as("__cuts"))
    val cutArr = coalesce(col("__cuts"),
      array().cast("array<int>"))
    // sequence(0, -1) is a DESCENDING range in Spark — an empty token
    // array must short-circuit to an empty index list
    val keptIdx = when(size(col("__toks")) > 0,
      filter(
        sequence(lit(0), size(col("__toks")) - 1),
        t => !exists(cutArr, p => t >= p && t < p + w)))
      .otherwise(array().cast("array<int>"))
    base.join(cuts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        (size(col("__toks")) - size(keptIdx)).cast("long").as("n_cut"),
        concat_ws(" ",
          transform(keptIdx,
            t => element_at(col("__toks"), t + 1))).as("clean_text"))
  }

  // ---- line-level dedup (C4 / RefinedWeb pass) -------------------------

  /** First-owner key of a line occurrence: lexicographic (doc, idx)
    * packed into one BIGINT so min() resolves ownership in a single
    * map-side-combined aggregation. Documents are bounded well below
    * `LineIdxSpan` lines (posexplode indexes, not tokens).
    * PRECONDITION of every packed-key operator ([[dedupLines]],
    * [[cutDuplicatedSpans]]): doc ids are NON-NEGATIVE — a negative id
    * would invert the packed lexicographic order. */
  private val LineIdxSpan = 1000000L

  private def lineTable(df: DataFrame, idCol: Column,
      textCol: Column, sep: String): DataFrame =
    // null text = empty document (one empty line) — posexplode over a
    // null array would silently DROP the document from the output
    df.select(idCol.as("doc_id"),
        posexplode(split(coalesce(textCol, lit("")), sep))
          .as(Seq("idx", "line")))
      .select(col("doc_id"), col("idx"), col("line"),
        md5(col("line")).as("line_hash"),
        (col("doc_id") * lit(LineIdxSpan) + col("idx")).as("occ_key"))

  /** Cross-document exact line deduplication — the C4/RefinedWeb pass
    * that document-hash dedup misses entirely: navigation chrome,
    * cookie banners, license headers duplicated across otherwise
    * distinct pages. Every distinct line keeps exactly its FIRST
    * occurrence (lowest (doc, idx), a total order, so the survivor set
    * is engine- and partitioning-independent); all later occurrences
    * corpus-wide are dropped and each document is reassembled from its
    * surviving lines in original order.
    *
    * Two shuffles, neither carrying text twice: ownership is one
    * aggregation over (line_hash → min packed occurrence) — map-side
    * combined, state one row per DISTINCT line; the occurrence table
    * then joins that compact owner table and reassembly is one
    * doc-keyed aggregation (sorted struct collect — bounded by the
    * document's own line count). No hot key worse than the most
    * duplicated line, and that key's aggregation state is a single
    * min. Returns (doc_id, n_lines, n_kept, clean_text). */
  def dedupLines(df: DataFrame, idCol: Column, textCol: Column,
      sep: String = "\n"): DataFrame = {
    val lines = lineTable(df, idCol, textCol, sep)
    val owners = lines.groupBy("line_hash")
      .agg(min("occ_key").as("owner_key"))
    dedupLinesAgainst(lines, owners, sep)
  }

  private def dedupLinesAgainst(lines: DataFrame, owners: DataFrame,
      sep: String): DataFrame =
    lines.join(owners, Seq("line_hash"))
      .withColumn("__keep", col("occ_key") === col("owner_key"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        concat_ws(sep,
          transform(
            sort_array(collect_list(
              when(col("__keep"), struct(col("idx"), col("line"))))),
            x => x.getField("line"))).as("clean_text"))

  /** Standing first-occurrence index for incremental line dedup: one
    * row per distinct line hash with its minimal packed occurrence.
    * Per-key min is associative, so batch indexes fold to exactly the
    * one-shot index for ANY batch split — the [[graft.pipeline]]
    * merge-law contract ingestion pipelines rely on. */
  final case class LineIndex(owners: DataFrame)

  def buildLineIndex(df: DataFrame, idCol: Column, textCol: Column,
      sep: String = "\n"): LineIndex =
    LineIndex(lineTable(df, idCol, textCol, sep)
      .groupBy("line_hash").agg(min("occ_key").as("owner_key")))

  def foldLineIndex(a: LineIndex, b: LineIndex): LineIndex =
    LineIndex(a.owners.unionByName(b.owners)
      .groupBy("line_hash").agg(min("owner_key").as("owner_key")))

  /** Rewrite a batch against a standing index that already includes
    * the batch (fold it in first): identical output shape and — when
    * the index equals the one-shot corpus index — identical output to
    * [[dedupLines]] on the full corpus restricted to the batch. */
  def dedupLinesWithIndex(df: DataFrame, idCol: Column, textCol: Column,
      index: LineIndex, sep: String = "\n"): DataFrame =
    dedupLinesAgainst(lineTable(df, idCol, textCol, sep), index.owners, sep)

  // ---- incremental dedup against a standing corpus ---------------------

  /** Precomputed LSH state of a standing corpus, reusable across many
    * incremental batches: the banded signatures (candidate-join side)
    * and the shingle sets (verification side). Both persisted — at
    * 100 TB this is the "dedup index" a curation service keeps warm,
    * a few hundred bytes per document. */
  final case class CorpusIndex(bands: DataFrame, shingles: DataFrame,
      shingleSize: Int, k: Int, bandCount: Int, rowsPerBand: Int) {
    def unpersist(): Unit = { bands.unpersist(); shingles.unpersist() }
  }

  def buildCorpusIndex(df: DataFrame, idCol: Column, textCol: Column,
      shingleSize: Int = 3, k: Int = 128, bands: Int = 32, rows: Int = 4)
      : CorpusIndex = {
    require(bands * rows <= k, "bands*rows must not exceed k")
    val docs = df.select(idCol.as("id"),
      TextAnalysis.shingles(textCol, shingleSize).as("sh"))
      .where(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = lshBands(minhashSignatureTable(docs, k), col("id"),
      col("sig"), bands, rows)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    banded.count() // materialize both (bands pull the shingle cache)
    CorpusIndex(banded, docs, shingleSize, k, bands, rows)
  }

  /** Near-dup matches of NEW documents against the standing corpus:
    * (new_id, corpus_id, jaccard). The new side is typically one
    * micro-batch — small — so its bands broadcast into the equi-join
    * against the (large, persisted) corpus bands; verification touches
    * only candidates. This is the incremental-ingest dedup shape: cost
    * per batch is proportional to the batch, not the corpus. */
  def matchAgainstIndex(newDocs: DataFrame, idCol: Column, textCol: Column,
      index: CorpusIndex, threshold: Double): DataFrame = {
    val nd = newDocs.select(idCol.as("id"),
      TextAnalysis.shingles(textCol, index.shingleSize).as("sh"))
      .where(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val newBands = lshBands(minhashSignatureTable(nd, index.k), col("id"),
      col("sig"), index.bandCount, index.rowsPerBand)
    val pairs = broadcast(newBands.toDF("new_id", "band_id", "band"))
      .join(index.bands.toDF("corpus_id", "band_id", "band"),
        Seq("band_id", "band"))
      .select(col("new_id").as("id_a"), col("corpus_id").as("id_b"))
      .distinct()
    val out = verifyJaccardSides(pairs, nd, index.shingles, threshold)
      .select(col("id_a").as("new_id"), col("id_b").as("corpus_id"),
        round(col("jaccard"), 6).as("jaccard"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    nd.unpersist()
    out
  }

  // ---- duplicate clusters (connected components) -----------------------

  /** Connected components over a pair table — distributed iterative
    * min-label propagation with pointer jumping.
    *
    * Each round every node takes the minimum label among itself and its
    * neighbors (one equi-join + one min-aggregate), then compresses
    * `lbl → label(lbl)` (pointer jumping), so convergence needs
    * O(log diameter) rounds rather than O(diameter). Each round's state
    * is one (node, label) row per node — never edges × labels — and is
    * persisted + materialized so no lineage re-computation compounds
    * across rounds. Near-dup graphs are unions of small cliques/chains,
    * so in practice this converges in 2–4 rounds regardless of corpus
    * size; the shuffle volume per round is |V| + |E|, the same as one
    * candidate-join pass.
    *
    * Returns one row per node appearing in `pairs`:
    * (id, lbl = smallest node id of its component).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // each round's state must be BOTH materialized and lineage-truncated:
    // the pointer-jump self-join doubles the logical plan per round, so
    // plain persist() (which keeps lineage) grows the plan exponentially
    var labels = edges.select(col("src").as("id"), col("src").as("lbl"))
      .distinct()
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // min over self + neighbor labels
      val viaNbr = edges.join(labels.toDF("dst", "lbl"), "dst")
        .select(col("src").as("id"), col("lbl"))
      val propagated = labels.unionAll(viaNbr)
        .groupBy("id").agg(min("lbl").as("lbl"))
      // pointer jumping: follow the label one more hop (labels are node
      // ids, so every lbl resolves; coalesce guards the frontier)
      // EAGER checkpoint: the changed-check below short-circuits
      // (limit(1)), so a lazy checkpoint would leave partitions
      // unmaterialized when the predecessor's blocks are released —
      // and with a REAL release (Lineage), those partitions then
      // recompute through the evicted round, degrading the loop to
      // quadratic work (caught by the r12 bench: dedup_semdedup
      // 2.3 s → 10 s). Full materialization BEFORE the release keeps
      // every round one hop deep
      // the convergence probe rides INSIDE the round's checkpoint as a
      // flag column (propagated's id set equals labels' — viaNbr ids
      // are edge srcs — so the inner join drops nothing): the separate
      // probe join paid a second action per round whose only output
      // was one boolean
      val next = propagated
        .join(propagated.toDF("jid", "jlbl"), col("lbl") === col("jid"), "left")
        .select(col("id"), coalesce(col("jlbl"), col("lbl")).as("lbl"))
        .join(labels.toDF("id", "prev"), "id")
        .select(col("id"), col("lbl"),
          (col("lbl") =!= col("prev")).as("__chg"))
        .localCheckpoint(true)
      val changed = next.where(col("__chg")).limit(1).count()
      graft.util.Lineage.release(labels)
      labels = next.select(col("id"), col("lbl"))
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels
  }

  /** Duplicate-cluster assignment: one row per document participating in
    * a verified near-dup pair, labeled with its cluster representative
    * (the smallest doc id of its connected component). This is the
    * transitive completion of [[deduplicate]]'s pairwise view — A≈B and
    * B≈C land A, B, C in one cluster even when A≉C directly. */
  def duplicateClusters(df: DataFrame, idCol: Column, textCol: Column,
      threshold: Double, shingleSize: Int = 3, k: Int = 128,
      bands: Int = 32, rows: Int = 4): DataFrame = {
    val pairs = nearDuplicates(df, idCol, textCol, threshold, shingleSize,
      k, bands, rows)
    connectedComponents(pairs.select(col("id_a"), col("id_b")))
      .select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
  }

  // ---- SimHash ---------------------------------------------------------

  /** Default 32-bit token hash: xxhash64 folded to 32 bits (fastest). */
  val xxTokenHash32: Column => Column =
    t => pmod(xxhash64(t), lit(1L << 32))

  /** Cross-engine 32-bit token hash: first 8 hex chars of md5. Same value
    * is computable in any engine with an md5() (DuckDB:
    * `CAST('0x' || substr(md5(tok),1,8) AS BIGINT)`), which makes
    * simhash output externally verifiable. Still a codegen'd Column
    * expression — md5 costs more than xxhash64 but stays fully
    * distributed. */
  val md5TokenHash32: Column => Column =
    t => conv(substring(md5(t), 1, 8), 16, 10).cast("long")

  /** 32-bit SimHash over a token array: per bit, sum ±1 votes of each
    * token hash; the sign vector packs into one long. Literal-shift
    * unrolling keeps every op ANSI-safe and codegen-friendly. */
  def simhash32(tokenCol: Column): Column = {
    val hashes = transform(tokenCol, xxTokenHash32)
    val bits = (0 until 32).map { b =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + shiftrightunsigned(h, b).bitwiseAND(1L) * 2L - 1L)
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Distributed simhash — same result as [[simhash32]]. For the two
    * standard token hashes the native [[graft.expressions.SimHash32Expr]]
    * kernel computes each document's value in one pass (no explode, no
    * 32-aggregate shuffle); a custom `tokenHash` falls back to the
    * explode + vectorized-aggregation shape. */
  def simhashTable(df: DataFrame, idCol: Column, textCol: Column,
      tokenHash: Column => Column = xxTokenHash32): DataFrame =
    if (tokenHash eq xxTokenHash32)
      df.select(idCol.as("id"),
        graft.expressions.native.simhash32(textCol, useMd5 = false).as("sim"))
    else if (tokenHash eq md5TokenHash32)
      df.select(idCol.as("id"),
        graft.expressions.native.simhash32(textCol, useMd5 = true).as("sim"))
    else simhashTableExploded(df, idCol, textCol, tokenHash)

  /** Explode + vectorized aggregation formulation of [[simhashTable]]
    * (generic over the token hash; also the native kernel's
    * cross-validation reference). */
  private[graft] def simhashTableExploded(df: DataFrame, idCol: Column,
      textCol: Column, tokenHash: Column => Column = xxTokenHash32)
      : DataFrame = {
    val exploded = df.select(idCol.as("id"),
      explode(TextAnalysis.tokens(textCol)).as("tok"))
      .withColumn("h", tokenHash(col("tok")))
    val voteAggs = (0 until 32).map { b =>
      sum(shiftrightunsigned(col("h"), b).bitwiseAND(1L) * 2L - 1L)
        .as(s"v$b")
    }
    val packed = (0 until 32).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    exploded.groupBy(col("id")).agg(voteAggs.head, voteAggs.tail: _*)
      .select(col("id"), packed.as("sim"))
  }

  /** SimHash near-dup pairs: bucket on 8-bit chunks (any doc pair within
    * hamming distance 3 of a 32-bit hash agrees on at least one of the 4
    * chunks — pigeonhole), then verify the true distance. */
  def simhashNearDuplicates(df: DataFrame, idCol: Column, textCol: Column,
      maxHamming: Int = 3,
      tokenHash: Column => Column = xxTokenHash32): DataFrame = {
    // persist the (tiny: one row per doc) simhash table — it feeds both
    // join sides, and without it each side would re-hash every token
    val sims = simhashTable(df, idCol, textCol, tokenHash)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one generator per row instead of a 4-way unionAll (which would
    // re-evaluate the simhash per branch): chunk_id = array position
    val chunks = sims.select(col("id"), col("sim"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("sim"), 8 * c).bitwiseAND(0xFFL)): _*)))
      .toDF("id", "sim", "chunk_id", "chunk")
    val a = chunks.toDF("id_a", "sim_a", "chunk_id", "chunk")
    val b = chunks.toDF("id_b", "sim_b", "chunk_id", "chunk")
    val out = a.join(b, Seq("chunk_id", "chunk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming(col("sim_a"), col("sim_b")).as("hamming"))
      // filter BEFORE the dedup shuffle: only near pairs reach distinct()
      .where(col("hamming") <= maxHamming)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize the (near-pair-sized) output, then release the
    // per-doc table — long-lived sessions must not accumulate caches
    out.count()
    sims.unpersist()
    out
  }

  /** Near-dup pairs under Hamming distance over ANY 64-bit hash column
    * (simhash, image aHash/dHash, …): (id_a, id_b, hamming) with
    * popcount(xor) ≤ maxHamming. EXACT — banded blocking splits the 64
    * bits into `maxHamming + 1` equal bands, and by pigeonhole any pair
    * within `maxHamming` differing bits agrees on at least one whole
    * band, so the band equi-join misses nothing and the popcount filter
    * keeps exactly the true pairs. One shuffle on (band_id, band
    * value); the near-pair filter runs BEFORE the distinct shuffle so
    * only near pairs pay the dedup. 64 must divide into equal bands:
    * maxHamming ∈ {1, 3, 7, 15, 31}. */
  def hammingDuplicates64(hashes: DataFrame, idCol: Column,
      hashCol: Column, maxHamming: Int): DataFrame = {
    val bands = maxHamming + 1
    require(maxHamming >= 1 && 64 % bands == 0,
      s"maxHamming + 1 must divide 64, got $maxHamming")
    val width = 64 / bands
    val mask = (1L << width) - 1L
    val base = hashes.select(idCol.as("id"), hashCol.cast("long").as("h"))
    val chunks = base.select(col("id"), col("h"),
      posexplode(array((0 until bands).map(b =>
        shiftrightunsigned(col("h"), width * b).bitwiseAND(lit(mask))): _*)))
      .toDF("id", "h", "band_id", "band")
    val a = chunks.toDF("id_a", "h_a", "band_id", "band")
    val b = chunks.toDF("id_b", "h_b", "band_id", "band")
    a.join(b, Seq("band_id", "band"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming(col("h_a"), col("h_b")).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct() // pairs agreeing on several bands met several times
  }

  // ---- Edit distance ---------------------------------------------------

  /** Edit-distance near-dup pairs: (id_a, id_b, dist) with
    * levenshtein(text_a, text_b) ≤ maxDist.
    *
    * Blocking is on length buckets of width `maxDist` with each doc
    * assigned to its own bucket AND the next — provably COMPLETE:
    * lev(a,b) ≤ d implies |len(a)−len(b)| ≤ d, and two lengths within d
    * of each other land in the same or adjacent width-d buckets, so
    * every true pair shares ≥ 1 bucket key. The equi-join on the bucket
    * is the only shuffle; `distinct()` folds pairs found in both shared
    * buckets; verification uses Spark's THRESHOLDED levenshtein
    * (early-exits once the running distance exceeds d, O(d·len) not
    * O(len²)).
    *
    * Scale valve: a corpus whose lengths concentrate in one band makes
    * length blocking quadratic. `maxBucketDocs` caps the per-bucket
    * candidate population (docs beyond the cap in a hot bucket are
    * skipped, mirroring the MinHash hot-band cap) — exact by default
    * (cap = unbounded), bounded under adversarial skew when set. */
  def editDistanceDuplicates(df: DataFrame, idCol: Column, textCol: Column,
      maxDist: Int = 8, maxBucketDocs: Long = Long.MaxValue): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val w = lit(maxDist.toLong)
    // null texts are excluded explicitly (the pre-redesign plan dropped
    // them implicitly via null join keys; the fingerprint UDF must not
    // see them)
    val base0 = df.where(textCol.isNotNull)
      .select(idCol.as("id"), textCol.as("text"),
        (length(textCol).cast("long") / w).cast("long").as("lb"))
    val base =
      if (maxBucketDocs == Long.MaxValue) base0
      else {
        import org.apache.spark.sql.expressions.Window
        base0.withColumn("__rn", row_number().over(
            Window.partitionBy(col("lb")).orderBy(col("id"))))
          .where(col("__rn") <= maxBucketDocs).drop("__rn")
      }
    // The candidate join moves FINGERPRINTS ONLY — (id, length, 16-bin
    // char histogram), ~90 bytes/row — never the documents: same-bucket
    // candidate volume is quadratic-in-bucket (≈80 M pairs at sf1), and
    // carrying two ~300-char texts per candidate is tens of GB of
    // shuffle, which is what dominates, not the edit-distance kernel.
    // Both fingerprints give NECESSARY conditions for dist ≤ d (no
    // false negatives): every indel shifts length by 1 ⇒ |Δlen| > d is
    // out; a substitution moves 2 units of histogram L1 mass, an indel
    // 1 ⇒ L1 > 2d is out. Random prose pairs have L1 ≫ 2d, so almost
    // nothing survives to the text-fetch joins, and the O(len·d)
    // banded levenshtein runs only on genuine near-dup candidates.
    // base feeds four branches (fingerprint self-join sides + two text
    // fetches): cache it so the scan — and the capping window when
    // maxBucketDocs is set — evaluates once (same discipline as
    // simhashDuplicates' sims.persist)
    val baseP = base.persist()
    val texts = baseP.select(col("id"), col("text"))
    val fps = baseP
      .withColumn("__len", length(col("text")).cast("long"))
      .withColumn("__hp", CharHistPacked(col("text")))
      .drop("text")
    val a = fps.select(col("id").as("id_l"), col("__len").as("len_l"),
      col("__hp._1").as("p0_l"), col("__hp._2").as("p1_l"),
      col("lb").as("bucket"))
    val b = fps.select(col("id").as("id_r"), col("__len").as("len_r"),
      col("__hp._1").as("p0_r"), col("__hp._2").as("p1_r"),
      explode(array(col("lb"), col("lb") + 1)).as("bucket"))
    // histogram L1 as straight-line codegen'd long arithmetic: the two
    // packed longs hold 8 saturating byte counters each, so the L1 is
    // 16 shift/mask/abs terms on primitives — no per-pair array
    // allocation, no interpreted lambda (either costs ~µs per
    // candidate; at ~10^8 candidates that IS the job). Saturation only
    // UNDERestimates the true L1, so the bound stays necessary.
    def byteAt(c: Column, i: Int): Column =
      shiftright(c, 8 * i).bitwiseAND(lit(255L))
    val l1 = (0 to 7).map(i =>
        abs(byteAt(col("p0_l"), i) - byteAt(col("p0_r"), i)) +
          abs(byteAt(col("p1_l"), i) - byteAt(col("p1_r"), i)))
      .reduce(_ + _)
    val survivors = a.join(b, "bucket")
      .where(col("id_l") =!= col("id_r") &&
        abs(col("len_l") - col("len_r")) <= maxDist &&
        l1 <= 2 * maxDist)
      .select(least(col("id_l"), col("id_r")).as("id_a"),
        greatest(col("id_l"), col("id_r")).as("id_b"))
      .distinct() // same-bucket pairs met twice; dedup BEFORE text fetch
    val out = survivors
      .join(texts.select(col("id").as("id_a"), col("text").as("text_a")),
        "id_a")
      .join(texts.select(col("id").as("id_b"), col("text").as("text_b")),
        "id_b")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("text_a"), col("text_b"), maxDist).as("dist"))
      .where(col("dist") >= 0) // thresholded form returns -1 past maxDist
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize the (near-pair-sized) output, then release the big
    // corpus cache — repeated calls in a standing session must not
    // accumulate blocks (same discipline as simhashDuplicates)
    out.count()
    baseP.unpersist()
    out
  }

  /** 16-bin character histogram (char & 15) packed into two longs of
    * 8 saturating byte counters — the per-doc fingerprint behind
    * [[editDistanceDuplicates]]'s L1 pre-filter, shaped so the
    * per-candidate L1 is primitive long arithmetic. */
  private val CharHistPacked = udf((t: String) => {
    val h = new Array[Int](16)
    var i = 0
    // iterate CODE POINTS, not UTF-16 units: levenshtein (Spark and
    // DuckDB) edits code points, and the "substitution moves ≤2 units
    // of L1 mass" bound only holds when the histogram counts the same
    // alphabet — astral chars counted as 2 units would overshoot the
    // bound and silently drop true pairs
    while (i < t.length) {
      val cp = t.codePointAt(i)
      h(cp & 15) += 1
      i += Character.charCount(cp)
    }
    def pack(off: Int): Long = {
      var v = 0L
      var j = 0
      while (j < 8) {
        v |= math.min(h(off + j), 255).toLong << (8 * j)
        j += 1
      }
      v
    }
    (pack(0), pack(8))
  })
}
