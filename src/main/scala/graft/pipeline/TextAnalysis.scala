package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, n-gram shingling, quality scoring, language ID,
  * document fingerprinting. Everything is a pure Column expression
  * (codegen'd, partition-local, no shuffle) — at 100 TB these run as a
  * single map stage over the documents table.
  */
object TextAnalysis {

  /** Whitespace tokens of lowercased, trimmed text. */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: alpha runs, single digits, and punctuation
    * each count as one token (the common pre-tokenizer shape). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Word n-gram shingles (space-joined), distinct. Documents shorter
    * than n tokens yield an empty array.
    *
    * Evaluates through the native [[graft.expressions.WordShinglesExpr]]
    * kernel — the higher-order-function formulation ([[shinglesHof]])
    * runs interpreted per element and is ~10× slower at corpus scale.
    * Values are identical on non-null text (NativeExpressionsSpec); the
    * native form returns null (not an empty array) for null text. */
  def shingles(text: Column, n: Int): Column =
    graft.expressions.native.wordShingles(text, n)

  /** Reference higher-order-function formulation of [[shingles]] (kept
    * for cross-validation of the native kernel). */
  private[graft] def shinglesHof(text: Column, n: Int): Column = {
    val toks = tokens(text)
    array_distinct(when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>")))
  }

  // ---- quality signals -------------------------------------------------

  private[pipeline] def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  def punctRatio(text: Column): Column =
    countMatches(text, "[\\p{Punct}]").cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def digitRatio(text: Column): Column =
    countMatches(text, "[0-9]").cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def upperRatio(text: Column): Column =
    countMatches(text, "[A-Z]").cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Mean token length (native kernel; [[meanWordLengthHof]] is the
    * interpreted-fold reference formulation). */
  def meanWordLength(text: Column): Column =
    graft.expressions.native.meanWordLength(text)

  private[graft] def meanWordLengthHof(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Stopword-token fraction (native kernel). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    graft.expressions.native.stopwordRatio(text, stopwords)

  private[graft] def stopwordRatioHof(text: Column,
      stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      size(filter(toks, t => t.isInCollection(stopwords))).cast("double") /
        size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  val EnglishStopwords: Seq[String] = Seq("the", "a", "an", "and", "or",
    "of", "to", "in", "is", "it", "that", "for", "on", "with", "as")

  /** Composite quality score in [0, 1]: long-enough, mostly-prose text
    * with a sane word shape scores high. The weights are heuristic (the
    * standard Gopher/C4-style signals), the arithmetic is exact. */
  def qualityScore(text: Column): Column = {
    val lenScore =
      least(length(text).cast("double") / lit(200.0), lit(1.0))
    val punctPenalty =
      greatest(lit(0.0), lit(1.0) - punctRatio(text) * 4.0)
    val digitPenalty =
      greatest(lit(0.0), lit(1.0) - digitRatio(text) * 4.0)
    val wordShape = {
      val mwl = meanWordLength(text)
      when(mwl >= 3.0 && mwl <= 10.0, lit(1.0)).otherwise(lit(0.5))
    }
    round(lenScore * 0.4 + punctPenalty * 0.2 + digitPenalty * 0.2 +
      wordShape * 0.2, 6)
  }

  // ---- language ID -----------------------------------------------------

  /** Marker-word profiles for the n-gram language heuristic. Word-boundary
    * regexes over lowercased text; CJK presence short-circuits to zh. */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|is|to|in|that|it|for|with)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|ein|eine|zu|mit)\\b",
    "es" -> "\\b(el|la|los|las|es|y|de|que|un|una|por)\\b",
    "fr" -> "\\b(le|la|les|et|est|un|une|des|du|que|pour)\\b")

  /** Heuristic language ID: CJK characters → zh; otherwise the language
    * whose marker words hit most (ties broken by profile order); no hits
    * → "und". Deterministic, partition-local.
    *
    * Native single-scan kernel ([[graft.expressions.LangIdExpr]]); the
    * five-regex formulation ([[langIdHof]]) is kept for
    * cross-validation. A `\b(w…)\b` match over lowered text is exactly a
    * maximal word-character run equal to a marker word, so the run scan
    * is value-identical on non-null text. */
  def langId(text: Column): Column = graft.expressions.native.langId(text)

  /** Reference regex formulation of [[langId]]. */
  private[graft] def langIdHof(text: Column): Column = {
    val lowered = lower(text)
    val scores = LangMarkers.map { case (lang, pattern) =>
      (lang, countMatches(lowered, pattern))
    }
    val best = scores.foldLeft[(Column, Column)]((lit("und"), lit(0))) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
          when(score > bestScore, score).otherwise(bestScore))
    }
    when(countMatches(text, "[\\x{4e00}-\\x{9fff}]") > 0, lit("zh"))
      .otherwise(best._1)
  }

  /** Unicode-script character classes for [[scriptProfile]] — BMP
    * ranges only, so char counts agree across engines that measure
    * code points. Fixed order doubles as the dominant-script
    * tie-break (earlier wins). */
  val ScriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z]",
    "cyrillic" -> "[\\u0400-\\u04FF]",
    "greek" -> "[\\u0370-\\u03FF]",
    "cjk" -> "[\\u4E00-\\u9FFF]",
    "arabic" -> "[\\u0600-\\u06FF]")

  /** Per-document unicode-script composition — the script-mix readout
    * that language ID alone hides (mixed-script spam, mojibake, code
    * switching): per-script character counts, parts-per-million
    * ratios as exact integers (count·10⁶ div chars — no float
    * division anywhere), and the dominant script (max count, ties to
    * the earlier [[ScriptRanges]] entry). One codegen'd map stage —
    * no shuffle; at 100 TB this is scan-bound like the other quality
    * signals. */
  def scriptProfile(df: DataFrame, idCol: Column, textCol: Column)
      : DataFrame = {
    // null text = empty document (all-zero counts, dominant 'other')
    val t = coalesce(textCol, lit(""))
    val counted = df.select(
      idCol.as("doc_id") +:
      length(t).cast("long").as("n_chars") +:
      ScriptRanges.map { case (name, pattern) =>
        countMatches(t, pattern).cast("long").as(s"n_$name")
      }: _*)
    val dominant = ScriptRanges.map(_._1).reverse
      .foldLeft[Column](lit("other")) { (tail, name) =>
        val c = col(s"n_$name")
        val laterMax = ScriptRanges.map(_._1)
          .dropWhile(_ != name).drop(1)
          .foldLeft[Column](lit(0L))((m, o) => greatest(m, col(s"n_$o")))
        when(c > lit(0L) && c >= laterMax, lit(name)).otherwise(tail)
      }
    counted.select(
      col("doc_id") +: col("n_chars") +:
      (ScriptRanges.map { case (name, _) => col(s"n_$name") } ++
       ScriptRanges.map { case (name, _) =>
         expr(s"n_$name * 1000000 div greatest(n_chars, 1)")
           .as(s"ppm_$name")
       } :+ dominant.as("dominant")): _*)
  }

  // ---- fingerprinting --------------------------------------------------

  /** Min-hash document fingerprint: the smallest md5 over the document's
    * word n-gram shingles. Identical content → identical fingerprint;
    * near-identical content → equal with probability ≈ Jaccard
    * similarity. Empty shingle set → md5 of the whole trimmed text.
    *
    * Native single-pass kernel — no shingle array is materialized. */
  def minShingleFingerprint(text: Column, n: Int = 3): Column =
    graft.expressions.native.minShingleFingerprint(text, n)

  /** Reference formulation of [[minShingleFingerprint]] (interpreted
    * array fold; kept for cross-validation). */
  private[graft] def minShingleFingerprintHof(text: Column, n: Int = 3)
      : Column = {
    val sh = shinglesHof(text, n)
    when(size(sh) > 0, array_min(transform(sh, s => md5(s))))
      .otherwise(md5(lower(trim(text))))
  }

  /** [[minShingleFingerprint]] as a table op. With the native kernel
    * this is ONE codegen'd map stage over the corpus — no explode, no
    * shuffle, no join (the previous explode + min-aggregate + join plan
    * cost two shuffles and ~10× the time). */
  def fingerprintTable(df: org.apache.spark.sql.DataFrame,
      idCol: Column, textCol: Column, n: Int = 3)
      : org.apache.spark.sql.DataFrame =
    df.select(idCol.as("id"),
      minShingleFingerprint(textCol, n).as("fingerprint"))

  // ---- repetition / boilerplate signals --------------------------------

  /** Distinct-token fraction: 1.0 = no repeated word, → 0 for highly
    * repetitive text (the Gopher-style repetition signal). The distinct
    * count comes from the native shingle kernel at n=1 — one codegen'd
    * scan, no interpreted array lambdas ([[distinctTokenRatioHof]] is
    * the reference formulation). */
  def distinctTokenRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      size(graft.expressions.native.wordShingles(text, 1)).cast("double") /
        size(toks).cast("double"))
      .otherwise(lit(1.0))
  }

  private[graft] def distinctTokenRatioHof(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
      .otherwise(lit(1.0))
  }

  /** Distinct-bigram fraction over consecutive token pairs — catches
    * phrase-level boilerplate that single-token ratios miss. Native
    * kernel at n=2 (the interpreted transform+slice lambda formulation,
    * [[distinctBigramRatioHof]], cost ~10× at corpus scale). */
  def distinctBigramRatio(text: Column): Column = {
    val n = size(tokens(text)) - 1
    when(n > 0,
      size(graft.expressions.native.wordShingles(text, 2)).cast("double") /
        n.cast("double"))
      .otherwise(lit(1.0))
  }

  private[graft] def distinctBigramRatioHof(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks) - 1
    val grams = when(n > 0,
      transform(sequence(lit(0), n - 1),
        i => concat_ws(" ", slice(toks, i + 1, lit(2)))))
      .otherwise(array().cast("array<string>"))
    when(n > 0,
      size(array_distinct(grams)).cast("double") / n.cast("double"))
      .otherwise(lit(1.0))
  }

  /** Per-document repetition profile as a table op:
    * (id, n_tokens, distinct_ratio, bigram_ratio, top_token_ratio) where
    * top_token_ratio is the most frequent token's share. The mode count
    * is within-document, so it runs in the native
    * [[graft.expressions.TopTokenCountExpr]] kernel — the whole profile
    * is ONE codegen'd map stage, no explode, no shuffle
    * ([[repetitionTableShuffled]] is the aggregation formulation, kept
    * for cross-validation). */
  def repetitionTable(df: DataFrame, idCol: Column, textCol: Column)
      : DataFrame =
    df.select(idCol.as("id"),
      size(tokens(textCol)).cast("long").as("n_tokens"),
      round(distinctTokenRatio(textCol), 6).as("distinct_ratio"),
      round(distinctBigramRatio(textCol), 6).as("bigram_ratio"),
      round(graft.expressions.native.topTokenCount(textCol).cast("double") /
        size(tokens(textCol)).cast("double"), 6).as("top_token_ratio"))

  /** Reference explode + two-aggregation formulation of
    * [[repetitionTable]] (cross-validation of the native mode kernel). */
  private[graft] def repetitionTableShuffled(df: DataFrame, idCol: Column,
      textCol: Column): DataFrame = {
    val base = df.select(idCol.as("id"), textCol.as("__text"))
    val perDoc = base.select(col("id"),
      size(tokens(col("__text"))).cast("long").as("n_tokens"),
      round(distinctTokenRatio(col("__text")), 6).as("distinct_ratio"),
      round(distinctBigramRatio(col("__text")), 6).as("bigram_ratio"))
    val top = base
      .select(col("id"), explode(tokens(col("__text"))).as("tok"))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("id")).agg(max(col("c")).as("top_c"),
        sum(col("c")).as("tot"))
      .select(col("id"),
        round(col("top_c").cast("double") / col("tot").cast("double"), 6)
          .as("top_token_ratio"))
    perDoc.join(top, Seq("id"), "left")
      .withColumn("top_token_ratio",
        coalesce(col("top_token_ratio"), lit(0.0)))
  }

  /** Fixed-size token-window chunking with overlap — the
    * context-window preparation step of a training pipeline. Chunks of
    * `chunkTokens` whitespace tokens advance by `chunkTokens - overlap`;
    * the final chunk clamps at the document end, and a document shorter
    * than one window yields exactly one chunk. Case-preserving (chunk
    * text must stay verbatim). One generator per document row — a map +
    * explode stage, no shuffle, scan-bound at any scale. */
  def chunk(df: DataFrame, idCol: Column, textCol: Column,
      chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need chunkTokens > overlap >= 0")
    val step = chunkTokens - overlap
    val toks = split(trim(textCol), "\\s+")
    val n = size(toks)
    val numChunks = when(n <= chunkTokens, lit(1))
      .otherwise(ceil((n - chunkTokens).cast("double") / step)
        .cast("int") + 1)
    val piece = slice(col("__toks"), col("chunk_id") * step + 1,
      lit(chunkTokens))
    df.select(idCol.as("doc_id"), toks.as("__toks"),
        explode(sequence(lit(0), numChunks - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        concat_ws(" ", piece).as("chunk_text"),
        size(piece).cast("long").as("n_tokens"))
  }

  /** Corpus length-distribution report: doc count, token-count mean and
    * exact interpolated quantiles (p50/p90/p99). One aggregation over a
    * map stage; `percentile` runs distributed with per-partition
    * buffers. The curation dashboard numbers for choosing length
    * filters. */
  def lengthStats(df: DataFrame, textCol: Column): DataFrame =
    df.select(tokenCount(textCol).cast("double").as("__n"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("__n")), 6).as("mean_tokens"),
        expr("percentile(__n, array(0.5D, 0.9D, 0.99D))").as("__q"))
      .select(col("n_docs"), col("mean_tokens"),
        round(element_at(col("__q"), 1), 6).as("p50_tokens"),
        round(element_at(col("__q"), 2), 6).as("p90_tokens"),
        round(element_at(col("__q"), 3), 6).as("p99_tokens"))

  // ---- corpus vocabulary / TF-IDF --------------------------------------

  /** Corpus vocabulary with document frequency, collection term
    * frequency, and smoothed IDF `ln((N+1)/(df+1)) + 1`. One explode +
    * one aggregation — the map side pre-combines per-partition token
    * counts, so the shuffle carries at most |vocab| × partitions rows
    * regardless of corpus size. The distinct-doc count rides the same
    * aggregation via count(DISTINCT id) per token (Spark plans the
    * two-phase distinct aggregate; token keys are near-uniform — no
    * skew salt needed for natural-language vocabularies). */
  def vocabulary(df: DataFrame, idCol: Column, textCol: Column,
      minDf: Long = 1L): DataFrame = {
    // the corpus size N rides the same plan as a broadcast single-row
    // aggregate (the oracle's `n` CTE shape) — an eager df.count() here
    // would run a full scan at CALL time, before/without execution
    val n = df.agg(count(lit(1)).as("__n"))
    df.select(idCol.as("id"), explode(tokens(textCol)).as("token"))
      .groupBy(col("token"))
      .agg(countDistinct(col("id")).as("df"),
        count(lit(1)).as("tf"))
      .where(col("df") >= minDf)
      .crossJoin(broadcast(n))
      .withColumn("idf",
        round(log((col("__n") + 1.0) / (col("df") + 1.0)) + 1.0, 6))
      .drop("__n")
  }

  /** Vocabulary-coverage / OOV report per group: with the vocabulary
    * fixed to the corpus's `vocabSize` most frequent tokens (ties
    * broken by token — deterministic on any engine), how much of each
    * group's token mass the vocabulary covers, and how many distinct
    * out-of-vocabulary forms remain. The go/no-go readout for sizing a
    * tokenizer vocabulary before training.
    *
    * Integer-exact throughout (counts + ppm by floor division). Plan:
    * one token aggregation for the vocab (map-side combined, same
    * shape as [[vocabulary]]), a two-phase top-V selection, then the
    * per-(group, token) count table left-joins the BROADCAST vocab —
    * the corpus is tokenized once, nothing driver-side but the model
    * size V. */
  def vocabCoverage(df: DataFrame, groupCol: Column, textCol: Column,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val tok = df.select(groupCol.as("grp"), explode(tokens(textCol))
      .as("token"))
    val gt = tok.groupBy(col("grp"), col("token"))
      .agg(count(lit(1)).as("c"))
    // global counts derive from the (group, token) table — the corpus
    // is NOT re-tokenized; top-V per the (count desc, token asc) total
    // order via the skew-proof two-phase ranker (no global
    // one-reducer window over the vocabulary table)
    val global = gt.groupBy(col("token")).agg(sum(col("c")).as("tc"))
    val vocab = Sampling.topKPerGroup(global, lit(1), col("tc"),
        col("token").asc, vocabSize)
      .select(col("token"), lit(1).as("__in"))
    gt.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("grp").as("grp"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(when(col("__in").isNotNull, col("c")).otherwise(0L))
          .as("n_covered"),
        sum(when(col("__in").isNull, 1L).otherwise(0L))
          .as("n_distinct_oov"))
      .select(col("grp"), col("n_tokens"), col("n_covered"),
        col("n_distinct_oov"),
        expr("(n_tokens - n_covered) * 1000000 div n_tokens")
          .as("oov_ppm"))
  }

  // ---- text normalization ----------------------------------------------

  /** Unicode NFC normalization (native kernel with an is-already-NFC
    * fast path — most corpus text skips the rebuild). */
  def normalizeNfc(text: Column): Column =
    graft.expressions.native.normalizeNfc(text)

  /** Canonical text cleanup for hashing/dedup: NFC-compose, replace
    * control characters with spaces, squeeze whitespace runs, trim.
    * Pure codegen'd map stage; the regex classes stay inside the
    * RE2 ∩ Java dialect so external engines reproduce it verbatim. */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(normalizeNfc(text), "[\\p{Cntrl}]", " "),
      "\\s+", " "))

  /** Corpus-wide most-common word n-grams by DOCUMENT frequency — the
    * boilerplate-mining report (an n-gram shared verbatim by many
    * documents is headers/footers/license text, not prose). Shingles are
    * distinct per document (native kernel), so the count after one
    * explode + one map-side-combined aggregation IS the document
    * frequency. The top-k runs as TakeOrdered over the (already small,
    * `minDf`-filtered) aggregate — no global sort of the full n-gram
    * table. Total order (doc_freq desc, ngram asc) keeps the cut
    * deterministic across engines. */
  def commonNgrams(df: DataFrame, idCol: Column, textCol: Column,
      n: Int = 3, minDf: Long = 2L, k: Int = 100): DataFrame =
    df.select(explode(shingles(textCol, n)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("doc_freq"))
      .where(col("doc_freq") >= minDf)
      .orderBy(col("doc_freq").desc, col("ngram").asc)
      .limit(k)

  /** Per-document unigram surprisal (mean -log2 p(token), bits/token) —
    * the LM-based quality signal: gibberish and boilerplate-stuffed text
    * sit far from the corpus distribution. The model is the corpus
    * unigram itself (`vocab` as produced by [[vocabulary]]), Laplace-
    * smoothed: p(t) = (tf(t)+1) / (T+V) with tf(t)=0 for OOV tokens, so
    * the score is defined for every document.
    *
    * Scale shape: token explode → join on the vocab (broadcast when it
    * fits — natural-language vocabularies are ≤ tens of millions of
    * rows, far below the corpus; Spark picks sort-merge otherwise) →
    * one doc-keyed aggregation. The T/V totals ride the plan as a
    * broadcast single-row aggregate. */
  def unigramSurprisal(df: DataFrame, idCol: Column, textCol: Column,
      vocab: DataFrame): DataFrame = {
    val totals = vocab.agg(sum(col("tf")).as("__t"),
      count(lit(1)).as("__v"))
    df.select(idCol.as("id"), explode(tokens(textCol)).as("token"))
      .join(vocab.select(col("token"), col("tf")), Seq("token"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("__logp",
        log2((coalesce(col("tf"), lit(0L)) + 1.0) /
          (col("__t") + col("__v"))))
      .groupBy(col("id"))
      .agg(round(avg(-col("__logp")), 6).as("bits_per_token"),
        count(lit(1)).as("n_tokens"))
  }

  /** Interpolated bigram language-model surprisal (the KenLM-filter
    * shape): bits/bigram under
    * p(w2|w1) = λ·c(w1,w2)/c(w1) + (1−λ)·p_uni(w2), with the same
    * Laplace unigram as [[unigramSurprisal]]. All counts are exact
    * integers, so the score is engine-portable modulo the round-6
    * float discipline. Docs with fewer than two tokens drop out.
    *
    * Scale shape: ONE bigram-count aggregation with map-side combine
    * (the only new shuffle — keyed on (w1,w2), never on documents),
    * then the per-doc bigram stream equi-joins the count tables; the
    * unigram side broadcasts when it fits and the T/V totals ride as
    * a broadcast single-row aggregate. No windows, no driver state. */
  def bigramSurprisal(df: DataFrame, idCol: Column, textCol: Column,
      lambda: Double = 0.7): DataFrame = {
    val toks = df.select(idCol.as("id"), tokens(textCol).as("__toks"))
      .where(size(col("__toks")) >= 2)
    val bg = toks.select(col("id"),
        explode(transform(sequence(lit(1), size(col("__toks")) - 1),
          i => struct(element_at(col("__toks"), i).as("w1"),
            element_at(col("__toks"), i + 1).as("w2")))).as("__p"))
      .select(col("id"), col("__p.w1"), col("__p.w2"))
    val uni = df.select(explode(tokens(textCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val totals = uni.agg(sum(col("c1")).as("__t"),
      count(lit(1)).as("__v"))
    val big = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    bg
      .join(big, Seq("w1", "w2"))
      .join(uni.withColumnRenamed("w", "w1"), Seq("w1"))
      .join(uni.withColumnRenamed("w", "w2")
        .withColumnRenamed("c1", "c1b"), Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("__logp", log2(
        lit(lambda) * col("c2").cast("double") / col("c1") +
        lit(1.0 - lambda) * (col("c1b") + 1.0) /
          (col("__t") + col("__v"))))
      .groupBy(col("id"))
      .agg(round(avg(-col("__logp")), 6).as("bits_per_bigram"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Order-sensitive rolling (polynomial) hash over tokens:
    * `acc = acc * 31 + tokenHash (mod P)`. Distinguishes documents
    * that are permutations of each other (where set-based fingerprints
    * collide). Native kernel; [[rollingHashHof]] is the reference
    * formulation. */
  def rollingHash(text: Column): Column =
    graft.expressions.native.rollingHash(text)

  private[graft] def rollingHashHof(text: Column): Column = {
    // modulus keeps acc*31 + tokenHash < 2^35 — no ANSI overflow
    val P = 1000000007L
    val toks = tokens(text)
    aggregate(toks, lit(0L),
      (acc, t) => pmod(acc * 31L + pmod(xxhash64(t), lit(P)), lit(P)))
  }

  /** Content-defined chunking (native codegen'd kernel): chunk texts
    * in document order, boundaries where the fixed-window polynomial
    * code-point hash is divisible by `modulus` (≈ expected chunk
    * length). Unlike fixed-offset chunking, an edit moves only the one
    * or two chunks it touches — the property CDC-level dedup rests on.
    * Pure map stage; see [[graft.expressions.Kernels.cdcChunks]] for
    * the exact boundary rule an external engine can restate. */
  def cdcChunks(text: Column, window: Int = 8, base: Long = 31L,
      modulus: Int = 16): Column =
    graft.expressions.native.cdcChunks(text, window, base, modulus)

  /** CDC chunk table: one row per (doc_id, chunk_id, chunk_text) in
    * document order — explode of [[cdcChunks]], no shuffle. */
  def cdcChunkTable(df: DataFrame, idCol: Column, textCol: Column,
      window: Int = 8, base: Long = 31L, modulus: Int = 16): DataFrame =
    df.select(idCol.as("doc_id"),
        posexplode(cdcChunks(textCol, window, base, modulus))
          .as(Seq("chunk_id", "chunk_text")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("chunk_text"))

  /** Chunk-level duplication report over the CDC chunking: every chunk
    * content (as md5) carried verbatim by at least `minDocs` distinct
    * documents, with its document and occurrence counts — the unit of
    * storage-level dedup and of fine-grained cross-document overlap
    * mining. One explode (map) + one hash-keyed aggregation with
    * map-side combine; the shuffle carries (md5, partial counts), never
    * chunk text bodies. */
  def cdcDuplicateChunks(df: DataFrame, idCol: Column, textCol: Column,
      minDocs: Long = 2L, window: Int = 8, base: Long = 31L,
      modulus: Int = 16): DataFrame =
    cdcChunkTable(df, idCol, textCol, window, base, modulus)
      .groupBy(md5(col("chunk_text")).as("chunk_md5"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .where(col("n_docs") >= minDocs)

  /** CDC chunk-level deduplication MATERIALIZED: rebuild every document
    * keeping only the chunks whose content occurs here FIRST — the
    * first occurrence being the globally smallest (doc_id, chunk_id)
    * among equal contents, so the keeper rule is a total order and the
    * result is partitioning-independent. The storage-dedup semantics of
    * content-defined chunking carried through to the corpus text.
    *
    * Output: (doc_id, n_chunks, n_dropped, clean_text) — clean_text is
    * the surviving chunks concatenated WITHOUT separators (chunks are
    * exact spans, so a fully-unique document round-trips verbatim).
    *
    * Scale shape: the chunk table is a map stage; the first-occurrence
    * table is ONE md5-keyed aggregation carrying a packed
    * (doc_id, chunk_id) long — never chunk bodies; the keep decision
    * is an equi-join back on the md5 (sort-merge/hash at corpus scale),
    * and reassembly is one doc-keyed aggregation. chunk_id fits 20 bits
    * (bounded by document length), so the pack is collision-free. */
  def cdcDeduplicate(df: DataFrame, idCol: Column, textCol: Column,
      window: Int = 8, base: Long = 31L, modulus: Int = 16): DataFrame = {
    val chunks = cdcChunkTable(df, idCol, textCol, window, base, modulus)
      .withColumn("__md5", md5(col("chunk_text")))
      .withColumn("__pk", packedChunkKey)
    val firsts = chunks.groupBy(col("__md5"))
      .agg(min(col("__pk")).as("__minpk"))
    chunks
      .join(firsts, Seq("__md5"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__pk") =!= col("__minpk"), 1L).otherwise(0L))
          .as("n_dropped"),
        array_sort(collect_list(when(col("__pk") === col("__minpk"),
          struct(col("chunk_id"), col("chunk_text"))))).as("__kept"))
      .select(col("doc_id"), col("n_chunks"), col("n_dropped"),
        concat_ws("",
          transform(col("__kept"), x => x("chunk_text"))).as("clean_text"))
  }

  /** Packed (doc_id, chunk_id) total-order key for the chunk-dedup
    * keeper rule. chunk_id is bounded by document length, so 20 bits
    * hold any document under ~1M chunks; a document beyond that FAILS
    * LOUDLY instead of silently corrupting the keeper order. */
  private def packedChunkKey: Column =
    when(col("chunk_id") < 1048576L,
      col("doc_id") * 1048576L + col("chunk_id"))
      .otherwise(raise_error(concat(
        lit("cdc chunk_id overflows the 20-bit pack: "),
        col("chunk_id").cast("string"))))

  /** Standing CDC chunk index: per distinct chunk content (md5), the
    * packed (doc_id, chunk_id) of its globally-first occurrence. The
    * standing state of incremental chunk-level dedup — bounded by
    * distinct chunk contents, never corpus rows. */
  final case class ChunkIndex(firsts: DataFrame)

  /** Build the chunk index of one batch — one md5-keyed aggregation
    * carrying packed ids only. */
  def buildChunkIndex(df: DataFrame, idCol: Column, textCol: Column,
      window: Int = 8, base: Long = 31L, modulus: Int = 16): ChunkIndex =
    ChunkIndex(
      cdcChunkTable(df, idCol, textCol, window, base, modulus)
        .groupBy(md5(col("chunk_text")).as("__md5"))
        .agg(min(packedChunkKey).as("__minpk")))

  /** Fold a batch's index into the standing one: min is associative,
    * so folded firsts equal the one-shot build over the union — for
    * ANY batch split, no disjointness needed. */
  def foldChunkIndex(existing: ChunkIndex, batch: ChunkIndex): ChunkIndex =
    ChunkIndex(existing.firsts.unionByName(batch.firsts)
      .groupBy(col("__md5"))
      .agg(min(col("__minpk")).as("__minpk")))

  /** Rebuild `df`'s documents keeping only chunks that are the first
    * occurrence ACCORDING TO THE INDEX — when batches arrive in
    * ascending doc_id order and the index has been folded over every
    * batch seen so far (including this one), the union of per-batch
    * outputs equals the one-shot [[cdcDeduplicate]] over the whole
    * corpus (the oracle for `dedup_cdc_incremental` asserts exactly
    * that, against the one-shot SQL). */
  def cdcDeduplicateWithIndex(df: DataFrame, idCol: Column,
      textCol: Column, index: ChunkIndex, window: Int = 8,
      base: Long = 31L, modulus: Int = 16): DataFrame = {
    val chunks = cdcChunkTable(df, idCol, textCol, window, base, modulus)
      .withColumn("__md5", md5(col("chunk_text")))
      .withColumn("__pk", packedChunkKey)
    chunks
      .join(index.firsts, Seq("__md5"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__pk") =!= col("__minpk"), 1L).otherwise(0L))
          .as("n_dropped"),
        array_sort(collect_list(when(col("__pk") === col("__minpk"),
          struct(col("chunk_id"), col("chunk_text"))))).as("__kept"))
      .select(col("doc_id"), col("n_chunks"), col("n_dropped"),
        concat_ws("",
          transform(col("__kept"), x => x("chunk_text"))).as("clean_text"))
  }

  /** Winnowing fingerprint table (the MOSS plagiarism/overlap scheme):
    * one row per selected (doc_id, pos, hash) — rightmost-min of every
    * `w`-window over the k-gram hash stream (native single-pass kernel;
    * the selection rule is ONE sliding-window min, which is how the
    * SQL oracle restates it). The winnowing guarantee: any substring
    * shared verbatim across documents of length ≥ k+w−1 produces a
    * shared (hash) fingerprint, with ~2/(w+1) selection density —
    * bounded index size with a hard detection floor, the property
    * suffix-array dedup approximations rest on. Pure map + explode,
    * no shuffle. */
  def winnowTable(df: DataFrame, idCol: Column, textCol: Column,
      k: Int = 8, w: Int = 16): DataFrame =
    df.select(idCol.as("doc_id"),
        explode(graft.expressions.native.winnow(textCol, k, w))
          .as("__packed"))
      .select(col("doc_id"),
        pmod(col("__packed"), lit(1048576L)).as("pos"),
        shiftright(col("__packed"), 20).as("hash"))

  /** Substring-level contamination screen via CDC chunks: for each
    * training document, how many of its chunks appear VERBATIM in the
    * eval corpus. Finer-grained than whole-doc hashing and cheaper than
    * n-gram overlap (one chunk per ~modulus code points instead of one
    * shingle per token). The eval chunk set is a distinct-md5 table —
    * small relative to the training corpus (eval sets are) — so the
    * probe is a broadcast semi-join; output is one train-doc-keyed
    * aggregation: (doc_id, n_chunks, n_contaminated, frac round-6). */
  def cdcContamination(train: DataFrame, trainId: Column,
      trainText: Column, eval_ : DataFrame, evalText: Column,
      window: Int = 8, base: Long = 31L, modulus: Int = 16): DataFrame = {
    val evalChunks = eval_
      .select(posexplode(cdcChunks(evalText, window, base, modulus))
        .as(Seq("__i", "__c")))
      .select(md5(col("__c")).as("__md5")).distinct()
    cdcChunkTable(train, trainId, trainText, window, base, modulus)
      .withColumn("__md5", md5(col("chunk_text")))
      .join(broadcast(evalChunks.withColumn("__hit", lit(true))),
        Seq("__md5"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__hit"), 1L).otherwise(0L)).as("n_contaminated"))
      .withColumn("frac",
        round(col("n_contaminated").cast("double") / col("n_chunks"), 6))
  }

  /** CCNet-style boilerplate removal: split each document into fixed
    * `lineTokens`-token "lines" (the line/paragraph unit of a real
    * pipeline — this corpus has no newlines, so the unit is a token
    * window), count each line's document frequency WITHIN its group
    * (site/domain/source — boilerplate is per-site: headers, footers,
    * cookie banners), and drop lines shared verbatim by at least
    * `minDocFreq` distinct documents of the group. Returns one row per
    * document: (doc_id, n_lines, n_removed, clean_text) with kept
    * lines re-joined in original order.
    *
    * Scale shape: line construction is a map stage (one posexplode per
    * document — no token-level shuffle); the frequency pass is ONE
    * (group, line)-keyed aggregation with map-side combine; the
    * boilerplate dictionary is small BY CONSTRUCTION (lines with
    * df ≥ k number at most totalLines / k), so flagging is a broadcast
    * join; reassembly is one doc-keyed aggregation whose per-group
    * state is bounded by document length. Nothing shuffles more than
    * once, and no driver-side iteration.
    */
  def removeBoilerplate(df: DataFrame, idCol: Column, textCol: Column,
      groupCol: Column, lineTokens: Int = 2, minDocFreq: Long = 3L)
      : DataFrame = {
    require(lineTokens > 0 && minDocFreq > 1,
      "need lineTokens > 0 and minDocFreq > 1")
    val lines = lineTable(df, idCol, textCol, groupCol, lineTokens)
    applyBoilerplate(lines, lineCounts(lines), minDocFreq)
  }

  /** The fixed-window "line" view of a corpus:
    * (doc_id, grp, line_id, line_text) — one posexplode map stage. */
  private def lineTable(df: DataFrame, idCol: Column, textCol: Column,
      groupCol: Column, lineTokens: Int): DataFrame = {
    val nLines = ceil(size(col("__toks")).cast("double") / lineTokens)
      .cast("int")
    df.select(idCol.as("doc_id"), groupCol.as("grp"),
        split(trim(textCol), "\\s+").as("__toks"))
      .select(col("doc_id"), col("grp"),
        posexplode(transform(sequence(lit(0), nLines - 1),
          i => concat_ws(" ", slice(col("__toks"), i * lineTokens + 1,
            lit(lineTokens))))).as(Seq("line_id", "line_text")))
  }

  private def lineCounts(lines: DataFrame): DataFrame =
    lines.groupBy(col("grp"), col("line_text"))
      .agg(countDistinct(col("doc_id")).as("line_df"))

  /** STANDING boilerplate state: the full per-(group, line) document-
    * frequency table (grp, line_text, line_df) — unthresholded, so it
    * can be folded incrementally as batches arrive (the same standing-
    * state shape as `Dedup.CorpusIndex` and the sketch tables). Size is
    * bounded by the corpus's distinct-line vocabulary, not its row
    * count. One map-side-combined aggregation. */
  def boilerplateCounts(df: DataFrame, idCol: Column, textCol: Column,
      groupCol: Column, lineTokens: Int = 2): DataFrame =
    lineCounts(lineTable(df, idCol, textCol, groupCol, lineTokens))

  /** Fold a new batch's counts into the standing table. Exact when the
    * batches cover disjoint documents (the append contract every
    * standing index here shares): per-(group, line) distinct-doc counts
    * are then additive. One keyed aggregation over the two count
    * tables — never touches corpus rows. */
  def foldBoilerplateCounts(existing: DataFrame, batch: DataFrame)
      : DataFrame =
    existing.unionByName(batch)
      .groupBy(col("grp"), col("line_text"))
      .agg(sum(col("line_df")).as("line_df"))

  /** [[removeBoilerplate]] with a RATE threshold — the scale-correct
    * CCNet semantics: a line is boilerplate when it appears in at least
    * `minDocFrac` of its group's documents (floored at `minDocFreq`
    * absolute), so the cut tracks corpus growth instead of drifting
    * toward "everything is boilerplate" as groups grow. Use an
    * exact-binary fraction (1/8, 3/64, …): `ceil(frac · groupDocs)` is
    * then bit-identical on every engine. Adds only a tiny per-group
    * size table (broadcast) to the one-shot plan. */
  def removeBoilerplateByRate(df: DataFrame, idCol: Column,
      textCol: Column, groupCol: Column, lineTokens: Int = 2,
      minDocFrac: Double = 0.125, minDocFreq: Long = 2L): DataFrame = {
    require(minDocFrac > 0.0 && minDocFrac <= 1.0, "bad minDocFrac")
    val lines = lineTable(df, idCol, textCol, groupCol, lineTokens)
    val groupSizes = df.groupBy(groupCol.as("grp"))
      .agg(count(lit(1)).as("__gdocs"))
    val thresholded = lineCounts(lines)
      .join(broadcast(groupSizes), Seq("grp"))
      .where(col("line_df") >= greatest(lit(minDocFreq),
        ceil(col("__gdocs") * minDocFrac).cast("long")))
      .select(col("grp"), col("line_text"), col("line_df"))
    applyBoilerplate(lines, thresholded, minDocFreq = 1L)
  }

  /** Remove boilerplate using a standing count table (built by
    * [[boilerplateCounts]], possibly folded across batches): threshold
    * the dictionary at `minDocFreq` (small by construction → broadcast
    * flag join), then the same ordered reassembly as
    * [[removeBoilerplate]]. Incremental-fold + apply ≡ one-shot
    * removeBoilerplate on the union of the batches. */
  def removeBoilerplateWithCounts(df: DataFrame, idCol: Column,
      textCol: Column, groupCol: Column, counts: DataFrame,
      lineTokens: Int = 2, minDocFreq: Long = 3L): DataFrame =
    applyBoilerplate(lineTable(df, idCol, textCol, groupCol, lineTokens),
      counts, minDocFreq)

  private def applyBoilerplate(lines: DataFrame, counts: DataFrame,
      minDocFreq: Long): DataFrame = {
    val boiler = counts
      .where(col("line_df") >= minDocFreq)
      .select(col("grp"), col("line_text"), lit(true).as("__bp"))
    lines
      .join(broadcast(boiler), Seq("grp", "line_text"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("__bp"), 1L).otherwise(0L)).as("n_removed"),
        // kept lines, re-ordered: collect_list drops the nulls the
        // `when` leaves for boilerplate lines; array_sort on the
        // (line_id, text) struct restores document order
        array_sort(collect_list(when(col("__bp").isNull,
          struct(col("line_id"), col("line_text"))))).as("__kept"))
      .select(col("doc_id"), col("n_lines"), col("n_removed"),
        concat_ws(" ",
          transform(col("__kept"), x => x("line_text"))).as("clean_text"))
  }

  // ---- feature hashing --------------------------------------------------

  /** Feature-hashed term-frequency rows (the HashingTF shape, in sparse
    * COO form): (doc_id, dim, tf) with `dim` the md5-bucket of the
    * token in a fixed `dim`-dimensional space. The md5-prefix hash is
    * the repo's one portable hash (Spark `conv` ≡ DuckDB hex cast), so
    * the buckets — unlike xxhash-based alternatives — are identical on
    * any engine. One explode + ONE map-side-combined aggregation; the
    * shuffle carries (doc, dim, partial count), bounded per doc by
    * min(doc tokens, dim). The text-side sparse embedding that feeds
    * the cosine/ANN machinery without a trained model. */
  def hashingTf(df: DataFrame, idCol: Column, textCol: Column,
      dim: Int = 1024): DataFrame = {
    require(dim > 0, "dim must be positive")
    df.select(idCol.as("doc_id"), explode(tokens(textCol)).as("token"))
      .groupBy(col("doc_id"),
        pmod(conv(substring(md5(col("token")), 1, 8), 16, 10)
          .cast("long"), lit(dim.toLong)).as("dim"))
      .agg(count(lit(1)).as("tf"))
  }

  /** RAKE keyword extraction (Rose et al. 2010), corpus-statistics
    * flavor: candidate phrases are maximal runs of non-stopword
    * `[a-z0-9]+` tokens; each word scores degree/freq over ALL phrase
    * occurrences in the corpus (freq = occurrences containing the
    * word, degree = summed phrase lengths of those); a phrase scores
    * the sum of its words' scores; top-`k` distinct phrases per doc.
    *
    * Determinism: word scores are kept as INTEGER micro-units
    * (`degree·10⁶ div freq` — floor division), so phrase scores are
    * exact integer sums no float association order can perturb, and
    * ranking ties break on the phrase string.
    *
    * Scale shape: phrase extraction is a pure per-doc map; the word
    * table is ONE map-side-combined aggregation (vocabulary-sized);
    * scoring is an explode + hash join + per-(doc, phrase) sum; top-k
    * uses the skew-proof two-phase [[Sampling.topKPerGroup]]. Output:
    * (doc_id, phrase, score_micro, rank). */
  def rakeKeywords(docs: DataFrame, idCol: Column, textCol: Column,
      stopwords: Seq[String] = EnglishStopwords, k: Int = 3)
      : DataFrame = {
    require(k >= 1, "k must be >= 1")
    val stop = stopwords.toSet
    val phrasesUdf = udf((t: String) => {
      if (t == null) Seq.empty[String]
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        val cur = scala.collection.mutable.ArrayBuffer.empty[String]
        t.trim.toLowerCase.split("\\s+").foreach { w =>
          if (w.isEmpty || stop.contains(w) || !w.matches("[a-z0-9]+")) {
            if (cur.nonEmpty) { out += cur.mkString(" "); cur.clear() }
          } else cur += w
        }
        if (cur.nonEmpty) out += cur.mkString(" ")
        out.toSeq
      }
    })
    val occ = docs
      .select(idCol.as("doc_id"), explode(phrasesUdf(textCol)).as("phrase"))
      .withColumn("plen", size(split(col("phrase"), " ")).cast("long"))
    val ws = occ
      .select(col("plen"), explode(split(col("phrase"), " ")).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("degree"))
    val scored = occ.select(col("doc_id"), col("phrase")).distinct()
      .withColumn("w", explode(split(col("phrase"), " ")))
      .join(ws, "w")
      .groupBy(col("doc_id"), col("phrase"))
      .agg(sum(expr("(degree * 1000000) div freq")).as("score_micro"))
    Sampling.topKPerGroup(scored, col("doc_id"), col("score_micro"),
        col("phrase"), k)
      .select(col("doc_id"), col("phrase"), col("score_micro"),
        col("rank"))
  }

  /** Standing first-owner shingle index for incremental
    * [[ngramNovelty]]: (shingle → smallest doc id seen). min is
    * associative, so batch indexes fold exactly ([[foldNoveltyIndex]])
    * and the folded index over any split equals the one-shot build —
    * the [[ChunkIndex]] contract. */
  final case class NoveltyIndex(firstOwners: DataFrame)

  private def shingleTable(docs: DataFrame, idCol: Column,
      textCol: Column, n: Int): DataFrame = {
    val parts = (0 until n).map(j =>
      if (j == 0) "element_at(toks, CAST(i AS INT))"
      else s"element_at(toks, CAST(i + $j AS INT))")
      .mkString(", ' ', ")
    val grams = s"array_distinct(transform(" +
      s"sequence(1, size(toks) - ${n - 1}), i -> concat($parts)))"
    docs
      .select(idCol.as("doc_id"),
        split(lower(trim(textCol)), "\\s+").as("toks"))
      .where(size(col("toks")) >= n)
      .select(col("doc_id"), explode(expr(grams)).as("sh"))
  }

  /** Build the first-owner index of one (micro-)batch. */
  def buildNoveltyIndex(docs: DataFrame, idCol: Column, textCol: Column,
      n: Int = 3): NoveltyIndex =
    NoveltyIndex(shingleTable(docs, idCol, textCol, n)
      .groupBy("sh").agg(min("doc_id").as("first_doc")))

  /** Fold two first-owner indexes: per-shingle min — associative, so
    * any fold tree over any batch split yields the one-shot index. */
  def foldNoveltyIndex(a: NoveltyIndex, b: NoveltyIndex): NoveltyIndex =
    NoveltyIndex(a.firstOwners.unionByName(b.firstOwners)
      .groupBy("sh").agg(min("first_doc").as("first_doc")))

  /** Score a batch's novelty against a standing index that already
    * includes the batch (fold it in first): identical output shape to
    * [[ngramNovelty]]. With ascending doc ids across batches, scoring
    * each batch against the fold-so-far accumulates to the one-shot
    * [[ngramNovelty]] over the concatenated stream. */
  def noveltyWithIndex(docs: DataFrame, idCol: Column, textCol: Column,
      index: NoveltyIndex, n: Int = 3): DataFrame =
    shingleTable(docs, idCol, textCol, n)
      .join(index.firstOwners, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_shingles"), 6))

  /** Per-document n-gram novelty — the memorization-risk readout for
    * ordered corpus ingestion: of a document's DISTINCT token
    * `n`-grams, how many occur for the FIRST time in this document
    * (ownership = smallest doc id containing the shingle)? A verbatim
    * re-crawl scores 0 novel; fresh prose scores ≈ all. Output:
    * (doc_id, n_shingles, n_novel, novelty round-6) for every doc with
    * ≥ n tokens — counts are exact integers, the ratio one division.
    *
    * Scale shape: one shingle explode (distinct per doc) + ONE
    * map-side-combined min-aggregation keyed by shingle + a hash join
    * back — fingerprint-sized shuffle rows, never text bodies. */
  def ngramNovelty(docs: DataFrame, idCol: Column, textCol: Column,
      n: Int = 3): DataFrame = {
    require(n >= 1 && n <= 8, s"n in 1..8, got $n")
    val sh = shingleTable(docs, idCol, textCol, n)
    val firstOwner = sh.groupBy("sh").agg(min("doc_id").as("first_doc"))
    sh.join(firstOwner, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_shingles"), 6))
  }

  /** Gopher-style rule flags — the named-rule counterpart of the
    * composite [[qualityScore]]: one boolean column per repetition-free
    * heuristic plus the conjunction, so a curation pipeline can report
    * WHICH rule rejected a document (the auditability the single score
    * lacks). Every rule is an integer comparison (counts and
    * cross-multiplied ratios — no float thresholds), so the flag table
    * is engine-exact. One shuffle-free codegen'd map stage.
    *
    * Rules (documented inline): word count in [minWords, maxWords];
    * mean word length in [3, 10] (×100 integer division); alphabetic
    * characters ≥ 70% of non-space characters; stopword tokens ≥ 2%
    * of words (the "natural prose" signal). */
  def gopherFlags(docs: DataFrame, idCol: Column, textCol: Column,
      minWords: Long = 50L, maxWords: Long = 100000L): DataFrame = {
    // null text = empty text (every rule rejects), not null flags —
    // a curation gate must never emit three-valued booleans
    val text = coalesce(textCol, lit(""))
    val toks = split(lower(trim(text)), "\\s+")
    val nWords = size(toks).cast("long")
    val nChars = length(regexp_replace(trim(text), "\\s+", ""))
      .cast("long")
    val nAlpha = length(regexp_replace(text, "[^a-zA-Z]", ""))
      .cast("long")
    val stopArr = array(EnglishStopwords.map(lit): _*)
    val stopHits = size(filter(toks,
      w => array_contains(stopArr, w))).cast("long")
    docs.select(idCol.as("doc_id"), nWords.as("n_words"),
      nChars.as("__nc"), nAlpha.as("__na"), stopHits.as("__sh"))
      // `div` (not `/`, which is float division) keeps the ×100 mean
      // an exact integer on both engines
      .withColumn("mean_word_len_x100", when(col("n_words") > 0L,
        expr("(__nc * 100) div n_words")).otherwise(0L))
      .select(col("doc_id"), col("n_words"),
        col("mean_word_len_x100"),
        (col("n_words") >= minWords && col("n_words") <= maxWords)
          .as("ok_word_count"),
        (col("mean_word_len_x100") >= 300L &&
          col("mean_word_len_x100") <= 1000L).as("ok_mean_len"),
        (col("__na") * 10L >= col("__nc") * 7L).as("ok_alpha"),
        (col("__sh") * 50L >= col("n_words")).as("ok_stopwords"))
      .withColumn("pass",
        col("ok_word_count") && col("ok_mean_len") && col("ok_alpha") &&
          col("ok_stopwords"))
  }

  /** Line-rule filtering with reassembly — the C4/FineWeb per-line
    * pass that document-level quality gates miss: drop every line with
    * fewer than `minTokens` whitespace tokens or with alphabetic
    * characters covering less than half its length (exact integer
    * comparison `2·alpha ≥ len` — no float ratio), then rebuild the
    * document from the survivors in order.
    *
    * Entirely higher-order column functions over the split array — a
    * single codegen'd map stage, NO shuffle (unlike
    * [[Dedup.dedupLines]], whose ownership is corpus-global); at
    * 100 TB this is scan-bound like the other quality signals.
    * Returns (doc_id, n_lines, n_kept, clean_text). */
  def filterLines(df: DataFrame, idCol: Column, textCol: Column,
      minTokens: Int = 3, sep: String = "\n"): DataFrame = {
    // null text = empty document: size(null) is -1, not 0
    val lines = split(coalesce(textCol, lit("")), sep)
    val kept = filter(lines, l =>
      size(split(trim(l), "\\s+")) >= minTokens &&
        size(regexp_extract_all(l, lit("[A-Za-z]"), lit(0))) * 2 >=
          length(l))
    df.select(idCol.as("doc_id"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      array_join(kept, sep).as("clean_text"))
  }

  /** Per-document zlib compression ratio (deflated bytes / UTF-8
    * bytes, round-6) — the classic repetition/boilerplate proxy: prose
    * sits well under 1, heavily repeated or templated text collapses
    * toward 0, and random-ish payloads push past it. Deterministic for
    * a fixed deflate level; a pure map stage (one Deflater per row,
    * reset-free). Empty/null text scores 1.0 (incompressible by
    * convention, never a divide-by-zero). */
  def compressionRatio(docs: DataFrame, idCol: Column, textCol: Column,
      level: Int = 6): DataFrame = {
    require(level >= 1 && level <= 9, s"deflate level 1..9, got $level")
    val ratio = udf((t: String) => {
      if (t == null || t.isEmpty) 1.0
      else {
        val in = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val d = new java.util.zip.Deflater(level)
        try {
          d.setInput(in); d.finish()
          val buf = new Array[Byte](in.length + 64)
          var out = 0
          while (!d.finished()) out += d.deflate(buf, 0,
            buf.length) // single buffer: out caps at buf.length per call
          BigDecimal(out.toDouble / in.length)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        } finally d.end()
      }
    })
    docs.select(idCol.as("doc_id"), ratio(textCol).as("zlib_ratio"),
      length(textCol).cast("long").as("n_bytes"))
  }

  /** Zipf rank–frequency fit over the corpus vocabulary: least-squares
    * slope/intercept of ln(count) against ln(rank) for the top-`topV`
    * tokens — the one-row corpus-health readout (natural language sits
    * near slope −1; template/boilerplate corpora flatten it, OCR noise
    * steepens the tail). Returns (n_tokens, slope, intercept).
    *
    * Determinism: ranks come from the deterministic (count desc, token
    * asc) total order; x = ln(rank) and y = ln(count) are round-9 lns
    * of exact integers; the regression moments Σx, Σy, Σx², Σxy
    * accumulate as DECIMAL (exact, order-free — the q1_agg discipline,
    * because a double Σxy over thousands of terms flips its last ulp
    * with partitioning), and only the final slope/intercept divisions
    * are doubles (round-6). Scale shape: one map-side-combined token
    * count, the skew-proof two-phase top-V, then a V-row aggregate. */
  def zipfFit(df: DataFrame, textCol: Column, topV: Int): DataFrame = {
    require(topV >= 2, "need at least 2 ranks to fit a slope")
    val counts = df.select(explode(tokens(textCol)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val ranked = Sampling.topKPerGroup(counts, lit(1), col("c"),
      col("w").asc, topV)
    val xy = ranked.select(
      round(log(col("rank").cast("double")), 9)
        .cast("decimal(15,9)").as("x"),
      round(log(col("c").cast("double")), 9)
        .cast("decimal(15,9)").as("y"))
    // the SUMS are exact decimals (order-free); the closed-form slope
    // then runs on 5 scalars in double — one deterministic expression
    fitLine(xy, "n_tokens")
  }

  /** Shared least-squares tail of [[zipfFit]]/[[heapsFit]]: exact
    * DECIMAL moments of a (x, y) point table (both round-9 lns), then
    * the closed-form slope/intercept on 5 double scalars. */
  private def fitLine(xy: DataFrame, nName: String): DataFrame = {
    val agg = xy.agg(count(lit(1)).cast("double").as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y")).cast("double").as("sy"),
      sum(col("x") * col("x")).cast("double").as("sxx"),
      sum(col("x") * col("y")).cast("double").as("sxy"))
    // n·sxx − sx² = 0 ⟺ fewer than 2 distinct x survive (one fitted
    // point, or all checkpoints collapsing to one) — a silent 0/0
    // would emit NaN/null slope; fail loudly like every other
    // degenerate-input path in the repo
    val den0 = col("n") * col("sxx") - col("sx") * col("sx")
    val den = when(den0 > 0d, den0).otherwise(raise_error(concat(
      lit("fitLine: fewer than 2 distinct x values (n="),
      col("n").cast("long").cast("string"),
      lit(") — cannot fit a slope"))))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) / den
    agg.select(col("n").cast("long").as(nName),
      round(slope, 6).as("slope"),
      round((col("sy") - slope * col("sx")) / col("n"), 6)
        .as("intercept"))
  }

  /** Heaps'-law vocabulary-growth fit — [[zipfFit]]'s companion
    * corpus-health readout: least squares of ln V(n) against ln n at
    * `points` evenly spaced token-count checkpoints, where V(n) is the
    * number of DISTINCT tokens among the corpus's first n tokens (docs
    * ordered by id). Natural corpora sit near β ≈ 0.5–0.8; β → 1 means
    * vocabulary never saturates (noise/IDs), β → 0 means template text.
    * Returns (n_points, total_tokens, total_vocab, slope, intercept).
    *
    * Exactness: each token's global position is its doc's exact prefix
    * offset ([[Packing.withGlobalPrefix]] — range-sort + broadcast
    * prefix, no one-task window) plus its in-doc ordinal; first
    * occurrences are integer mins; checkpoints are exact integer
    * ceilings `(T·k + P−1) div P`; V counts are integers; only the
    * final lns/fit touch floats (the zipfFit discipline). Scale shape:
    * one prefix pass, one map-side-combined min per token, a
    * vocab × points broadcast range join, a points-row regression. */
  def heapsFit(df: DataFrame, idCol: Column, textCol: Column,
      points: Int = 8): DataFrame = {
    require(points >= 2, "need at least 2 checkpoints to fit a slope")
    val base = df.select(idCol.as("__id"), tokens(textCol).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
    val pref = Packing.withGlobalPrefix(base, col("__id"), col("__n"))
    val tok = pref.select(col("offset"),
        posexplode(col("__toks")).as(Seq("__p", "__w")))
      .select((col("offset") + col("__p") + 1L).as("__gpos"),
        col("__w"))
    val fo = tok.groupBy(col("__w")).agg(min(col("__gpos")).as("__fo"))
    val totals = base.agg(sum(col("__n")).as("__t"))
    val ck = totals
      .select(col("__t"),
        explode(sequence(lit(1), lit(points))).as("__k"))
      .select(col("__t"),
        expr(s"(__t * __k + ${points - 1}) div $points").as("__nk"))
      // a tiny corpus can repeat a checkpoint — dedup, or the range
      // join would double-count V at the repeated n
      .distinct()
    val v = fo.join(broadcast(ck), col("__fo") <= col("__nk"))
      .groupBy(col("__nk"), col("__t"))
      .agg(count(lit(1)).as("__v"))
    val vocab = fo.agg(count(lit(1)).as("__vocab"))
    val xy = v.select(col("__t"), col("__v"),
      round(log(col("__nk").cast("double")), 9)
        .cast("decimal(15,9)").as("x"),
      round(log(col("__v").cast("double")), 9)
        .cast("decimal(15,9)").as("y"))
    fitLine(xy.select(col("x"), col("y")), "n_points")
      .crossJoin(broadcast(totals.select(col("__t").as("total_tokens"))))
      .crossJoin(broadcast(vocab.select(col("__vocab").as("total_vocab"))))
      .select(col("n_points"), col("total_tokens"), col("total_vocab"),
        col("slope"), col("intercept"))
  }
}
