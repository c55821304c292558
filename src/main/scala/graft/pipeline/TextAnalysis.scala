package graft.pipeline

import org.apache.spark.sql.Column
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

  private def countMatches(text: Column, pattern: String): Column =
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
}
