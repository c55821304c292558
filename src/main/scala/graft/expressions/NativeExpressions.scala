package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions over the [[Kernels]] single-pass JVM
  * kernels (SURVEY.md §4.2: custom `Expression` with `doGenCode` where
  * the built-in operators genuinely can't express it efficiently).
  *
  * These replace interpreted higher-order-function formulations
  * (`transform`/`aggregate` lambdas evaluate row-at-a-time interpreted)
  * on the pipeline hot paths — document fingerprinting drops from an
  * explode + shuffle + join plan to ONE codegen'd map stage. Semantics
  * are value-identical to the formulations they replace
  * (NativeExpressionsSpec asserts equality on real data).
  */
object native {

  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  /** Distinct word n-gram shingles — TextAnalysis.shingles, one pass. */
  def wordShingles(text: Column, n: Int): Column =
    c(WordShinglesExpr(e(text), n))

  /** ALL word n-grams with multiplicity (non-distinct
    * [[wordShingles]]) — the bigram LM's pair stream, one pass. */
  def wordNgrams(text: Column, n: Int): Column =
    c(WordNgramsExpr(e(text), n))

  /** Min-md5-shingle document fingerprint — zero-shuffle form of
    * TextAnalysis.fingerprintTable. */
  def minShingleFingerprint(text: Column, n: Int): Column =
    c(MinShingleFingerprintExpr(e(text), n))

  /** Heuristic language ID — TextAnalysis.langId in one run scan. */
  def langId(text: Column): Column = c(LangIdExpr(e(text)))

  /** 32-bit simhash of whitespace tokens — Dedup.simhashTable values
    * without the explode + 32-aggregate shuffle. */
  def simhash32(text: Column, useMd5: Boolean): Column =
    c(SimHash32Expr(e(text), useMd5))

  /** k-element MinHash signature over a shingle array —
    * Dedup.minhashSignatureTable values without the shuffle. */
  def minhashSig(shingles: Column, seeds: Seq[Long]): Column =
    c(MinHashSigExpr(e(shingles), seeds.toArray))

  /** Rolling polynomial token hash — TextAnalysis.rollingHash. */
  def rollingHash(text: Column): Column = c(RollingHashExpr(e(text)))

  /** Content-defined chunk texts — TextAnalysis.cdcChunks. */
  def cdcChunks(text: Column, w: Int, base: Long, modulus: Int): Column =
    c(CdcChunksExpr(e(text), w, base, modulus))

  /** Winnowing fingerprints (packed pos+hash longs) —
    * TextAnalysis.winnow. */
  def winnow(text: Column, k: Int, w: Int): Column =
    c(WinnowExpr(e(text), k, w))

  /** Epoch milliseconds of a TIMESTAMP_NTZ column with the naive value
    * read as UTC — session-time-zone-free (an NTZ→LTZ cast bakes the
    * session zone in at analysis time; this reinterprets the stored
    * micros directly, so the result is identical in every session). */
  def ntzEpochMillis(ts: Column): Column = c(NtzEpochMillisExpr(e(ts)))

  /** Epoch microseconds of a TIMESTAMP_NTZ column, naive-as-UTC — the
    * full-precision sibling of [[ntzEpochMillis]] (NTZ stores epoch
    * micros internally; this is a pure reinterpretation). */
  def ntzEpochMicros(ts: Column): Column = c(NtzEpochMicrosExpr(e(ts)))

  /** Max within-document token frequency — turns the repetition
    * profile's mode count from explode + two shuffles into a map
    * stage. */
  def topTokenCount(text: Column): Column = c(TopTokenCountExpr(e(text)))

  /** Unicode NFC normalization — TextAnalysis.normalizeNfc. */
  def normalizeNfc(text: Column): Column = c(NormalizeNfcExpr(e(text)))

  /** Mean token length — TextAnalysis.meanWordLength. */
  def meanWordLength(text: Column): Column = c(MeanWordLenExpr(e(text)))

  /** Stopword-token fraction — TextAnalysis.stopwordRatio. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    c(StopwordRatioExpr(e(text), stopwords))

  /** Cosine similarity over two array<double> columns (null on zero
    * norm) — Ann.cosine without the interpreted fold. */
  def cosine(a: Column, b: Column): Column = c(CosineSimExpr(e(a), e(b)))

  /** L2 normalization of an array<float|double> column (null on zero
    * norm): one O(d) pass, vs O(d²) for a norm aggregate inlined into
    * a per-element transform lambda. */
  def l2normalize(a: Column): Column = c(L2NormalizeExpr(e(a)))
}

/** Unit-length copy of a float/double array column; null on zero norm
  * or null input. Element type resolved from the child at bind time;
  * output is always array<double>. */
final case class L2NormalizeExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_l2_normalize"

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else Kernels.l2normalize(v.asInstanceOf[ArrayData], isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cg = child.genCode(ctx)
    val arr = ctx.freshName("l2arr")
    val code =
      code"""
        ${cg.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${cg.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $arr =
            graft.expressions.Kernels.l2normalize(${cg.value}, $isFloat);
          if ($arr != null) {
            ${ev.isNull} = false;
            ${ev.value} = $arr;
          }
        }"""
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : L2NormalizeExpr = copy(child = newChild)
}

final case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.wordShingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, cv => s"graft.expressions.Kernels.wordShingles($cv, $n)")
  override protected def withNewChildInternal(newChild: Expression)
      : WordShinglesExpr = copy(child = newChild)
}

final case class WordNgramsExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "n-gram size must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.wordNgrams(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, cv => s"graft.expressions.Kernels.wordNgrams($cv, $n)")
  override protected def withNewChildInternal(newChild: Expression)
      : WordNgramsExpr = copy(child = newChild)
}

final case class MinShingleFingerprintExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fingerprint"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.minShingleFingerprint(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      cv => s"graft.expressions.Kernels.minShingleFingerprint($cv, $n)")
  override protected def withNewChildInternal(newChild: Expression)
      : MinShingleFingerprintExpr = copy(child = newChild)
}

final case class LangIdExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_langid"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.langId(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, cv => s"graft.expressions.Kernels.langId($cv)")
  override protected def withNewChildInternal(newChild: Expression)
      : LangIdExpr = copy(child = newChild)
}

final case class SimHash32Expr(child: Expression, useMd5: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash32"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.simhash32(input.asInstanceOf[UTF8String], useMd5)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      cv => s"graft.expressions.Kernels.simhash32($cv, $useMd5)")
  override protected def withNewChildInternal(newChild: Expression)
      : SimHash32Expr = copy(child = newChild)
}

/** Null when the input array is empty (a doc with no shingles has no
  * signature — mirrors the groupBy formulation, which emits no row). */
final case class MinHashSigExpr(child: Expression, seeds: Array[Long])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  @transient private lazy val seedArr: Array[Long] = seeds

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == 0) null else Kernels.minhashSig(arr, seedArr)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedRef = ctx.addReferenceObj("seeds", seeds, "long[]")
    val childGen = child.genCode(ctx)
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${childGen.isNull} && ${childGen.value}.numElements() > 0) {
          ${ev.isNull} = false;
          ${ev.value} =
            graft.expressions.Kernels.minhashSig(${childGen.value}, $seedRef);
        }"""
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSigExpr = copy(child = newChild)

  // Array[Long] equality is reference-based; make the expression tree
  // canonicalization stable across copies
  override def equals(other: Any): Boolean = other match {
    case MinHashSigExpr(c2, s2) =>
      child == c2 && java.util.Arrays.equals(seeds, s2)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(seeds)
}

final case class RollingHashExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.rollingHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, cv => s"graft.expressions.Kernels.rollingHash($cv)")
  override protected def withNewChildInternal(newChild: Expression)
      : RollingHashExpr = copy(child = newChild)
}

final case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 1, "bad winnowing parameters")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.winnowFingerprints(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      cv => s"graft.expressions.Kernels.winnowFingerprints($cv, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression)
      : WinnowExpr = copy(child = newChild)
}

final case class CdcChunksExpr(child: Expression, w: Int, base: Long,
    modulus: Int) extends UnaryExpression {
  require(w >= 1 && base >= 2 && modulus >= 2, "bad CDC parameters")
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.cdcChunks(input.asInstanceOf[UTF8String], w, base, modulus)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      cv => s"graft.expressions.Kernels.cdcChunks($cv, $w, ${base}L, $modulus)")
  override protected def withNewChildInternal(newChild: Expression)
      : CdcChunksExpr = copy(child = newChild)
}

/** TIMESTAMP_NTZ stores wall-clock micros since 1970-01-01T00:00 with no
  * zone; reinterpreting that long as UTC epoch micros (then floor-div to
  * millis, matching `unix_millis`' floor semantics) involves no
  * dependence on `spark.sql.session.timeZone`. */
final case class NtzEpochMillisExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ntz_epoch_millis"
  override protected def nullSafeEval(input: Any): Any =
    Math.floorDiv(input.asInstanceOf[Long], 1000L)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, cv => s"java.lang.Math.floorDiv($cv, 1000L)")
  override protected def withNewChildInternal(newChild: Expression)
      : NtzEpochMillisExpr = copy(child = newChild)
}

final case class NtzEpochMicrosExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ntz_epoch_micros"
  override protected def nullSafeEval(input: Any): Any =
    input.asInstanceOf[Long]
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, cv => cv)
  override protected def withNewChildInternal(newChild: Expression)
      : NtzEpochMicrosExpr = copy(child = newChild)
}

final case class NormalizeNfcExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, cv => s"graft.expressions.Kernels.nfc($cv)")
  override protected def withNewChildInternal(newChild: Expression)
      : NormalizeNfcExpr = copy(child = newChild)
}

final case class TopTokenCountExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_top_token_count"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.topTokenCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, cv => s"graft.expressions.Kernels.topTokenCount($cv)")
  override protected def withNewChildInternal(newChild: Expression)
      : TopTokenCountExpr = copy(child = newChild)
}

final case class MeanWordLenExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_mean_word_len"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.meanWordLength(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, cv => s"graft.expressions.Kernels.meanWordLength($cv)")
  override protected def withNewChildInternal(newChild: Expression)
      : MeanWordLenExpr = copy(child = newChild)
}

final case class StopwordRatioExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_stopword_ratio"

  @transient private lazy val set: java.util.Set[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    Kernels.stopwordRatio(input.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopwords", set, "java.util.Set")
    defineCodeGen(ctx, ev,
      cv => s"graft.expressions.Kernels.stopwordRatio($cv, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : StopwordRatioExpr = copy(child = newChild)
}

/** Cosine over two array<double> columns; null on zero norm (and on
  * null inputs). Accumulation order matches the sequential Column fold
  * it replaces — bit-identical doubles. */
final case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val out = Kernels.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (out == null) null else out.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lg = left.genCode(ctx)
    val rg = right.genCode(ctx)
    val boxed = ctx.freshName("cosBoxed")
    val code =
      code"""
        ${lg.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${lg.isNull}) {
          ${rg.code}
          if (!${rg.isNull}) {
            java.lang.Double $boxed =
              graft.expressions.Kernels.cosine(${lg.value}, ${rg.value});
            if ($boxed != null) {
              ${ev.isNull} = false;
              ${ev.value} = $boxed.doubleValue();
            }
          }
        }"""
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}
