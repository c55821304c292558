package graft.pipeline

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-document line dedup (the C4/RefinedWeb pass): first-occurrence
  * keep, ordered reassembly, and the standing-index fold law. */
class LineDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // banner duplicated in docs 0/2/3; "alpha beta" duplicated in 0/1;
  // doc 3 is made ENTIRELY of lines owned elsewhere
  private lazy val docs = Seq(
    (0L, "accept cookies\nalpha beta\nunique zero"),
    (1L, "first one\nalpha beta\nlast one"),
    (2L, "accept cookies\nonly here"),
    (3L, "accept cookies\nalpha beta")
  ).toDF("doc_id", "text")

  private def byId(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("first occurrence kept, later occurrences dropped, order stable") {
    val out = byId(
      Dedup.dedupLines(docs, col("doc_id"), col("text")).collect())
    assert(out(0L).getAs[String]("clean_text") ===
      "accept cookies\nalpha beta\nunique zero")
    assert(out(0L).getAs[Long]("n_kept") === 3L)
    // doc 1 loses "alpha beta" (owned by doc 0), keeps its own lines
    assert(out(1L).getAs[String]("clean_text") === "first one\nlast one")
    assert(out(1L).getAs[Long]("n_lines") === 3L)
    assert(out(1L).getAs[Long]("n_kept") === 2L)
    // doc 2 loses the banner, keeps the singleton
    assert(out(2L).getAs[String]("clean_text") === "only here")
    // doc 3: every line owned elsewhere -> empty rewrite, still a row
    assert(out(3L).getAs[String]("clean_text") === "")
    assert(out(3L).getAs[Long]("n_kept") === 0L)
  }

  test("within-document duplicate lines also collapse to the first") {
    val d = Seq((7L, "same line\nsame line\nother")).toDF("doc_id", "text")
    val out = Dedup.dedupLines(d, col("doc_id"), col("text")).collect()(0)
    assert(out.getAs[String]("clean_text") === "same line\nother")
    assert(out.getAs[Long]("n_kept") === 2L)
  }

  test("index fold law: any batch split rewrites like the one-shot pass") {
    val oneShot = Dedup.dedupLines(docs, col("doc_id"), col("text"))
      .collect().map(_.toString).sorted
    for (cut <- Seq(0L, 1L, 2L)) {
      val a = Dedup.buildLineIndex(
        docs.where(col("doc_id") <= cut), col("doc_id"), col("text"))
      val b = Dedup.buildLineIndex(
        docs.where(col("doc_id") > cut), col("doc_id"), col("text"))
      val folded = Dedup.foldLineIndex(a, b)
      val inc = Dedup.dedupLinesWithIndex(
        docs, col("doc_id"), col("text"), folded)
        .collect().map(_.toString).sorted
      assert(inc === oneShot, s"cut=$cut")
    }
  }

  test("result is partitioning-independent") {
    val out1 = Dedup.dedupLines(docs.repartition(7), col("doc_id"),
      col("text")).collect().map(_.toString).sorted
    val out2 = Dedup.dedupLines(docs.coalesce(1), col("doc_id"),
      col("text")).collect().map(_.toString).sorted
    assert(out1 === out2)
  }

  test("cutDuplicatedSpans: owner keeps its copy, later occurrences " +
      "cut with overlapping windows unioned; intra-doc repeats cut; " +
      "short docs untouched") {
    val d = Seq(
      (0L, "a b c d e f"),                // owner of "a b c d"/"b c d e"
      (1L, "x y a b c d e q r s"),        // both repeats -> cut 2..6
      (2L, "a b c d z"),                  // one repeat -> cut 0..3
      (3L, "m n o p m n o p"),            // intra-doc repeat of "m n o p"
      (4L, "t u")                         // shorter than the window
    ).toDF("doc_id", "text")
    val out = Dedup.cutDuplicatedSpans(d, col("doc_id"), col("text"),
      windowTokens = 4).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_cut"),
          r.getAs[String]("clean_text")))).toMap
    assert(out(0L) === ((6L, 0L, "a b c d e f")))
    assert(out(1L) === ((10L, 5L, "x y q r s")))
    assert(out(2L) === ((5L, 4L, "z")))
    assert(out(3L) === ((8L, 4L, "m n o p")))
    assert(out(4L) === ((2L, 0L, "t u")))
    // partitioning independence
    val out2 = Dedup.cutDuplicatedSpans(d.repartition(5), col("doc_id"),
      col("text"), windowTokens = 4).collect()
      .map(_.toString).sorted.toSeq
    assert(out2 === Dedup.cutDuplicatedSpans(d.coalesce(1),
      col("doc_id"), col("text"), windowTokens = 4).collect()
      .map(_.toString).sorted.toSeq)
  }

  test("hot-key degrade: one line duplicated across 20k docs — the " +
      "ownership state stays a single min and the rewrite stays exact") {
    import spark.implicits._
    val hot = spark.range(20000).selectExpr("id AS doc_id",
      "concat('every page has this banner\n', 'unique line ', id) AS text")
    val out = Dedup.dedupLines(hot, col("doc_id"), col("text"))
    val agg = out.agg(
      sum(when(col("n_kept") === 2L, 1L).otherwise(0L)),
      sum(when(col("n_kept") === 1L, 1L).otherwise(0L))).head()
    // exactly one doc (id 0) keeps the banner; all others keep only
    // their unique line
    assert(agg.getLong(0) === 1L && agg.getLong(1) === 19999L)
  }

  test("filterLines drops short and non-alphabetic lines, keeps order") {
    val d = Seq(
      (0L, "the quick brown fox\n?? !! ...\nok\nlazy dogs sleep here"),
      (1L, "1 2 3 4 5 6 7 8\nwords only all good")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.filterLines(d, col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[String]("clean_text") ===
      "the quick brown fox\nlazy dogs sleep here")
    assert(out(0L).getAs[Long]("n_lines") === 4L)
    assert(out(0L).getAs[Long]("n_kept") === 2L)
    // digits-only line: 8 tokens but 0 alpha -> dropped
    assert(out(1L).getAs[String]("clean_text") === "words only all good")
  }
}

/** Unicode-script composition profile. */
class ScriptProfileSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("counts, ppm, and dominant script") {
    val docs = Seq(
      (0L, "hello world"),            // pure latin
      (1L, "привет мир"),             // pure cyrillic
      (2L, "ab привет"),              // cyrillic majority (6 > 2)
      (3L, "...!!! 123"),             // nothing scripted -> other
      (4L, "αβ 你你")                  // greek ties cjk -> greek (earlier)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scriptProfile(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[String]("dominant") === "latin")
    assert(out(0L).getAs[Long]("n_latin") === 10L)
    assert(out(0L).getAs[Long]("n_chars") === 11L)
    assert(out(0L).getAs[Long]("ppm_latin") === 10L * 1000000L / 11L)
    assert(out(1L).getAs[String]("dominant") === "cyrillic")
    assert(out(1L).getAs[Long]("n_cyrillic") === 9L)
    assert(out(2L).getAs[String]("dominant") === "cyrillic")
    assert(out(3L).getAs[String]("dominant") === "other")
    assert(out(3L).getAs[Long]("ppm_latin") === 0L)
    assert(out(4L).getAs[String]("dominant") === "greek")
    assert(out(4L).getAs[Long]("n_cjk") === 2L)
  }

  test("latin wins ties against every later script") {
    val docs = Seq((0L, "ab яж")).toDF("doc_id", "text") // 2 vs 2
    val out = TextAnalysis.scriptProfile(docs, col("doc_id"), col("text"))
      .collect()(0)
    assert(out.getAs[String]("dominant") === "latin")
  }

  test("null text is an empty document everywhere — never a dropped " +
      "row, a -1 size, or a descending sequence") {
    val docs = Seq((0L, "real line\nmore text here"), (1L, null))
      .toDF("doc_id", "text")
    val dl = Dedup.dedupLines(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(dl.keySet === Set(0L, 1L))
    assert(dl(1L).getAs[Long]("n_lines") === 1L) // one empty line
    val fl = TextAnalysis.filterLines(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(fl(1L).getAs[Long]("n_lines") === 1L &&
      fl(1L).getAs[Long]("n_kept") === 0L &&
      fl(1L).getAs[String]("clean_text") === "")
    val sp = TextAnalysis.scriptProfile(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(sp(1L).getAs[Long]("n_chars") === 0L &&
      sp(1L).getAs[String]("dominant") === "other")
    val sc = Dedup.cutDuplicatedSpans(docs, col("doc_id"), col("text"),
      windowTokens = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(sc(1L).getAs[Long]("n_tokens") === 0L &&
      sc(1L).getAs[String]("clean_text") === "")
    // null URL rows are excluded loudly, not nulled through the join
    val urls = Seq((0L, "https://a.com/x"), (1L, null))
      .toDF("doc_id", "u")
    val ud = UrlAnalysis.urlDedupTable(urls, col("doc_id"), col("u"))
      .collect()
    assert(ud.map(_.getAs[Long]("doc_id")).toSet === Set(0L))
  }
}
