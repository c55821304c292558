package graft.pipeline

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-level curation operators: contamination screening, boilerplate
  * n-gram mining, URL/domain analysis, deterministic global shuffle. */
class CorpusOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- contamination ---------------------------------------------------

  test("contamination: verbatim copy scores 1.0, disjoint doc 0.0") {
    val train = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "completely unrelated prose about distributed systems design"))
      .toDF("id", "text")
    val eval = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    val out = Contamination.overlapTable(train, col("id"), col("text"),
      eval, col("text")).orderBy("doc_id").collect()
    assert(out(0).getAs[Double]("contamination") === 1.0)
    assert(out(1).getAs[Double]("contamination") === 0.0)
    assert(out(1).getAs[Long]("overlap_ngrams") === 0L)
  }

  test("contamination: partial overlap is the exact distinct-ngram fraction") {
    // train doc: 6 tokens -> 4 distinct 3-grams; the first 5 tokens
    // (3 shingles) appear verbatim in the eval doc -> 3/4
    val train = Seq((0L, "a b c d e zz")).toDF("id", "text")
    val eval = Seq((1L, "a b c d e different tail")).toDF("id", "text")
    val r = Contamination.overlapTable(train, col("id"), col("text"),
      eval, col("text")).collect()(0)
    assert(r.getAs[Long]("n_shingles") === 4L)
    assert(r.getAs[Long]("overlap_ngrams") === 3L)
    assert(r.getAs[Double]("contamination") === 0.75)
  }

  test("contamination: sub-n-token docs are excluded, threshold filters") {
    val train = Seq((0L, "too short"), (1L, "a b c d")).toDF("id", "text")
    val eval = Seq((9L, "a b c")).toDF("id", "text")
    val all = Contamination.overlapTable(train, col("id"), col("text"),
      eval, col("text"))
    assert(all.select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(1L))
    val hits = Contamination.contaminated(train, col("id"), col("text"),
      eval, col("text"), threshold = 0.5)
    assert(hits.count() === 1) // 1 of 2 shingles matches = 0.5
    assert(Contamination.contaminated(train, col("id"), col("text"),
      eval, col("text"), threshold = 0.6).count() === 0)
  }

  // ---- boilerplate n-gram mining ---------------------------------------

  test("commonNgrams: document frequency, minDf cut, deterministic order") {
    val docs = Seq(
      (0L, "all rights reserved by the author"),
      (1L, "all rights reserved forever"),
      (2L, "all rights reserved by the author"), // verbatim duplicate
      (3L, "no shared phrases in this one"))
      .toDF("id", "text")
    val out = TextAnalysis.commonNgrams(docs, col("id"), col("text"),
      n = 3, minDf = 2L, k = 10).collect()
    val freq = out.map(r =>
      r.getAs[String]("ngram") -> r.getAs[Long]("doc_freq")).toMap
    assert(freq("all rights reserved") === 3L)
    assert(freq("rights reserved by") === 2L)
    assert(!freq.contains("no shared phrases")) // df 1 < minDf
    // ordering: doc_freq desc then ngram asc
    assert(out.head.getAs[String]("ngram") === "all rights reserved")
    val after = out.tail.map(_.getAs[Long]("doc_freq"))
    assert(after.forall(_ <= out.head.getAs[Long]("doc_freq")))
  }

  test("commonNgrams: duplicate n-gram inside ONE doc counts once") {
    val docs = Seq((0L, "x y z x y z x y z"), (1L, "x y z end"))
      .toDF("id", "text")
    val freq = TextAnalysis.commonNgrams(docs, col("id"), col("text"),
      n = 3, minDf = 1L, k = 100).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(freq("x y z") === 2L) // per-doc distinct: once per document
  }

  test("bloom decontamination: contaminated docs flagged, clean pass; " +
      "agrees with the exact semi-join screen") {
    val eval = Seq((100L, "the secret benchmark answer is forty two"))
      .toDF("id", "text")
    val corpus = Seq(
      (0L, "prefix words then the secret benchmark answer is forty two"),
      (1L, "completely unrelated prose about distributed query engines"))
      .toDF("id", "text")
    val bloom = Contamination.evalNgramBloom(eval, col("text"),
      expectedItems = 1000L)
    val flagged = corpus.select(col("id"),
      Contamination.mightBeContaminated(bloom, col("text")).as("f"))
      .orderBy("id").collect().map(_.getBoolean(1))
    assert(flagged.toSeq === Seq(true, false))
    // exact screen agrees (no false positive at this scale)
    val exact = Contamination.contaminated(corpus, col("id"), col("text"),
      eval, col("text"), threshold = 1e-9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact === Set(0L))
  }

  test("bloom decontamination composes statelessly on a stream with " +
      "cleanup and quality filtering") {
    implicit val sqlCtx = spark.sqlContext
    val eval = Seq((100L, "the secret benchmark answer is forty two"))
      .toDF("id", "text")
    val bloom = Contamination.evalNgramBloom(eval, col("text"),
      expectedItems = 1000L)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val longTail = " and then a good deal of additional ordinary prose " +
      "follows here so the length based quality signal stays high for " +
      "this synthetic document under test today"
    val docs = input.toDS().toDF("doc_id", "text")
      .withColumn("text", TextAnalysis.cleanText(col("text")))
      .where(TextAnalysis.qualityScore(col("text")) >= 0.7)
      .where(!Contamination.mightBeContaminated(bloom, col("text")))
    val q = docs.writeStream.format("memory").queryName("scurate")
      .outputMode("append").start()
    try {
      input.addData(
        (0L, "a  clean\tdocument with ordinary text" + longTail),
        (1L, "contains the secret benchmark answer is forty two" + longTail),
        (2L, "x")) // fails the quality gate
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM scurate")
        .collect().map(_.getLong(0)).toSet
      assert(kept === Set(0L))
      // the cleanup ran inside the stream (control chars squeezed)
      val text = spark.sql("SELECT text FROM scurate").head().getString(0)
      assert(text.startsWith("a clean document"))
    } finally q.stop()
  }

  // ---- substring (token-window) dedup ----------------------------------

  test("duplicatedSpans: shared verbatim windows found, unique text not") {
    val boiler = "all rights reserved no part of this work may be reproduced"
    val docs = Seq(
      (0L, s"first document begins here $boiler and then diverges fully"),
      (1L, s"second one opens differently $boiler before its own ending"),
      (2L, "entirely original prose with no shared passage at all okay"))
      .toDF("id", "text")
    val spans = Dedup.duplicatedSpans(docs, col("text"),
      windowTokens = 8).collect()
    assert(spans.nonEmpty)
    assert(spans.forall(_.getAs[Long]("n_docs") === 2L))
    // the 11-token boilerplate contributes exactly 4 shared 8-windows
    // (the surrounding context differs, so longer overlaps don't exist)
    assert(spans.length === 4)
    val occ = Dedup.duplicatedSpanOccurrences(docs, col("id"), col("text"),
      windowTokens = 8)
    assert(occ.select("id").distinct().collect().map(_.getLong(0)).toSet
      === Set(0L, 1L))
    assert(occ.count() === 8) // 4 spans × 2 docs
  }

  test("duplicatedSpans: windows are distinct per doc (internal " +
      "repetition is not cross-doc duplication)") {
    val docs = Seq(
      (0L, "x y z x y z x y z x y z"), // internal repeats only
      (1L, "totally different words in this second document here"))
      .toDF("id", "text")
    assert(Dedup.duplicatedSpans(docs, col("text"),
      windowTokens = 3).count() === 0)
  }

  // ---- URL / domain analysis -------------------------------------------

  test("url extraction and domain normalization") {
    val df = Seq(
      (0L, "see https://WWW.Example.COM:8080/a/b?q=1 and http://sub.other.org/x"),
      (1L, "no links here")).toDF("id", "text")
    val rows = UrlAnalysis.urlTable(df, col("id"), col("text"))
      .orderBy("url").collect()
    assert(rows.length === 2)
    assert(rows.map(_.getAs[String]("domain")).toSet ===
      Set("example.com", "sub.other.org"))
    // port and www stripped, lowercased
    assert(rows.exists(r => r.getAs[String]("url")
      .startsWith("https://WWW.Example.COM:8080")
      && r.getAs[String]("domain") === "example.com"))
  }

  test("domainStats: url counts vs distinct doc counts") {
    val df = Seq(
      (0L, "https://a.com/1 https://a.com/2 https://b.com/x"),
      (1L, "https://a.com/3")).toDF("id", "text")
    val stats = UrlAnalysis.domainStats(df, col("id"), col("text"))
      .collect().map(r => r.getAs[String]("domain") ->
        ((r.getAs[Long]("n_urls"), r.getAs[Long]("n_docs")))).toMap
    assert(stats("a.com") === ((3L, 2L)))
    assert(stats("b.com") === ((1L, 1L)))
  }

  test("dropBlockedDomains keeps clean docs, drops any blocklisted mention") {
    val df = Seq(
      (0L, "fine doc https://good.org/x"),
      (1L, "bad doc https://spam.example/y and https://good.org/z"),
      (2L, "no urls at all")).toDF("id", "text")
    val kept = UrlAnalysis.dropBlockedDomains(df, col("text"),
      Seq("spam.example")).select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 2L))
    // null text mentions no domain — it must survive the filter
    val withNull = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(9L, null: String)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    assert(UrlAnalysis.dropBlockedDomains(withNull, col("text"),
      Seq("spam.example")).count() === 1)
  }

  // ---- deterministic global shuffle ------------------------------------

  test("hashSplit: exhaustive, disjoint, stable under corpus growth, " +
      "roughly calibrated") {
    val spark2 = spark
    import spark2.implicits._
    val df = (0L until 2000L).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.hashSplit(df, col("id"), splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size === 2000) // every row labeled exactly once
    val counts = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 1500 && counts("train") < 1700)
    assert(counts("val") > 120 && counts("val") < 280)
    // membership depends only on the key: a subset corpus agrees
    val sub = Sampling.hashSplit((0L until 500L).toDF("id"), col("id"),
      splits).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sub.forall { case (id, s) => out(id) === s })
    // invalid fractions rejected
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, col("id"), Seq("a" -> 0.5, "b" -> 0.6))
    }
  }

  test("splitLeakage: flags exactly the duplicate content that crosses " +
      "splits, silent on a clean corpus") {
    val spark2 = spark
    import spark2.implicits._
    // keys chosen so ids 1 and 2 land in different splits (verified
    // below), with identical text; id 3 is a same-split duplicate pair
    val docs = (0L until 400L).map(i => (i, s"text-$i")).toDF("id", "text")
    val splits = Seq("train" -> 0.5, "test" -> 0.5)
    val base = Sampling.hashSplit(docs, col("id"), splits)
    val labels = base.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val (aId, bId) = { // first cross-split pair
      val t = labels.collectFirst { case (id, "train") => id }.get
      val e = labels.collectFirst { case (id, "test") => id }.get
      (t, e)
    }
    val sameSplit = labels.collect { case (id, "train") => id }
      .filter(_ != aId).take(2).toIndexedSeq
    val planted = docs
      .withColumn("text", when(col("id") === bId, lit(s"text-$aId"))
        .when(col("id") === sameSplit(1), lit(s"text-${sameSplit(0)}"))
        .otherwise(col("text")))
    val leaks = Sampling.splitLeakage(
      Sampling.hashSplit(planted, col("id"), splits), col("text"))
      .collect()
    assert(leaks.length === 1, s"expected 1 leak, got ${leaks.toSeq}")
    assert(leaks(0).getAs[Long]("n_splits") === 2)
    assert(leaks(0).getAs[Long]("n_docs") === 2)
    assert(leaks(0).getAs[String]("splits") === "test,train")
    // clean corpus (all texts unique): nothing flagged
    assert(Sampling.splitLeakage(base, col("text")).count() === 0)
  }

  test("vocabCoverage: exact counts on a hand fixture, deterministic " +
      "tie-break at the vocabulary boundary") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      ("s1", "a a a b b c"),   // a:3 b:2 c:1
      ("s2", "a b d d e")      // d:2, e:1
    ).toDF("src", "text")
    // global counts: a:4 b:3 d:2 c:1 e:1 — V=4 keeps a,b,d and then
    // the c/e tie at count 1 resolves by token asc -> c
    val out = TextAnalysis.vocabCoverage(df, col("src"), col("text"), 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // s1: 6 tokens, all of a,b,c in vocab -> covered 6, oov 0
    assert(out("s1") === ((6L, 6L, 0L, 0L)))
    // s2: 5 tokens, e is OOV (1 occurrence) -> covered 4, 1 distinct
    // oov, ppm = 1e6 div 5 = 200000
    assert(out("s2") === ((5L, 4L, 1L, 200000L)))
  }

  test("globalShuffle: contiguous positions matching the hash total order") {
    val df = (0L until 500L).toDF("id")
    val out = Sampling.globalShuffle(df, col("id"), salt = "s1")
    val got = out.orderBy("shuffle_pos").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("shuffle_pos")))
    assert(got.map(_._2).toSeq === (0L until 500L).toSeq)
    // brute-force expected order on the driver
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): String = {
      md.reset()
      md.digest(s"s1$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val expected = (0L until 500L).sortBy(i => (h(i), i))
    assert(got.map(_._1).toSeq === expected)
  }

  test("tokenBudgetSample: budget met by first overshooting doc, " +
      "matches the single-window brute force, partitioning-proof") {
    val docs = (0L until 200L).map(i =>
      (i, if (i % 3 == 0) "a" else "b", 10L + (i % 7))).toDF("id", "s", "tok")
    val out = Sampling.tokenBudgetSample(docs, col("s"), col("id"),
      col("tok"), Map("a" -> 100L, "b" -> 55L))
    val got = out.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // brute force: driver-side cumulative walk in hash order
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(id: Long): Double = {
      md.reset()
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    val rows = (0L until 200L).map(i =>
      (i, if (i % 3 == 0) "a" else "b", 10L + (i % 7)))
    val expected = rows.groupBy(_._2).flatMap { case (s, grp) =>
      val budget = if (s == "a") 100L else 55L
      var cum = 0L
      grp.sortBy(r => (u(r._1), r._1.toString)).flatMap { r =>
        val admit = cum < budget
        cum += r._3
        if (admit) Some((r._1, r._2)) else None
      }
    }.toSet
    assert(got === expected)
    // each admitted set's tokens meet the budget (never undershoot)
    val byStratum = out.groupBy("s").agg(sum("tok").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum("a") >= 100L && byStratum("b") >= 55L)
    // independent of input partitioning
    val repart = Sampling.tokenBudgetSample(docs.repartition(13), col("s"),
      col("id"), col("tok"), Map("a" -> 100L, "b" -> 55L))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(repart === got)
    // raising a budget only ADDS documents
    val more = Sampling.tokenBudgetSample(docs, col("s"), col("id"),
      col("tok"), Map("a" -> 150L, "b" -> 55L))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.subsetOf(more))
  }

  test("tokenBudgetSample: zero default budget drops unlisted strata") {
    val docs = Seq((1L, "x", 5L), (2L, "y", 5L)).toDF("id", "s", "tok")
    val out = Sampling.tokenBudgetSample(docs, col("s"), col("id"),
      col("tok"), Map("x" -> 1L))
    assert(out.collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("globalShuffle: independent of input partitioning, salt re-deals") {
    val df = (0L until 300L).toDF("id")
    def order(d: org.apache.spark.sql.DataFrame, salt: String): Seq[Long] =
      Sampling.globalShuffle(d, col("id"), salt)
        .orderBy("shuffle_pos").collect().map(_.getAs[Long]("id")).toSeq
    val a = order(df, "x")
    assert(order(df.repartition(11), "x") === a)
    assert(order(df, "y") !== a)
    assert(a.sorted === (0L until 300L).toSeq) // a permutation
  }

  // ---- RAKE keywords -----------------------------------------------------

  test("rakeKeywords: stopwords split phrases; integer micro-scores " +
      "rank multiword phrases above low-degree words") {
    val docs = Seq(
      (0L, "alpha beta and alpha beta and gamma"),
      (1L, "alpha beta of delta")).toDF("doc_id", "text")
    val got = TextAnalysis.rakeKeywords(docs, col("doc_id"), col("text"),
        k = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("phrase")) ->
        ((r.getAs[Long]("score_micro"),
          r.getAs[Int]("rank").toLong))).toMap
    // occurrences: "alpha beta" x3 (docs 0,0,1), "gamma", "delta"
    // alpha: freq 3, degree 6 -> 2e6; beta same; gamma/delta: 1e6
    assert(got((0L, "alpha beta")) === ((4000000L, 1L)))
    assert(got((0L, "gamma")) === ((1000000L, 2L)))
    assert(got((1L, "alpha beta")) === ((4000000L, 1L)))
    assert(got((1L, "delta")) === ((1000000L, 2L)))
    // distinct phrases only: doc 0 has exactly two ranked rows
    assert(got.keys.count(_._1 == 0L) === 2)
  }

  test("ngramNovelty: first owner counts as novel, verbatim re-crawl " +
      "scores zero, within-doc repeats dedup") {
    val docs = Seq(
      (0L, "a b c d"),          // grams: "a b c", "b c d" — both novel
      (1L, "a b c d"),          // verbatim copy -> 0 novel
      (2L, "b c d e"),          // "b c d" seen (doc 0), "c d e" novel
      (3L, "q q q q q")         // one DISTINCT gram "q q q" -> novel
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty")))).toMap
    assert(got(0L) === ((2L, 2L, 1.0)))
    assert(got(1L) === ((2L, 0L, 0.0)))
    assert(got(2L) === ((2L, 1L, 0.5)))
    assert(got(3L) === ((1L, 1L, 1.0)))
  }

  test("novelty index folds associatively: any batch split accumulates " +
      "to the one-shot ngramNovelty") {
    val docs = Seq(
      (0L, "a b c d"), (1L, "a b c d"), (2L, "b c d e"),
      (3L, "e f g h"), (4L, "a b c x y z")).toDF("doc_id", "text")
    val oneShot = TextAnalysis.ngramNovelty(docs, col("doc_id"),
        col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel")))).toMap
    for (split <- Seq(1L, 2L, 3L)) {
      val a = docs.where(col("doc_id") < split)
      val b = docs.where(col("doc_id") >= split)
      val i1 = TextAnalysis.buildNoveltyIndex(a, col("doc_id"),
        col("text"))
      val o1 = TextAnalysis.noveltyWithIndex(a, col("doc_id"),
        col("text"), i1)
      val i12 = TextAnalysis.foldNoveltyIndex(i1,
        TextAnalysis.buildNoveltyIndex(b, col("doc_id"), col("text")))
      val o2 = TextAnalysis.noveltyWithIndex(b, col("doc_id"),
        col("text"), i12)
      val inc = o1.unionByName(o2).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"))))
        .toMap
      assert(inc === oneShot, s"split at $split diverges")
    }
  }

  test("gopherFlags: each rule rejects its planted pathology and good " +
      "prose passes") {
    val good = (1 to 30).map(i => s"the quick word$i fox").mkString(" ")
    val docs = Seq(
      (0L, good),                                     // passes all
      (1L, "too short text"),                         // word count
      (2L, (1 to 60).map(_ => "a").mkString(" ")),    // mean len < 3
      (3L, (1 to 60).map(i => s"!!## $i%%").mkString(" ")), // alpha
      (4L, (1 to 60).map(i => s"zz$i qq$i").mkString(" "))  // stopwords
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherFlags(docs, col("doc_id"), col("text"),
        minWords = 20L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("ok_word_count"),
          r.getAs[Boolean]("ok_mean_len"), r.getAs[Boolean]("ok_alpha"),
          r.getAs[Boolean]("ok_stopwords"),
          r.getAs[Boolean]("pass")))).toMap
    assert(got(0L)._5 === true, s"good prose rejected: ${got(0L)}")
    assert(!got(1L)._1 && !got(1L)._5)
    assert(!got(2L)._2 && !got(2L)._5)
    assert(!got(3L)._3 && !got(3L)._5)
    assert(!got(4L)._4 && !got(4L)._5)
  }

  test("gopherFlags: null text yields concrete false flags, never " +
      "three-valued booleans") {
    val docs = Seq((0L, null.asInstanceOf[String]), (1L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherFlags(docs, col("doc_id"), col("text"),
      minWords = 20L).collect()
    assert(got.length === 2)
    got.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("pass")), "pass must be concrete")
      assert(!r.getAs[Boolean]("pass"))
      assert(!r.getAs[Boolean]("ok_word_count"))
    }
  }

  test("compressionRatio: repetition compresses far below prose; " +
      "empty/null score 1.0; doubled text never compresses worse") {
    val prose = "the quick brown fox jumps over a lazy dog while " +
      "seventeen distinct zebras quietly evaluate novel compression"
    val docs = Seq(
      (0L, prose),
      (1L, Seq.fill(40)("spam spam").mkString(" ")),
      (2L, ""), (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextAnalysis.compressionRatio(docs, col("doc_id"),
        col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("zlib_ratio"))
      .toMap
    assert(got(1L) < got(0L) / 2, s"repetition must crush: $got")
    assert(got(2L) === 1.0 && got(3L) === 1.0)
    assert(got.values.forall(v => v > 0.0 && v <= 1.2))
    val doubled = TextAnalysis.compressionRatio(
      docs.where(col("text").isNotNull && length(col("text")) > 0)
        .select(col("doc_id"),
          concat(col("text"), lit(" "), col("text")).as("text")),
      col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("zlib_ratio"))
      .toMap
    doubled.foreach { case (id, r2) =>
      assert(r2 <= got(id) + 0.01, s"doc $id doubled ratio $r2 > ${got(id)}")
    }
  }
}
