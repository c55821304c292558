package graft.pipeline

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Curation-operator tests: PII detection/redaction and deterministic
  * sampling. */
class CurationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- PII -------------------------------------------------------------

  test("PII counts: emails, IPs, phones detected independently") {
    val df = Seq(
      (0L, "mail a.b-c_d@sub.example.org and e@x.io from 192.168.0.1 " +
        "call +1-555-0199"),
      (1L, "no pii here at all")).toDF("id", "text")
    val out = Pii.piiTable(df, col("id"), col("text"))
      .orderBy("id").collect()
    assert(out(0).getAs[Long]("n_emails") === 2)
    assert(out(0).getAs[Long]("n_ips") === 1)
    assert(out(0).getAs[Long]("n_phones") === 1)
    assert(out(1).getAs[Long]("n_emails") === 0)
    assert(out(1).getAs[Long]("n_ips") === 0)
    assert(out(1).getAs[Long]("n_phones") === 0)
  }

  test("PII redaction replaces every occurrence with typed placeholders") {
    val df = Seq((0L, "x@y.com then 10.0.0.1 then +44-123-4567 then x@y.com"))
      .toDF("id", "text")
    val red = Pii.piiTable(df, col("id"), col("text"))
      .collect()(0).getAs[String]("redacted")
    assert(red === "<EMAIL> then <IP> then <PHONE> then <EMAIL>")
  }

  test("PII: redaction consumes emails before the IP pass sees their domain") {
    // the domain embeds a dotted quad; email-first redaction must take
    // the whole address (counts stay independent detections on the raw
    // text, so the embedded quad still counts as an IP sighting)
    val df = Seq((0L, "ping bob@192.168.0.1.example.com now"))
      .toDF("id", "text")
    val row = Pii.piiTable(df, col("id"), col("text")).collect()(0)
    assert(row.getAs[String]("redacted") === "ping <EMAIL> now")
    assert(row.getAs[Long]("n_emails") === 1)
    assert(row.getAs[Long]("n_ips") === 1)
  }

  test("hasPii: clean text is clean") {
    val df = Seq((0L, "perfectly ordinary prose with no identifiers"),
      (1L, "reach me at someone@example.com")).toDF("id", "text")
    val flags = df.select(col("id"), Pii.hasPii(col("text")).as("f"))
      .orderBy("id").collect().map(_.getBoolean(1))
    assert(flags.toSeq === Seq(false, true))
  }

  // ---- text normalization ----------------------------------------------

  test("cleanText: NFC composes combining marks, control chars become " +
      "spaces, whitespace squeezes, ends trim") {
    val df = Seq(
      (0L, "café au lait"),          // decomposed é
      (1L, "ab\tc\r\nd"),            // bell, tab, CRLF
      (2L, "  padded   and    gappy  "),
      (3L, "already clean")).toDF("id", "text")
    val out = df.select(col("id"),
      TextAnalysis.cleanText(col("text")).as("c"))
      .orderBy("id").collect().map(_.getString(1))
    assert(out(0) === "café au lait")
    assert(out(0).length === 12) // é is ONE char after composition
    assert(out(1) === "a b c d")
    assert(out(2) === "padded and gappy")
    assert(out(3) === "already clean")
  }

  test("normalizeNfc: idempotent and equal to java.text.Normalizer") {
    val inputs = Seq("café", "é", "Ångström", "x")
    val df = inputs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "text")
    val got = df.select(col("id"),
      TextAnalysis.normalizeNfc(col("text")).as("n"))
      .orderBy("id").collect().map(_.getString(1))
    inputs.zip(got).foreach { case (in, out) =>
      assert(out === java.text.Normalizer.normalize(in,
        java.text.Normalizer.Form.NFC))
    }
  }

  // ---- repetition / vocabulary -----------------------------------------

  test("repetition signals: repetitive text scores low, diverse high") {
    val df = Seq(
      (0L, "spam spam spam spam spam"),
      (1L, "every word here is completely different"),
      (2L, "")).toDF("id", "text")
    val out = TextAnalysis.repetitionTable(df, col("id"), col("text"))
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("distinct_ratio") === 0.2)
    assert(out(0).getAs[Double]("bigram_ratio") === 0.25)
    assert(out(0).getAs[Double]("top_token_ratio") === 1.0)
    assert(out(1).getAs[Double]("distinct_ratio") === 1.0)
    assert(out(1).getAs[Double]("bigram_ratio") === 1.0)
    // empty text tokenizes to one empty token (split semantics)
    assert(out(2).getAs[Long]("n_tokens") === 1)
  }

  test("repetition ratios: native kernel ≡ HOF formulation on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
    val diverging = docs.select(
      TextAnalysis.distinctTokenRatio(col("text")).as("a"),
      TextAnalysis.distinctTokenRatioHof(col("text")).as("b"),
      TextAnalysis.distinctBigramRatio(col("text")).as("c"),
      TextAnalysis.distinctBigramRatioHof(col("text")).as("d"))
      .where(col("a") =!= col("b") || col("c") =!= col("d"))
    assert(diverging.count() === 0)
  }

  test("repetitionTable: native mode kernel ≡ explode formulation on " +
      "real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = TextAnalysis.repetitionTable(docs, col("doc_id"), col("text"))
    val b = TextAnalysis.repetitionTableShuffled(docs, col("doc_id"),
      col("text"))
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  test("chunking: windows advance by step, tail clamps, short docs whole") {
    val df = Seq(
      (0L, (1 to 10).map(i => s"t$i").mkString(" ")),
      (1L, "short doc")).toDF("id", "text")
    val out = TextAnalysis.chunk(df, col("id"), col("text"),
      chunkTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_id").collect()
    val doc0 = out.filter(_.getLong(0) == 0L)
    // starts 0,3,6: [t1..t4], [t4..t7], [t7..t10]
    assert(doc0.map(_.getAs[String]("chunk_text")).toSeq === Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(doc0.forall(_.getAs[Long]("n_tokens") === 4))
    val doc1 = out.filter(_.getLong(0) == 1L)
    assert(doc1.length === 1 &&
      doc1(0).getAs[String]("chunk_text") === "short doc")
    // overlap invariant: consecutive chunks share `overlap` tokens
    assert(doc0(0).getString(2).split(" ").last ===
      doc0(1).getString(2).split(" ").head)
  }

  test("length stats: count, mean, interpolated quantiles") {
    val df = (1 to 100).map(i => (i.toLong, ("w " * i).trim))
      .toDF("id", "text")
    val r = TextAnalysis.lengthStats(df, col("text")).collect()(0)
    assert(r.getAs[Long]("n_docs") === 100)
    assert(r.getAs[Double]("mean_tokens") === 50.5)
    assert(r.getAs[Double]("p50_tokens") === 50.5) // (N-1)*0.5 = 49.5
    assert(r.getAs[Double]("p90_tokens") === 90.1)
  }

  test("vocabulary: df/tf counts and smoothed idf") {
    val df = Seq(
      (0L, "alpha beta alpha"),
      (1L, "beta gamma"),
      (2L, "beta")).toDF("id", "text")
    val v = TextAnalysis.vocabulary(df, col("id"), col("text"))
      .collect().map(r => r.getAs[String]("token") ->
        ((r.getAs[Long]("df"), r.getAs[Long]("tf"), r.getAs[Double]("idf"))))
      .toMap
    assert(v("alpha")._1 === 1 && v("alpha")._2 === 2)
    assert(v("beta")._1 === 3 && v("beta")._2 === 3)
    assert(v("gamma")._1 === 1)
    // smoothed idf: ln((N+1)/(df+1)) + 1, N = 3
    assert(math.abs(v("beta")._3 - 1.0) < 1e-9) // ln(4/4)+1
    assert(math.abs(v("alpha")._3 - (math.log(2.0) + 1.0)) < 1e-6)
    // minDf prunes rare terms
    val pruned = TextAnalysis.vocabulary(df, col("id"), col("text"),
      minDf = 2L).collect()
    assert(pruned.map(_.getAs[String]("token")).toSeq === Seq("beta"))
  }

  test("unigram surprisal: rare-token docs score higher bits/token; " +
      "OOV tokens are smoothed, not dropped") {
    val corpus = Seq(
      (0L, "the the the the the the the the"),
      (1L, "the the the the the the the rareword")).toDF("id", "text")
    val vocab = TextAnalysis.vocabulary(corpus, col("id"), col("text"))
    val scores = TextAnalysis.unigramSurprisal(corpus, col("id"),
      col("text"), vocab)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Double]("bits_per_token")).toMap
    assert(scores(1L) > scores(0L)) // the rare token costs bits
    // hand-check doc 0: p(the) = (15+1)/(16+2), 8 tokens
    val expected = -math.log(16.0 / 18.0) / math.log(2.0)
    assert(math.abs(scores(0L) - expected) < 1e-6)
    // an OOV-only doc still gets a finite score via Laplace smoothing
    val oov = TextAnalysis.unigramSurprisal(
      Seq((9L, "neverseen tokens here")).toDF("id", "text"),
      col("id"), col("text"), vocab).collect()(0)
    assert(oov.getAs[Long]("n_tokens") === 3L)
    // p(OOV) = 1/18 → -log2 = log2(18)
    assert(math.abs(oov.getAs[Double]("bits_per_token") -
      math.log(18.0) / math.log(2.0)) < 1e-6)
  }

  test("bigram LM surprisal: hand-computed interpolated scores; " +
      "sub-two-token docs drop out; partitioning-independent") {
    val corpus = Seq(
      (1L, "a b a b"), (2L, "a b"), (3L, "c")).toDF("id", "text")
    // c1: a=3 b=3 c=1, T=7 V=3; c2: (a,b)=3 (b,a)=1
    val pAB = 0.7 * 3 / 3.0 + 0.3 * (3 + 1.0) / 10.0 // = .82
    val pBA = 0.7 * 1 / 3.0 + 0.3 * (3 + 1.0) / 10.0
    def bits(p: Double) = -math.log(p) / math.log(2.0)
    val out = TextAnalysis.bigramSurprisal(corpus, col("id"), col("text"))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Double]("bits_per_bigram"), r.getAs[Long]("n_bigrams"))))
      .toMap
    assert(out.keySet === Set(1L, 2L)) // "c" has no bigram
    assert(out(1L)._2 === 3L)
    assert(math.abs(out(1L)._1 -
      (bits(pAB) * 2 + bits(pBA)) / 3.0) < 1e-5)
    assert(math.abs(out(2L)._1 - bits(pAB)) < 1e-5)
    // repetitive text is cheap, novel transitions cost bits
    assert(out(2L)._1 < out(1L)._1 || out(1L)._1 > 0)
    val p7 = TextAnalysis.bigramSurprisal(corpus.repartition(7),
      col("id"), col("text")).collect()
      .map(r => r.getAs[Long]("id") ->
        r.getAs[Double]("bits_per_bigram")).toMap
    assert(p7 === out.map { case (k, v) => k -> v._1 })
  }

  // ---- sampling --------------------------------------------------------

  private lazy val keyed = (0L until 2000L).map(i =>
    (i, if (i % 4 == 0) "rare" else "common")).toDF("id", "grp")

  test("sampleByKey: deterministic, monotone in rate, roughly calibrated") {
    val half = Sampling.sampleByKey(keyed, col("id"), 0.5)
      .collect().map(_.getLong(0)).toSet
    val again = Sampling.sampleByKey(keyed, col("id"), 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(half === again)
    assert(half.size > 800 && half.size < 1200, s"got ${half.size}")
    // raising the rate only ADDS rows (incremental extension property)
    val more = Sampling.sampleByKey(keyed, col("id"), 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(half.subsetOf(more))
    assert(Sampling.sampleByKey(keyed, col("id"), 0.0).count() === 0)
    assert(Sampling.sampleByKey(keyed, col("id"), 1.0).count() === 2000)
  }

  test("stratifiedSample: per-stratum rates and default") {
    val out = Sampling.stratifiedSample(keyed, col("grp"), col("id"),
      Map("rare" -> 1.0), defaultRate = 0.1)
    val byGrp = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp("rare") === 500) // rate 1.0 keeps all
    assert(byGrp("common") > 75 && byGrp("common") < 225,
      s"got ${byGrp("common")}")
  }

  test("quotaSample: exact n per stratum, deterministic, partitioning-proof") {
    val out = Sampling.quotaSample(keyed, col("grp"), col("id"), n = 25)
    val byGrp = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp === Map("rare" -> 25L, "common" -> 25L))
    // matches the single-pass brute-force definition
    val brute = keyed.withColumn("u", Sampling.hashUnit(col("id")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("grp")
          .orderBy(col("u"), col("id"))))
      .where(col("rn") <= 25).select("id").collect().map(_.getLong(0)).toSet
    val ids = out.select("id").collect().map(_.getLong(0)).toSet
    assert(ids === brute)
    // independent of input partitioning
    val repart = Sampling.quotaSample(keyed.repartition(7), col("grp"),
      col("id"), n = 25).select("id").collect().map(_.getLong(0)).toSet
    assert(repart === ids)
  }

  test("quotaSample: small strata are kept whole") {
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "grp")
    assert(Sampling.quotaSample(tiny, col("grp"), col("id"), 10).count() === 3)
  }

  test("temperatureSample: alpha<1 boosts low-resource strata; alpha=0 " +
      "flattens; deterministic under repartitioning") {
    // 900 'big' vs 100 'small'
    val df = (0L until 1000L).map(i =>
      (i, if (i < 900) "big" else "small")).toDF("id", "grp")
    def counts(out: org.apache.spark.sql.DataFrame) =
      out.groupBy("grp").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap

    val flat = counts(Sampling.temperatureSample(df, col("grp"), col("id"),
      alpha = 0.0, targetN = 200L))
    // alpha=0: equal PER-STRATUM expected mass (~100 each)
    assert(math.abs(flat("big") - flat("small")) < 40,
      flat.toString)

    val natural = counts(Sampling.temperatureSample(df, col("grp"),
      col("id"), alpha = 1.0, targetN = 200L))
    // alpha=1: natural proportions (~180 vs ~20)
    assert(natural("big") > 6 * natural("small"), natural.toString)

    val a = Sampling.temperatureSample(df, col("grp"), col("id"), 0.5, 200L)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureSample(df.repartition(7), col("grp"),
      col("id"), 0.5, 200L).select("id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("weightedSample: deterministic, partitioning-proof, equals the " +
      "single-pass A-ES definition") {
    val w = (0L until 400L).map(i => (i, if (i % 4 == 0) 50.0 else 1.0))
      .toDF("id", "wt")
    val out = Sampling.weightedSample(w, col("id"), col("wt"), n = 60)
    assert(out.count() === 60)
    val ids = out.select("id").collect().map(_.getLong(0)).toSet
    // brute force: single global sort by the same rounded score
    val u = (conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val brute = w.withColumn("s", round(-log(u) / col("wt"), 9))
      .orderBy(col("s"), col("id")).limit(60)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids === brute)
    val repart = Sampling.weightedSample(w.repartition(7), col("id"),
      col("wt"), n = 60).select("id").collect().map(_.getLong(0)).toSet
    assert(repart === ids)
  }

  test("weightedSample: selection probability tracks weight; " +
      "non-positive weights are excluded") {
    // 100 heavy (w=100) vs 300 light (w=1): heavy rows should dominate
    // a 60-row sample (E[heavy] ≈ 58 under A-ES; assert a loose bound)
    val w = (0L until 400L).map(i =>
      (i, if (i < 100) 100.0 else 1.0)).toDF("id", "wt")
    val picked = Sampling.weightedSample(w, col("id"), col("wt"), n = 60)
      .select("id").collect().map(_.getLong(0))
    assert(picked.count(_ < 100) > 40,
      s"heavy rows underselected: ${picked.count(_ < 100)}/60")
    // zero/negative/null weights never selected
    val bad = Seq((1L, 0.0), (2L, -3.0), (3L, 5.0)).toDF("id", "wt")
    val only = Sampling.weightedSample(bad, col("id"), col("wt"), 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(only === Set(3L))
  }

  test("matchedSample: output composition follows the target exactly, " +
      "size is maximal, absent bins drop, deterministic") {
    import spark.implicits._
    // avail a=40, b=10, c=30; target a:2 b:1 (W=3); c excluded.
    // N* = min(40*3//2, 10*3//1) = min(60, 30) = 30 -> quotas a=20 b=10
    val df = ((0 until 40).map(i => (i.toLong, "a")) ++
      (100 until 110).map(i => (i.toLong, "b")) ++
      (200 until 230).map(i => (i.toLong, "c"))).toDF("id", "grp")
    val out = Sampling.matchedSample(df, col("grp"), col("id"),
      Seq("a" -> 2L, "b" -> 1L))
    val comp = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(comp === Map("a" -> 20L, "b" -> 10L))
    // maximality: one more unit of N would need 31 total at ratio 2:1,
    // i.e. ceil(31*1/3)=11 b-rows > 10 available
    // determinism + partitioning independence
    val out2 = Sampling.matchedSample(df.repartition(13), col("grp"),
      col("id"), Seq("a" -> 2L, "b" -> 1L))
    assert(out.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      out2.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("matchedSample: a weighted bin with no rows forces an empty " +
      "result; non-positive weights rejected") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "a")).toDF("id", "grp")
    assert(Sampling.matchedSample(df, col("grp"), col("id"),
      Seq("a" -> 1L, "ghost" -> 1L)).count() === 0L)
    intercept[IllegalArgumentException] {
      Sampling.matchedSample(df, col("grp"), col("id"), Seq("a" -> 0L))
    }
  }
}
