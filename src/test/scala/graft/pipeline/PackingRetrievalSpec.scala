package graft.pipeline

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing, BM25 retrieval, and edit-distance dedup tests. */
class PackingRetrievalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsOf(ts: (Long, String)*) = ts.toSeq.toDF("id", "text")

  // ---- global prefix sum ----------------------------------------------

  test("withGlobalPrefix: exact exclusive cumsum + 0-based rank in order") {
    // enough rows to span several range partitions
    val df = (0L until 100L).map(i => (i, i % 7 + 1)).toDF("id", "v")
    val out = Packing.withGlobalPrefix(df, col("id"), col("v"))
      .orderBy("id").collect()
    var run = 0L
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("idx") === i.toLong)
      assert(r.getAs[Long]("offset") === run)
      run += r.getAs[Long]("v")
    }
  }

  test("withGlobalPrefix is independent of input partitioning") {
    val df = (0L until 50L).map(i => (i, 2L)).toDF("id", "v")
    val a = Packing.withGlobalPrefix(df.repartition(7), col("id"), col("v"))
    val b = Packing.withGlobalPrefix(df.coalesce(1), col("id"), col("v"))
    assert(TestSpark.rows(a) === TestSpark.rows(b))
  }

  // ---- concat-and-chunk packing ---------------------------------------

  test("packConcat: slices tile each doc and fill sequences to budget") {
    val docs = docsOf(
      1L -> "a b c d e",            // 5 tokens
      2L -> "f g h i j k l",        // 7 tokens
      3L -> "m n o",                // 3 → stream 15 tokens, budget 6
      4L -> "p q r s t u v w x y")  // 10 → total 25
    val out = Packing.packConcat(docs, col("id"), col("text"), budget = 6L)
      .collect()
    // every doc's slices tile [0, n) exactly
    val byDoc = out.groupBy(_.getAs[Long]("id"))
    val lens = Map(1L -> 5L, 2L -> 7L, 3L -> 3L, 4L -> 10L)
    byDoc.foreach { case (id, rs) =>
      val spans = rs.map(r =>
        (r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end")))
        .sortBy(_._1)
      assert(spans.head._1 === 0L)
      assert(spans.last._2 === lens(id))
      spans.sliding(2).foreach {
        case Array(a, b) => assert(a._2 === b._1); case _ => ()
      }
    }
    // every sequence except the last holds exactly `budget` tokens,
    // placed contiguously from seq_off 0
    val bySeq = out.groupBy(_.getAs[Long]("seq_id"))
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (sid, rs) =>
      val total = rs.map(r =>
        r.getAs[Long]("tok_end") - r.getAs[Long]("tok_start")).sum
      if (sid < lastSeq) assert(total === 6L)
      else assert(total === 25L % 6L + 0L || total <= 6L)
      val placed = rs.map(r => (r.getAs[Long]("seq_off"),
        r.getAs[Long]("seq_off") + r.getAs[Long]("tok_end")
          - r.getAs[Long]("tok_start"))).sortBy(_._1)
      assert(placed.head._1 === 0L)
      placed.sliding(2).foreach {
        case Array(a, b) => assert(a._2 === b._1); case _ => ()
      }
    }
    // doc 2 straddles the first cut: 6 tokens stream position 5..11
    val d2 = out.filter(_.getAs[Long]("id") == 2L)
      .map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("tok_start"),
        r.getAs[Long]("tok_end"), r.getAs[Long]("seq_off"))).sorted
    assert(d2 === Seq((0L, 0L, 1L, 5L), (1L, 1L, 7L, 0L)))
  }

  test("packConcat drops zero-token docs and rejects bad budgets") {
    val docs = docsOf(1L -> "a b", 2L -> "")
    val out = Packing.packConcat(docs, col("id"), col("text"), 4L)
    // "" tokenizes to one empty token under split semantics — verify
    // via the engine tokenizer, not an assumption
    val n2 = docs.where(col("id") === 2L)
      .select(TextAnalysis.tokenCount(col("text"))).head().getInt(0)
    if (n2 == 0)
      assert(out.where(col("id") === 2L).count() === 0L)
    intercept[IllegalArgumentException] {
      Packing.packConcat(docs, col("id"), col("text"), 0L)
    }
  }

  // ---- first-fit-decreasing packing -----------------------------------

  test("packFirstFit: no bin over budget, each doc placed once, " +
      "utilization >= 0.5") {
    val docs = (1L to 200L).map(i =>
      (i, Seq.fill((i % 37 + 1).toInt)("t").mkString(" "))).toDF("id", "text")
    val budget = 40L
    val out = Packing.packFirstFit(docs, col("id"), col("text"), budget)
    val placed = out.collect()
    assert(placed.map(_.getAs[Long]("id")).distinct.length === 200)
    val fills = placed.groupBy(_.getAs[Long]("bin_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_tokens")).sum)
    fills.foreach { case (_, f) => assert(f <= budget) }
    val stats = Packing.packingStats(out, budget).collect()(0)
    assert(stats.getAs[Double]("utilization") >= 0.5)
    assert(stats.getAs[Long]("packed_tokens") ===
      placed.map(_.getAs[Long]("n_tokens")).sum)
  }

  test("packFirstFit rejects over-budget docs to the overflow (absent) " +
      "and keeps the rest") {
    val docs = docsOf(1L -> "a b c", 2L -> Seq.fill(50)("x").mkString(" "))
    val out = Packing.packFirstFit(docs, col("id"), col("text"), 10L)
      .collect()
    assert(out.map(_.getAs[Long]("id")).toSet === Set(1L))
  }

  // ---- BM25 ------------------------------------------------------------

  test("bm25Scores matches a hand-computed score on a tiny corpus") {
    val docs = docsOf(
      1L -> "spark spark join",   // dl 3
      2L -> "join scan merge",    // dl 3
      3L -> "filter scan scan")   // dl 3, no query term
    val out = Retrieval.bm25Scores(docs, col("id"), col("text"),
        Seq("spark"), k1 = 1.2, b = 0.75)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("bm25"), r.getAs[Long]("n_terms_hit"))).toMap
    // N=3, df(spark)=1, idf = ln(1 + (3-1+0.5)/1.5) = ln(8/3)
    // tf=2, dl=avgdl=3 → tf*(k1+1)/(tf + k1*1) = 2*2.2/3.2
    val want = math.log(8.0 / 3.0) * 2.0 * 2.2 / 3.2
    assert(out.keySet === Set(1L))
    assert(math.abs(out(1L)._1 - want) < 1e-6)
    assert(out(1L)._2 === 1L)
  }

  test("bm25TopK: rarer terms dominate, k bounds the result, order is " +
      "score-desc then id") {
    val common = (1L to 30L).map(i => (i, "hash table " + i))
    val rare = Seq(31L -> "vector index probe", 32L -> "vector vector")
    val docs = (common ++ rare).toDF("id", "text")
    val top = Retrieval.bm25TopK(docs, col("id"), col("text"),
      Seq("hash", "vector"), k = 5).collect()
    assert(top.length === 5)
    // df(vector)=2 << df(hash)=30 → the two vector docs outrank all
    assert(top.take(2).map(_.getAs[Long]("id")).toSet === Set(31L, 32L))
    val scores = top.map(_.getAs[Double]("bm25"))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b
      case _ => true })
  }

  test("bm25ScoresForQueries: batch scores equal per-query bm25Scores; " +
      "mrrAtK ranks the planted relevant docs correctly") {
    val docs = docsOf(
      1L -> "zebra quokka apple banana",      // 'zebra' unique to doc 1
      2L -> "apple banana cherry apple",
      3L -> "apple banana cherry date",
      4L -> "unrelated words entirely here")
    val queries = Seq(
      (1L, "zebra"), (1L, "apple"),     // doc 1 must rank first
      (4L, "apple"), (4L, "banana"))    // doc 4 matches NOTHING
      .toDF("query_id", "token")
    val batch = Retrieval.bm25ScoresForQueries(docs, col("id"),
      col("text"), queries)
    // per-query equivalence with the single-query path
    for ((qid, terms) <- Seq(1L -> Seq("zebra", "apple"),
        4L -> Seq("apple", "banana"))) {
      val single = Retrieval.bm25Scores(docs, col("id"), col("text"),
        terms).collect().map(r => r.getLong(0) ->
          (r.getDouble(1), r.getLong(2))).toMap
      val part = batch.where(col("query_id") === qid).collect()
        .map(r => r.getAs[Long]("id") ->
          (r.getAs[Double]("bm25"), r.getAs[Long]("n_terms_hit"))).toMap
      assert(part === single, s"query $qid")
    }
    val rel = Seq((1L, 1L), (4L, 4L)).toDF("query_id", "rel_id")
    val mrr = Retrieval.mrrAtK(batch, rel, k = 3).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("rel_rank"), r.getAs[Long]("rr_ppm"))).toMap
    assert(mrr(1L) === ((1L, 1000000L)), "unique term must rank #1")
    assert(mrr(4L) === ((0L, 0L)), "no-match query must read 0")
  }

  test("standing BM25 index serves identical scores to the ad-hoc path") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val terms = Seq("spark", "hash", "vector")
    val adhoc = Retrieval.bm25Scores(docs, col("doc_id"), col("text"),
      terms)
    val idx = Retrieval.buildBm25Index(docs, col("doc_id"), col("text"))
    val served = Retrieval.bm25ScoresIndexed(idx, terms)
    assert(TestSpark.rows(served) === TestSpark.rows(adhoc))
    assert(served.count() > 0)
  }

  // ---- group-wise top-k ------------------------------------------------

  test("topKPerGroup equals a single global window and is partitioning-" +
      "independent (salted two-phase)") {
    import org.apache.spark.sql.expressions.Window
    val df = (0L until 300L)
      .map(i => (i, s"g${i % 3}", (i * 37 % 101).toInt))
      .toDF("id", "grp", "score")
    val got = Sampling.topKPerGroup(df.repartition(13), col("grp"),
      col("score"), col("id"), k = 7)
    val want = df.withColumn("rank", row_number().over(
        Window.partitionBy(col("grp"))
          .orderBy(col("score").desc, col("id"))))
      .where(col("rank") <= 7)
    assert(TestSpark.rows(got) === TestSpark.rows(want))
    // one giant group (all rows) still returns exactly k
    val one = Sampling.topKPerGroup(df.withColumn("grp", lit("g")),
      col("grp"), col("score"), col("id"), k = 4)
    assert(one.count() === 4)
  }

  // ---- edit-distance dedup --------------------------------------------

  test("editDistanceDuplicates equals brute force on a mutated corpus") {
    val base = (0L until 40L).map { i =>
      val toks = (0 until 20).map(j => s"w${(i * 7 + j * 3) % 13}")
      (i, toks.mkString(" "))
    }
    // planted mutations: small edits of doc 0 and doc 5
    val planted = Seq(
      100L -> base(0)._2.replace("w0", "w9"),
      101L -> (base(5)._2 + " xx"),
      102L -> base(5)._2.drop(3))
    val docs = (base ++ planted).toDF("id", "text")
    val d = 8
    val got = Dedup.editDistanceDuplicates(docs, col("id"), col("text"),
        maxDist = d)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("dist"))).toSet
    // brute force over all pairs (no blocking) as ground truth
    val all = (base ++ planted)
    val want = (for {
      (ia, ta) <- all; (ib, tb) <- all if ia < ib
      dist = levenshteinRef(ta, tb) if dist <= d
    } yield (ia, ib, dist)).toSet
    assert(got === want)
    assert(want.nonEmpty) // the planted pairs are actually in range
  }

  test("editDistanceDuplicates: null texts are excluded, not a crash; " +
      "astral-plane substitutions keep the no-false-negative bound") {
    // doc 2 is doc 1 with five astral-char (2 UTF-16 units each)
    // substitutions: code-point edit distance 5 <= 8 — a UTF-16-unit
    // histogram would overshoot the 2d L1 bound and drop the pair
    val a = "aa😀bb😀cc😀dd😀ee" +
      "😀ff gg hh ii jj kk ll mm nn oo pp"
    val b = a.replace("😀", "😁") // 5 substitutions
    val docs = Seq((1L, a), (2L, b), (3L, null.asInstanceOf[String]),
      (4L, "completely different content here entirely unrelated words"))
      .toDF("id", "text")
    val got = Dedup.editDistanceDuplicates(docs, col("id"), col("text"),
        maxDist = 8)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("dist"))).toSet
    assert(got === Set((1L, 2L, 5)))
  }

  test("editDistanceDuplicates hot-bucket cap bounds candidates " +
      "(skew valve)") {
    // all docs identical length → one hot length bucket
    val docs = (0L until 50L).map(i => (i, s"aaaa${i % 10}")).toDF("id",
      "text")
    val capped = Dedup.editDistanceDuplicates(docs, col("id"), col("text"),
      maxDist = 2, maxBucketDocs = 10L)
    // cap keeps only 10 docs per bucket → at most 10*9/2 verified pairs
    assert(capped.count() <= 45L)
    val uncapped = Dedup.editDistanceDuplicates(docs, col("id"),
      col("text"), maxDist = 2)
    assert(uncapped.count() > capped.count())
  }

  /** Reference Levenshtein (full DP) for the brute-force oracle. */
  private def levenshteinRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }
}
