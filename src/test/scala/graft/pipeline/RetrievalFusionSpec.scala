package graft.pipeline

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 additions: incremental BM25 index fold law, NDCG, RRF
  * fusion, containment dedup, DSIR weights, BFS distances. */
class RetrievalFusionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsOf(ts: (Long, String)*) = ts.toSeq.toDF("id", "text")

  private val corpus = docsOf(
    0L -> "spark window hash join filter scan",
    1L -> "vector hash table spark spark spark",
    2L -> "window window window sort merge",
    3L -> "filter scan table sort",
    4L -> "spark vector window hash agg",
    5L -> "merge agg sort filter scan table")

  // ---- incremental BM25 index ------------------------------------------

  test("foldBm25Acc: any batch split serves scores identical to one-shot") {
    val terms = Seq("spark", "window", "hash")
    val oneShot = Retrieval.bm25ScoresIndexed(
      Retrieval.buildBm25Acc(corpus, col("id"), col("text")).index, terms)
    for (m <- Seq(2, 3)) {
      val folded = (0 until m).map(i =>
          Retrieval.buildBm25Acc(corpus.where(col("id") % m === i),
            col("id"), col("text")))
        .reduce(Retrieval.foldBm25Acc)
      val fs = Retrieval.bm25ScoresIndexed(folded.index, terms)
      assert(TestSpark.rows(fs) === TestSpark.rows(oneShot))
    }
  }

  test("foldBm25Acc is fold-order independent") {
    val terms = Seq("spark", "sort")
    val parts = (0 until 3).map(i =>
      Retrieval.buildBm25Acc(corpus.where(col("id") % 3 === i),
        col("id"), col("text")))
    val a = Retrieval.bm25ScoresIndexed(
      parts.reduce(Retrieval.foldBm25Acc).index, terms)
    val b = Retrieval.bm25ScoresIndexed(
      parts.reverse.reduce(Retrieval.foldBm25Acc).index, terms)
    assert(TestSpark.rows(a) === TestSpark.rows(b))
  }

  test("acc-served scores equal the ad-hoc bm25Scores path") {
    val terms = Seq("spark", "window", "hash", "table")
    val acc = Retrieval.bm25ScoresIndexed(
      Retrieval.buildBm25Acc(corpus, col("id"), col("text")).index, terms)
    val adHoc = Retrieval.bm25Scores(corpus, col("id"), col("text"), terms)
    assert(TestSpark.rows(acc) === TestSpark.rows(adHoc))
  }

  // ---- NDCG --------------------------------------------------------------

  test("ndcgAtK: a ranking that leads with the top grades scores 1.0") {
    // scores rank docs 10, 11, 12 for query 1 in that order
    val scores = Seq((1L, 10L, 3.0), (1L, 11L, 2.0), (1L, 12L, 1.0))
      .toDF("query_id", "id", "bm25")
    // ideal order is exactly 10 (grade 2), 11 (grade 1), 12 (grade 0)
    val rel = Seq((1L, 10L, 2L), (1L, 11L, 1L), (1L, 12L, 0L))
      .toDF("query_id", "rel_id", "grade")
    val out = Retrieval.ndcgAtK(scores, rel, k = 10).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("ndcg") === 1.0)
  }

  test("ndcgAtK: inverted ranking scores below 1; no hits scores 0") {
    val scores = Seq((1L, 12L, 3.0), (1L, 11L, 2.0), (1L, 10L, 1.0),
      (2L, 50L, 9.0))
      .toDF("query_id", "id", "bm25")
    val rel = Seq((1L, 10L, 2L), (1L, 11L, 1L),
      (2L, 60L, 3L)) // query 2's relevant doc never retrieved
      .toDF("query_id", "rel_id", "grade")
    val out = Retrieval.ndcgAtK(scores, rel, k = 10)
      .collect().map(r => r.getAs[Long]("query_id") ->
        r.getAs[Double]("ndcg")).toMap
    assert(out(1L) > 0.0 && out(1L) < 1.0)
    assert(out(2L) === 0.0)
  }

  test("ndcgAtK matches a hand computation at k with truncation") {
    // query 1: ranked ids 1,2,3 with grades 0,2,1 → DCG =
    // (2^0-1)/log2(2) + (2^2-1)/log2(3) + (2^1-1)/log2(4)
    val scores = Seq((1L, 1L, 3.0), (1L, 2L, 2.0), (1L, 3L, 1.0))
      .toDF("query_id", "id", "bm25")
    val rel = Seq((1L, 1L, 0L), (1L, 2L, 2L), (1L, 3L, 1L))
      .toDF("query_id", "rel_id", "grade")
    val r = Retrieval.ndcgAtK(scores, rel, k = 3).collect().head
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val dcg = 0.0 + 3.0 / log2(3.0) + 1.0 / log2(4.0)
    val idcg = 3.0 / log2(2.0) + 1.0 / log2(3.0) + 0.0 / log2(4.0)
    assert(math.abs(r.getAs[Double]("dcg") - dcg) < 1e-5)
    assert(math.abs(r.getAs[Double]("idcg") - idcg) < 1e-5)
    assert(math.abs(r.getAs[Double]("ndcg") - dcg / idcg) < 1e-5)
  }

  // ---- RRF fusion ---------------------------------------------------------

  test("rrfFuse: a doc present in both lists beats same-rank singletons") {
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L))
      .toDF("query_id", "id", "rank")
    val dense = Seq((1L, 10L, 2L), (1L, 12L, 1L))
      .toDF("query_id", "id", "rank")
    val out = Retrieval.rrfFuse(Seq(lex, dense), topK = 5)
      .orderBy("rank").collect()
    assert(out.head.getAs[Long]("id") === 10L) // 1/61 + 1/62
    assert(out.head.getAs[Long]("n_lists") === 2L)
    val expected = BigDecimal(1.0 / 61 + 1.0 / 62)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head.getAs[Double]("rrf") === expected)
    // the two singletons: rank-1 dense (1/61) beats rank-2 lex (1/62)
    assert(out(1).getAs[Long]("id") === 12L)
    assert(out(2).getAs[Long]("id") === 11L)
  }

  test("rrfFuse breaks exact score ties by id ascending") {
    val a = Seq((1L, 7L, 1L), (1L, 5L, 2L)).toDF("query_id", "id", "rank")
    val b = Seq((1L, 5L, 1L), (1L, 7L, 2L)).toDF("query_id", "id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), topK = 2).orderBy("rank")
      .collect()
    assert(out.map(_.getAs[Long]("id")).toSeq === Seq(5L, 7L))
  }

  // ---- containment ---------------------------------------------------------

  test("containmentPairs finds the excerpt⊆parent direction only") {
    val docs = docsOf(
      1L -> "a b c d e f g h i j k l m n o p q r s t",
      2L -> "a b c d e f g h",                // prefix excerpt of 1
      3L -> "zz yy xx ww vv uu tt ss rr qq")  // unrelated
    val out = Dedup.containmentPairs(docs, col("id"), col("text"),
      minPpm = 900000L)
    val pairs = out.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("containment_ppm"))).toSet
    assert(pairs === Set((2L, 1L, 1000000L)))
    out.unpersist()
  }

  test("containmentPairs equals the brute-force relation on a random corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (0L until 30L).map { i =>
      i -> Seq.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    val df = docsOf(docs: _*)
    val minPpm = 500000L
    val fast = Dedup.containmentPairs(df, col("id"), col("text"), minPpm)
    // brute force: exact shingle sets in local scala
    def sh(t: String): Set[String] =
      t.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val sets = docs.map { case (i, t) => i -> sh(t) }.toMap
    val want = (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq
      if a != b
      inter = (sa & sb).size.toLong
      ppm = inter * 1000000L / sa.size
      if ppm >= minPpm
    } yield (a, b, inter, sa.size.toLong, ppm)).toSet
    val got = fast.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got === want)
    fast.unpersist()
  }

  test("containmentDeduplicate: replicas collapse to min id, excerpts " +
      "drop into their parent, shingle-less docs always keep") {
    val docs = docsOf(
      1L -> "a b c d e f g h i j k l m n o p q r s t",
      2L -> "a b c d e f g h i j k l m n o p q r s t", // exact replica
      7L -> "a b c d e f g h i j k l m n o p q r s t", // exact replica
      3L -> "a b c d e f g h",                         // excerpt of 1
      4L -> "zz yy xx ww vv uu tt ss rr qq",           // unrelated
      5L -> "one two")                                  // no shingles
    val kept = Dedup.containmentDeduplicate(docs, col("id"),
      col("text"), minPpm = 900000L)
    assert(kept.collect().map(_.getAs[Long]("id")).toSet ===
      Set(1L, 4L, 5L))
    kept.unpersist()
  }

  test("containmentDeduplicate equals the brute-force drop rule on a " +
      "random corpus (kept rows pass through unchanged)") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (0L until 40L).map { i =>
      i -> Seq.fill(4 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    val df = docsOf(docs: _*)
    val minPpm = 600000L
    def sh(t: String): Set[String] =
      t.split("\\s+").sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    val sets = docs.map { case (i, t) => i -> sh(t) }.toMap
    val dropped = (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq
      if a != b && sa.nonEmpty && sb.nonEmpty
      if (sa & sb).size.toLong * 1000000L / sa.size >= minPpm
      if sb.size > sa.size || (sb.size == sa.size && b < a)
    } yield a).toSet
    val want = docs.map(_._1).toSet -- dropped
    val kept = Dedup.containmentDeduplicate(df, col("id"), col("text"),
      minPpm)
    val got = kept.collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[String]("text")).toMap
    assert(got.keySet === want)
    // output contract: kept rows are the input rows, untouched
    val origin = docs.toMap
    assert(got.forall { case (i, t) => origin(i) == t })
    kept.unpersist()
  }

  // ---- DSIR ------------------------------------------------------------------

  test("dsirWeights: docs made of target-heavy tokens score higher") {
    // target docs (1,2) use 'aaa'; raw background uses 'bbb'
    val docs = docsOf(
      1L -> "aaa aaa aaa", 2L -> "aaa aaa bbb",
      3L -> "bbb bbb bbb", 4L -> "aaa bbb bbb", 5L -> "bbb bbb bbb")
    val w = Sampling.dsirWeights(docs, col("id"), col("text"),
      col("id") <= 2L, buckets = 64)
    val byId = w.collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[Double]("dsir_w")).toMap
    // pure-'aaa' doc must outrank mixed, which outranks pure-'bbb'
    assert(byId(1L) > byId(4L) && byId(4L) > byId(3L))
    // same content ⇒ same weight regardless of target membership
    assert(byId(3L) === byId(5L))
    val n = w.collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[Long]("n_toks")).toMap
    assert(n(1L) === 3L && n(4L) === 3L)
  }

  test("dsirSelect: deterministic top-n with id tiebreak") {
    val w = Seq((3L, 5L, 1.5), (1L, 5L, 2.5), (2L, 5L, 2.5))
      .toDF("id", "n_toks", "dsir_w")
    val out = Sampling.dsirSelect(w, n = 2).orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq === Seq(1L, 2L))
  }

  // ---- BFS -----------------------------------------------------------------

  test("bfsDistances: hand graph, undirected, unreachable absent") {
    // 0-1-2-3 path, 4-5 separate component
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (4L, 5L))
      .toDF("s", "d")
    val seeds = Seq(Tuple1(0L)).toDF("node")
    val out = Graphs.bfsDistances(edges, col("s"), col("d"), seeds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("bfsDistances: multi-source takes the minimum distance") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
      .toDF("s", "d")
    val seeds = Seq(Tuple1(0L), Tuple1(4L)).toDF("node")
    val out = Graphs.bfsDistances(edges, col("s"), col("d"), seeds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 0L))
  }

  test("bfsDistances fails loud when maxDepth truncates a live frontier") {
    val edges = (0L until 6L).map(i => (i, i + 1)).toDF("s", "d")
    val seeds = Seq(Tuple1(0L)).toDF("node")
    val e = intercept[IllegalArgumentException] {
      Graphs.bfsDistances(edges, col("s"), col("d"), seeds, maxDepth = 3)
    }
    assert(e.getMessage.contains("frontier still live"))
  }

  // ---- weighted SSSP ---------------------------------------------------

  test("sssp: the cheap detour wins over the direct hop") {
    // 0→1 costs 10; 0→2→1 costs 2+3=5
    val edges = Seq((0L, 1L, 10L), (0L, 2L, 2L), (2L, 1L, 3L))
      .toDF("s", "d", "w")
    val seeds = Seq(Tuple1(0L)).toDF("node")
    val out = Graphs.sssp(edges, col("s"), col("d"), col("w"), seeds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 0L, 1L -> 5L, 2L -> 2L))
  }

  test("sssp: directed edges, multi-source min, zero weights allowed") {
    val edges = Seq((0L, 1L, 0L), (1L, 2L, 4L), (9L, 2L, 1L))
      .toDF("s", "d", "w")
    val seeds = Seq(Tuple1(0L), Tuple1(9L)).toDF("node")
    val out = Graphs.sssp(edges, col("s"), col("d"), col("w"), seeds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 2 is reachable at 4 from 0 but at 1 from 9; edge 1→0 absent so
    // the graph stays directed
    assert(out === Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 9L -> 0L))
  }

  test("sssp rejects negative weights and truncation fails loud") {
    val seeds = Seq(Tuple1(0L)).toDF("node")
    val neg = Seq((0L, 1L, -1L)).toDF("s", "d", "w")
    assert(intercept[IllegalArgumentException] {
      Graphs.sssp(neg, col("s"), col("d"), col("w"), seeds)
    }.getMessage.contains("non-negative"))
    val chain = (0L until 6L).map(i => (i, i + 1, 1L)).toDF("s", "d", "w")
    assert(intercept[IllegalArgumentException] {
      Graphs.sssp(chain, col("s"), col("d"), col("w"), seeds,
        maxRounds = 3)
    }.getMessage.contains("still improving"))
  }

  // ---- element containment ---------------------------------------------

  test("elementContainmentPairs: exact asymmetric ppm over element sets") {
    val elems = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), // superset
      (2L, 10L), (2L, 11L),                       // fully contained in 1
      (3L, 10L), (3L, 99L))                       // half-contained
      .toDF("id", "elem")
    val out = Dedup.elementContainmentPairs(elems, minPpm = 500000L)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(4))).toSet
    assert(got === Set((2L, 1L, 1000000L), (3L, 1L, 500000L),
      (3L, 2L, 500000L), (2L, 3L, 500000L), (1L, 2L, 500000L),
      (1L, 3L, 250000L)).filter(_._3 >= 500000L))
    out.unpersist()
  }

  // ---- Gumbel top-k ------------------------------------------------------

  // ---- multi-query indexed scoring / hard negatives ----------------------

  test("bm25ScoresIndexedForQueries equals the ad-hoc multi-query path") {
    val queries = Seq((1L, "spark"), (1L, "hash"), (2L, "sort"),
      (2L, "merge")).toDF("query_id", "token")
    val adHoc = Retrieval.bm25ScoresForQueries(corpus, col("id"),
      col("text"), queries)
    val idx = Retrieval.buildBm25Acc(corpus, col("id"), col("text")).index
    val served = Retrieval.bm25ScoresIndexedForQueries(idx, queries)
    assert(TestSpark.rows(served) === TestSpark.rows(adHoc))
  }

  test("hardNegatives excludes every relevant doc and ranks the rest") {
    val scores = Seq((1L, 10L, 5.0), (1L, 11L, 4.0), (1L, 12L, 3.0),
      (1L, 13L, 2.0)).toDF("query_id", "id", "bm25")
    val rel = Seq((1L, 11L)).toDF("query_id", "rel_id")
    val out = Retrieval.hardNegatives(scores, rel, perQuery = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq === Seq(10L, 12L))
    assert(out.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L))
  }

  // ---- PMI collocations ---------------------------------------------------

  test("pmiCollocations: the planted collocation tops the list") {
    // "ad hoc" always co-occurs; its parts appear nowhere else
    // together; filler words pair randomly
    val docs = docsOf(
      1L -> "ad hoc x y ad hoc y x",
      2L -> "x y ad hoc x x y y",
      3L -> "y x x y ad hoc x y")
    val out = LanguageModel.pmiCollocations(docs, col("id"), col("text"),
      minCount = 3L, topK = 3)
    val top = out.orderBy("rank").collect().head
    assert((top.getAs[String]("w1"), top.getAs[String]("w2")) ===
      ("ad", "hoc"))
    // PMI hand check: c12=4, c(ad)=4, c(hoc)=4, T=24 tokens, B=21
    // bigrams
    val want = math.log(4.0 * 24 * 24 / (21.0 * 4 * 4))
    assert(math.abs(top.getAs[Double]("pmi") - want) < 1e-6)
    out.unpersist()
  }

  // ---- Zipf fit -----------------------------------------------------------

  test("zipfFit recovers the slope of an exact power law") {
    // plant counts c(rank) = 2^20 / rank exactly: token t_r repeated
    // (2^20 div r) times would be huge — use c(r) = 4096 div r over
    // 8 ranks and repeat tokens that many times in synthetic docs
    val rows = (1 to 8).flatMap { r =>
      val c = 4096 / r
      Seq.fill(c)(s"w$r")
    }
    // one doc per 64 tokens to keep rows reasonable
    val docs = rows.grouped(64).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("id", "text")
    val out = TextAnalysis.zipfFit(docs, col("text"), topV = 8)
      .collect().head
    assert(out.getAs[Long]("n_tokens") === 8L)
    // 4096/r is integer division, so the fit is near −1 but not exact;
    // the exact least-squares on the actual counts:
    val pts = (1 to 8).map(r => (math.log(r.toDouble),
      math.log((4096 / r).toDouble)))
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(out.getAs[Double]("slope") - slope) < 1e-4)
    assert(out.getAs[Double]("slope") < -0.9 &&
      out.getAs[Double]("slope") > -1.1)
  }

  // ---- IVF recall harness ------------------------------------------------

  test("ivfRecallEval: probing every cell is exactly brute force " +
      "(recall 1.0); fewer probes can only lose recall") {
    val rnd = new scala.util.Random(11)
    val emb = (0L until 120L).map { i =>
      val base = Array.fill(8)(rnd.nextGaussian())
      (i, base.map(x => (x + (i % 4).toDouble * 3.0).toFloat))
    }.toDF("id", "vec")
    val full = Clustering.ivfRecallEval(emb, emb.where(col("id") < 6),
      k = 5, nprobe = 4, kCells = 4).collect().head
    assert(full.getAs[Long]("recall_ppm") === 1000000L)
    assert(full.getAs[Long]("n_truth") === 30L)
    val partial = Clustering.ivfRecallEval(emb,
      emb.where(col("id") < 6), k = 5, nprobe = 1, kCells = 4)
      .collect().head
    assert(partial.getAs[Long]("recall_ppm") <= 1000000L)
    assert(partial.getAs[Long]("n_queries") === 6L)
  }

  // ---- ESS / Heaps ----------------------------------------------------

  test("effectiveSampleSize: flat weights give ESS = n; one dominant " +
      "weight collapses it toward 1") {
    val flat = (1L to 40L).map(i => (i, 2.5)).toDF("id", "w")
    val f = Sampling.effectiveSampleSize(flat, col("w")).collect().head
    assert(f.getAs[Long]("n_docs") === 40L)
    assert(f.getAs[Double]("ess") === 40.0)
    assert(f.getAs[Double]("ess_ratio") === 1.0)
    val skewed = ((1L to 39L).map(i => (i, 0.0)) :+ (40L, 50.0))
      .toDF("id", "w")
    val s = Sampling.effectiveSampleSize(skewed, col("w")).collect().head
    assert(s.getAs[Double]("ess") < 1.1)
  }

  test("heapsFit: all-distinct corpus fits slope 1; constant corpus " +
      "fits slope 0") {
    val distinctDocs = (0L until 20L).map(i =>
      (i, (0 until 16).map(j => s"t${i}_$j").mkString(" ")))
      .toDF("id", "text")
    val d = TextAnalysis.heapsFit(distinctDocs, col("id"), col("text"))
      .collect().head
    assert(d.getAs[Long]("total_tokens") === 320L)
    assert(d.getAs[Long]("total_vocab") === 320L)
    assert(math.abs(d.getAs[Double]("slope") - 1.0) < 1e-6)
    val constDocs = (0L until 20L).map(i =>
      (i, Seq.fill(16)("same").mkString(" "))).toDF("id", "text")
    val c = TextAnalysis.heapsFit(constDocs, col("id"), col("text"))
      .collect().head
    assert(c.getAs[Long]("total_vocab") === 1L)
    assert(c.getAs[Double]("slope") === 0.0)
  }

  test("gumbelTopK: deterministic, and heavier weights dominate") {
    // weights differ by far more than the Gumbel noise span of the
    // md5 uniforms, so the top-2 must be the two heavy rows
    val w = Seq((1L, 100.0), (2L, 100.0), (3L, -100.0), (4L, -100.0))
      .toDF("id", "lw")
    val out = Sampling.gumbelTopK(w, col("id"), col("lw"), n = 2)
    val ids = out.collect().map(_.getAs[Long]("id")).toSet
    assert(ids === Set(1L, 2L))
    // rerun is bit-identical (no RNG state)
    val again = Sampling.gumbelTopK(w, col("id"), col("lw"), n = 2)
    assert(TestSpark.rows(out) === TestSpark.rows(again))
  }
}
