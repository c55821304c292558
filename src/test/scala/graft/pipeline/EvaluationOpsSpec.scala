package graft.pipeline

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-11 curation additions: boilerplate removal,
  * CDC chunking, nucleus (top-p) selection, ROC/AUC evaluation. */
class EvaluationOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- boilerplate removal ----------------------------------------------

  test("boilerplate lines shared by >= minDocFreq docs of a group are " +
      "removed; kept lines stay in order") {
    // "cookie banner" = the 2-token line planted in docs 0/1/2 of site a
    val docs = Seq(
      (0L, "a", "cookie banner alpha beta"),
      (1L, "a", "cookie banner gamma delta"),
      (2L, "a", "epsilon zeta cookie banner"),
      (3L, "a", "eta theta iota kappa"),
      (4L, "b", "cookie banner lambda mu") // other group: df=1, kept
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.removeBoilerplate(docs, col("doc_id"),
        col("text"), col("source"), lineTokens = 2, minDocFreq = 3L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_text"))).toMap
    assert(out(0L) === ((2L, 1L, "alpha beta")))
    assert(out(1L) === ((2L, 1L, "gamma delta")))
    assert(out(2L) === ((2L, 1L, "epsilon zeta")))
    assert(out(3L) === ((2L, 0L, "eta theta iota kappa")))
    assert(out(4L) === ((2L, 0L, "cookie banner lambda mu")))
  }

  test("rate-thresholded boilerplate tracks group size: the same line " +
      "frequency is boilerplate in a small group, prose in a large one") {
    // 'x y' appears in 3 docs of both groups; group a has 4 docs
    // (3/4 >= 1/8 AND >= 2 -> removed), group b has 24 docs with the
    // rate threshold ceil(24/8)=3 ... also removed; raise to frac=1/4:
    // a: ceil(4/4)=1 -> floor 2 applies -> removed; b: ceil(24/4)=6 > 3
    // -> kept
    val mk = (g: String, n: Int, off: Long) => (0 until n).map(i =>
      (off + i, g, if (i < 3) s"x y filler$g$i pad" else s"u$g$i v$g$i"))
    val docs = (mk("a", 4, 0L) ++ mk("b", 24, 100L))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.removeBoilerplateByRate(docs, col("doc_id"),
        col("text"), col("source"), lineTokens = 2, minDocFrac = 0.25,
        minDocFreq = 2L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_removed")).toMap
    assert(out(0L) === 1L, "small group: 3/4 >= 1/4 removed")
    assert(out(100L) === 0L, "large group: 3/24 < 1/4 kept")
  }

  test("boilerplate: a fully-boilerplate document becomes empty text") {
    val docs = Seq(
      (0L, "a", "x y"), (1L, "a", "x y"), (2L, "a", "x y a b")
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.removeBoilerplate(docs, col("doc_id"),
        col("text"), col("source"), lineTokens = 2, minDocFreq = 3L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("clean_text")).toMap
    assert(out(0L) === "")
    assert(out(2L) === "a b")
  }

  test("boilerplate: folded counts over disjoint batches equal one-shot; " +
      "applying the folded dictionary equals one-shot removal") {
    val docs = Seq(
      (0L, "a", "cookie banner alpha beta"),
      (1L, "a", "cookie banner gamma delta"),
      (2L, "a", "epsilon zeta cookie banner"),
      (3L, "a", "eta theta iota kappa"),
      (4L, "b", "cookie banner lambda mu")
    ).toDF("doc_id", "source", "text")
    // the boilerplate line reaches df=3 only ACROSS the two batches
    val a = docs.where(col("doc_id") < 2)
    val b = docs.where(col("doc_id") >= 2)
    val folded = TextAnalysis.foldBoilerplateCounts(
      TextAnalysis.boilerplateCounts(a, col("doc_id"), col("text"),
        col("source")),
      TextAnalysis.boilerplateCounts(b, col("doc_id"), col("text"),
        col("source")))
    val oneShot = TextAnalysis.boilerplateCounts(docs, col("doc_id"),
      col("text"), col("source"))
    assert(folded.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(folded).isEmpty)
    val inc = TextAnalysis.removeBoilerplateWithCounts(docs,
      col("doc_id"), col("text"), col("source"), folded,
      lineTokens = 2, minDocFreq = 3L)
    val ref = TextAnalysis.removeBoilerplate(docs, col("doc_id"),
      col("text"), col("source"), lineTokens = 2, minDocFreq = 3L)
    assert(inc.exceptAll(ref).isEmpty && ref.exceptAll(inc).isEmpty)
  }

  test("hashingTf: per-doc tf mass equals the token count and buckets " +
      "are stable per token") {
    val docs = Seq((0L, "a b a c"), (1L, "a a")).toDF("doc_id", "text")
    val tf = TextAnalysis.hashingTf(docs, col("doc_id"), col("text"),
      dim = 8).collect()
    assert(tf.forall(r => r.getAs[Long]("dim") >= 0 &&
      r.getAs[Long]("dim") < 8))
    val mass = tf.groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) => id -> rs.map(_.getAs[Long]("tf")).sum }
    assert(mass === Map(0L -> 4L, 1L -> 2L))
    // 'a' hashes to one bucket: doc 1 is a single row of tf=2
    assert(tf.count(_.getAs[Long]("doc_id") == 1L) === 1)
  }

  // ---- CDC chunking -------------------------------------------------------

  test("CDC chunks concatenate losslessly and respect the boundary rule") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "short", "", "exactly8", "a bit longer sample text here")
    val rows = TextAnalysis.cdcChunkTable(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), col("doc_id"), col("text"))
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getAs[Long]("chunk_id"))
          .map(_.getAs[String]("chunk_text"))
      }
    // lossless: chunks concatenate back to the document
    texts.zipWithIndex.foreach { case (t, i) =>
      val chunks = rows.getOrElse(i.toLong, Array.empty[String])
      assert(chunks.mkString === t, s"doc $i")
      if (t.isEmpty) assert(chunks.isEmpty)
    }
    // boundary rule: every interior chunk ends where the window hash
    // divides the modulus
    def h(cps: Array[Int], end: Int): Long =
      (0 until 8).map(j => cps(end - j) * math.pow(31, j).toLong).sum
    texts.zipWithIndex.foreach { case (t, i) =>
      val cps = t.codePoints().toArray
      val chunks = rows.getOrElse(i.toLong, Array.empty[String])
      var pos = 0
      chunks.dropRight(1).foreach { c =>
        pos += c.codePointCount(0, c.length)
        assert(pos >= 8 && h(cps, pos - 1) % 16 === 0,
          s"doc $i boundary at $pos")
      }
    }
  }

  test("CDC is shift-robust: an edit changes only the chunk it touches") {
    val t = "the quick brown fox jumps over the lazy dog while the cat " +
      "sleeps in the warm afternoon sun near the old wooden fence post"
    val edited = "XY " + t
    val df = Seq((0L, t), (1L, edited)).toDF("doc_id", "text")
    val byDoc = TextAnalysis.cdcChunkTable(df, col("doc_id"), col("text"))
      .collect().groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) => id -> rs.sortBy(_.getAs[Long]("chunk_id"))
        .map(_.getAs[String]("chunk_text")).toSeq }
    val orig = byDoc(0L)
    val moved = byDoc(1L)
    // after the first resynchronized boundary, the chunk streams agree;
    // fixed-offset chunking would shift EVERY chunk
    val shared = orig.toSet.intersect(moved.toSet)
    assert(shared.nonEmpty, "no chunk survived a 3-char prefix edit")
    assert(orig.takeRight(1).toSet.subsetOf(moved.toSet),
      "the final chunk (far from the edit) must be identical")
  }

  test("cdcDeduplicate keeps first occurrences: an exact-dup doc " +
      "empties, a unique doc round-trips verbatim") {
    val t = "the quick brown fox jumps over the lazy dog while the cat " +
      "sleeps in the warm afternoon sun near the old wooden fence"
    val u = "completely different content about distributed query " +
      "engines and columnar storage formats for analytics"
    val out = TextAnalysis.cdcDeduplicate(
      Seq((0L, t), (1L, t), (2L, u)).toDF("doc_id", "text"),
      col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Long]("n_dropped"))).toMap
    assert(out(0L) === ((t, 0L))) // first occurrence keeps everything
    assert(out(1L)._1 === "")     // exact dup loses every chunk
    assert(out(1L)._2 > 0L)
    assert(out(2L) === ((u, 0L))) // unique doc round-trips
  }

  test("incremental chunk-index dedup equals one-shot across batches: " +
      "a batch-2 duplicate of a batch-1 document empties") {
    val t = "the quick brown fox jumps over the lazy dog while the cat " +
      "sleeps in the warm afternoon sun near the old wooden fence"
    val u = "completely different content about distributed query " +
      "engines and columnar storage formats for analytics"
    val docs = Seq((0L, t), (1L, u), (2L, t), (3L, "fresh unseen text " +
      "with its own words entirely")).toDF("doc_id", "text")
    val a = docs.where(col("doc_id") < 2)
    val b = docs.where(col("doc_id") >= 2)
    val i1 = TextAnalysis.buildChunkIndex(a, col("doc_id"), col("text"))
    val out1 = TextAnalysis.cdcDeduplicateWithIndex(a, col("doc_id"),
      col("text"), i1)
    val i12 = TextAnalysis.foldChunkIndex(i1,
      TextAnalysis.buildChunkIndex(b, col("doc_id"), col("text")))
    val out2 = TextAnalysis.cdcDeduplicateWithIndex(b, col("doc_id"),
      col("text"), i12)
    val inc = out1.unionByName(out2)
    val ref = TextAnalysis.cdcDeduplicate(docs, col("doc_id"), col("text"))
    assert(inc.exceptAll(ref).isEmpty && ref.exceptAll(inc).isEmpty)
    val byId = inc.collect().map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("clean_text")).toMap
    assert(byId(2L) === "") // cross-batch duplicate: fully deduped
    assert(byId(3L).nonEmpty)
  }

  test("winnowing equals a brute-force rightmost-min-per-window " +
      "reference and carries the shared-substring guarantee") {
    val k = 8; val w = 16
    def bruteForce(t: String): Set[(Long, Long)] = {
      val cps = t.codePoints().toArray
      val n = cps.length
      if (n < k || n - k + 1 < w) return Set.empty
      val keys = (k to n).map { i =>
        val h = (0 until k).map(j => cps(i - 1 - j) *
          math.pow(31, j).toLong).sum % (1L << 40)
        (i, h)
      }
      keys.sliding(w).map { win =>
        win.minBy { case (i, h) => (h, -i) } // rightmost min
      }.map { case (i, h) => (i.toLong, h) }.toSet
    }
    val t1 = "the quick brown fox jumps over the lazy dog while the " +
      "cat sleeps in the warm afternoon sun near the old wooden fence"
    val t2 = "other opening words but then " + t1.drop(30)
    val rows = TextAnalysis.winnowTable(
      Seq((0L, t1), (1L, t2), (2L, "short")).toDF("doc_id", "text"),
      col("doc_id"), col("text")).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) => id -> rs.map(r =>
        (r.getAs[Long]("pos"), r.getAs[Long]("hash"))).toSet }
    assert(rows(0L) === bruteForce(t1))
    assert(rows(1L) === bruteForce(t2))
    assert(!rows.contains(2L), "sub-window doc yields no fingerprints")
    // winnowing theorem: a shared substring of length >= k+w-1 must
    // produce at least one shared HASH between the two documents
    val sharedHashes = rows(0L).map(_._2).intersect(rows(1L).map(_._2))
    assert(sharedHashes.nonEmpty)
  }

  // ---- top-p --------------------------------------------------------------

  test("topPPerGroup keeps the minimal weight-atomic prefix covering p") {
    // stratum a: weights 5,3,3,1 (total 12); p=0.5 -> 5 alone is 5/12
    // (< 0.5), adding the 3s reaches 11/12: threshold weight 3, BOTH
    // ties kept, the 1 dropped. stratum b: single row always kept.
    val df = Seq(("a", 1L, 5L), ("a", 2L, 3L), ("a", 3L, 3L),
      ("a", 4L, 1L), ("b", 9L, 2L)).toDF("s", "id", "w")
    val kept = Sampling.topPPerGroup(df, col("s"), col("id"), col("w"),
        p = 0.5).collect().map(r =>
        (r.getAs[String]("stratum"), r.getAs[Long]("id"))).toSet
    assert(kept === Set(("a", 1L), ("a", 2L), ("a", 3L), ("b", 9L)))
  }

  test("topPPerGroup with p=1 keeps every row") {
    val df = Seq(("a", 1L, 5L), ("a", 2L, 1L), ("b", 3L, 2L))
      .toDF("s", "id", "w")
    assert(Sampling.topPPerGroup(df, col("s"), col("id"), col("w"),
      p = 1.0).count() === 3L)
  }

  test("topPPerGroup keeps an all-zero-weight stratum whole instead of " +
      "silently dropping it") {
    val df = Seq(("z", 1L, 0L), ("z", 2L, 0L), ("a", 3L, 4L),
      ("a", 4L, 1L)).toDF("s", "id", "w")
    val kept = Sampling.topPPerGroup(df, col("s"), col("id"), col("w"),
        p = 0.5).collect().map(r =>
        (r.getAs[String]("stratum"), r.getAs[Long]("id"))).toSet
    assert(kept === Set(("z", 1L), ("z", 2L), ("a", 3L)))
  }

  test("topPPerGroup fails loud on a negative weight") {
    val df = Seq(("a", 1L, 5L), ("a", 2L, -1L)).toDF("s", "id", "w")
    val e = intercept[Exception] {
      Sampling.topPPerGroup(df, col("s"), col("id"), col("w"), p = 0.5)
        .collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("negative weight") ||
        Option(e.getCause).exists(
          _.getMessage.contains("negative weight"))))
  }

  // ---- quantile buckets ---------------------------------------------------

  test("bucketByScoreBins: head/middle/tail at 1/4 and 1/2, bin-atomic " +
      "at the boundary") {
    // group g: 8 rows, scores 1..8 → boundaries ceil(2)=2, ceil(4)=4:
    // bucket 0 = scores 1,2; bucket 1 = 3,4; bucket 2 = 5..8
    val df = (1 to 8).map(i => ("g", i.toLong, i.toDouble))
      .toDF("lang", "id", "score")
    val got = Sampling.bucketByScoreBins(df, col("lang"), col("id"),
        col("score"), Seq(0.25, 0.5)).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("bucket")).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L,
      5L -> 2L, 6L -> 2L, 7L -> 2L, 8L -> 2L))
  }

  test("bucketByScoreBins: rows tied in one score bin share a bucket " +
      "even when the boundary falls inside the bin") {
    // 4 rows all score 1.0 + 4 rows score 2.0; boundary ceil(0.25*8)=2
    // falls INSIDE the first bin → whole bin stays bucket 0
    val df = ((1 to 4).map(i => (i.toLong, 1.0)) ++
      (5 to 8).map(i => (i.toLong, 2.0))).map { case (i, s) =>
      ("g", i, s) }.toDF("lang", "id", "score")
    val got = Sampling.bucketByScoreBins(df, col("lang"), col("id"),
        col("score"), Seq(0.25)).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("bucket")).toMap
    assert((1 to 4).forall(i => got(i.toLong) == 0L))
    assert((5 to 8).forall(i => got(i.toLong) == 1L))
  }

  test("bucketByScoreBins buckets independently per group") {
    val df = (Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0),
      ("a", 4L, 40.0)) ++ Seq(("b", 5L, 1.0), ("b", 6L, 2.0)))
      .toDF("lang", "id", "score")
    val got = Sampling.bucketByScoreBins(df, col("lang"), col("id"),
        col("score"), Seq(0.5)).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("bucket")).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L,
      5L -> 0L, 6L -> 1L))
  }

  // ---- MAD outliers -------------------------------------------------------

  test("madOutliers: exact lower medians; only the planted extreme " +
      "value is flagged at k=3") {
    val df = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L),
      ("g", 4L, 4L), ("g", 5L, 100L)).toDF("lang", "id", "v")
    val got = Sampling.madOutliers(df, col("lang"), col("id"), col("v"))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("med"), r.getAs[Long]("mad"),
          r.getAs[Boolean]("outlier")))).toMap
    assert(got(1L) === ((3L, 1L, false)))
    assert(got(5L) === ((3L, 1L, true)), "dev 97 > 3*1")
    assert(got.count(_._2._3) === 1)
  }

  test("madOutliers: even group takes the lower median; zero MAD flags " +
      "every deviating row") {
    val even = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L),
      ("g", 4L, 4L)).toDF("lang", "id", "v")
    val g1 = Sampling.madOutliers(even, col("lang"), col("id"), col("v"))
      .collect()
    assert(g1.forall(_.getAs[Long]("med") == 2L), "lower median of 4")
    assert(g1.forall(!_.getAs[Boolean]("outlier")))
    val degen = Seq(("g", 1L, 5L), ("g", 2L, 5L), ("g", 3L, 5L),
      ("g", 4L, 9L)).toDF("lang", "id", "v")
    val g2 = Sampling.madOutliers(degen, col("lang"), col("id"),
        col("v")).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("outlier")).toMap
    assert(g2 === Map(1L -> false, 2L -> false, 3L -> false, 4L -> true))
  }

  // ---- water-filling budget allocation -----------------------------------

  private def wf(avail: Seq[(String, Long)], budget: Long)
      : Map[String, Long] =
    Sampling.waterfillBudget(
      avail.flatMap { case (d, a) => Seq.fill(1)((d, a)) }
        .toDF("domain", "tok"),
      col("domain"), col("tok"), budget).collect()
      .map(r => r.getAs[String]("domain") -> r.getAs[Long]("quota")).toMap

  test("waterfill: budget covers everything -> every domain fully " +
      "funded") {
    assert(wf(Seq("a" -> 3L, "b" -> 7L), budget = 10L) ===
      Map("a" -> 3L, "b" -> 7L))
    assert(wf(Seq("a" -> 3L, "b" -> 7L), budget = 100L) ===
      Map("a" -> 3L, "b" -> 7L))
  }

  test("waterfill: small domains keep everything, large ones clip at " +
      "the common cap") {
    // sorted (1,5,10), B=12: 1 and 5 funded, cap = (12-6)/1 = 6
    assert(wf(Seq("s" -> 1L, "m" -> 5L, "l" -> 10L), budget = 12L) ===
      Map("s" -> 1L, "m" -> 5L, "l" -> 6L))
    // (4,10,10), B=12: only 4 funded, cap = (12-4)/2 = 4
    assert(wf(Seq("a" -> 4L, "b" -> 10L, "c" -> 10L), budget = 12L) ===
      Map("a" -> 4L, "b" -> 4L, "c" -> 4L))
  }

  test("waterfill: no domain fully fundable -> uniform floor cap; " +
      "zero budget -> zero quotas") {
    assert(wf(Seq("a" -> 5L, "b" -> 6L), budget = 3L) ===
      Map("a" -> 1L, "b" -> 1L))
    assert(wf(Seq("a" -> 5L, "b" -> 6L), budget = 0L) ===
      Map("a" -> 0L, "b" -> 0L))
  }

  test("waterfill: allocation totals never exceed the budget and are " +
      "maximal for a min-cap allocation") {
    val avail = Seq("a" -> 13L, "b" -> 2L, "c" -> 29L, "d" -> 7L,
      "e" -> 101L)
    for (b <- Seq(0L, 1L, 5L, 20L, 60L, 151L, 152L, 1000L)) {
      val q = wf(avail, b)
      val total = q.values.sum
      assert(total <= b || total == avail.map(_._2).sum.min(b),
        s"budget $b overspent: $q")
      assert(total <= b.min(avail.map(_._2).sum))
      // maximality: cap+1 would overspend (unless everything funded)
      if (total < avail.map(_._2).sum) {
        val cap = q.collect {
          case (d, v) if v < avail.toMap.apply(d) => v }.maxOption
        cap.foreach { c =>
          val overT = avail.map { case (_, a) => math.min(a, c + 1) }.sum
          assert(overT > b, s"budget $b cap $c not maximal")
        }
      }
    }
  }

  // ---- degenerate evaluation inputs --------------------------------------

  test("rocCurve/prCurve/aucBinned stay finite on a single-class truth " +
      "column (no NaN/Inf from the absent class's denominator)") {
    val allPos = Seq((0.9, true), (0.4, true), (0.1, true))
      .toDF("score", "t")
    val roc = Evaluation.rocCurve(allPos, col("score"), col("t"))
      .collect()
    assert(roc.forall { r =>
      val f = r.getAs[Double]("fpr"); !f.isNaN && !f.isInfinite })
    assert(roc.map(_.getAs[Double]("fpr")).toSet === Set(0d))
    val pr = Evaluation.prCurve(allPos, col("score"), col("t")).collect()
    assert(pr.forall { r =>
      val p = r.getAs[Double]("precision"); val c = r.getAs[Double]("recall")
      !p.isNaN && !c.isNaN && !p.isInfinite && !c.isInfinite })
    val auc = Evaluation.aucBinned(allPos, col("score"), col("t"))
      .collect().head
    assert(auc.getAs[Double]("auc") === 0d)
    assert(auc.getAs[Long]("n_neg") === 0L)
  }

  test("cdcContamination: a verbatim eval copy scores frac 1, unrelated " +
      "text 0, a doc sharing a span scores in between") {
    val evalDoc = "the quick brown fox jumps over the lazy dog while " +
      "the cat sleeps in the warm afternoon sun near the fence"
    val train = Seq(
      (0L, evalDoc),                                // full copy
      (1L, "totally unrelated words about columnar storage engines " +
        "and query optimizers everywhere today"),   // clean
      (2L, "prefix words then " + evalDoc)          // partial overlap
    ).toDF("doc_id", "text")
    val ev = Seq(Tuple1(evalDoc)).toDF("text")
    val out = TextAnalysis.cdcContamination(train, col("doc_id"),
        col("text"), ev, col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("frac")).toMap
    assert(out(0L) === 1.0)
    assert(out(1L) === 0.0)
    assert(out(2L) > 0.0 && out(2L) < 1.0)
  }

  test("confusionMatrix counts exact (truth, pred) pairs") {
    val scored = Seq(("en", "en"), ("en", "de"), ("de", "de"),
      ("en", "en")).toDF("lang", "label")
    val m = Evaluation.confusionMatrix(scored, col("lang"), col("label"))
      .collect().map(r => (r.getAs[String]("truth"),
        r.getAs[String]("pred")) -> r.getAs[Long]("n")).toMap
    assert(m === Map(("en", "en") -> 2L, ("en", "de") -> 1L,
      ("de", "de") -> 1L))
  }

  test("prCurve: precision walks down as fp arrive, recall up") {
    val pts = Evaluation.prCurve(scored, col("score"), col("truth"),
        binDecimals = 2)
      .orderBy(col("score_bin").desc).collect()
    assert(pts.head.getAs[Double]("precision") === 1.0)
    assert(pts.last.getAs[Double]("precision") === 0.5)
    assert(pts.last.getAs[Double]("recall") === 1.0)
  }

  test("perClassF1: perfect classifier scores 1 everywhere; a class " +
      "never predicted gets precision 0 without dividing by zero") {
    val perfect = Seq(("en", "en"), ("de", "de")).toDF("t", "p")
    val f1 = Evaluation.perClassF1(
      Evaluation.confusionMatrix(perfect, col("t"), col("p")))
      .collect().map(r => r.getAs[String]("cls") -> r.getAs[Double]("f1"))
      .toMap
    assert(f1 === Map("en" -> 1.0, "de" -> 1.0))
    val skewed = Seq(("en", "en"), ("de", "en")).toDF("t", "p")
    val m = Evaluation.perClassF1(
      Evaluation.confusionMatrix(skewed, col("t"), col("p")))
      .collect().map(r => r.getAs[String]("cls") ->
        (r.getAs[Double]("precision"), r.getAs[Double]("recall"),
          r.getAs[Double]("f1"))).toMap
    assert(m("de") === ((0.0, 0.0, 0.0))) // never predicted, no NaN
    assert(m("en") === ((0.5, 1.0, 0.666667)))
  }

  test("cosineMatches finds planted cross-corpus copies and nothing " +
      "else at a high threshold") {
    val mk = (seed: Int) => {
      val rng = new scala.util.Random(seed)
      Array.fill(64)((rng.nextDouble() - 0.5).toFloat)
    }
    val train = (0 until 40).map(i => (i.toLong, mk(i)))
      .toDF("id", "vec")
    val eval_ = Seq((1000L, mk(7)), (1001L, mk(23)),
      (1002L, Array.fill(64)(0.5f))).toDF("id", "vec")
    val out = Ann.cosineMatches(train, col("id"), col("vec"),
      eval_, col("id"), col("vec"), threshold = 0.9, dim = 64,
      planes = 10, tables = 20)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(out.toSet === Set((7L, 1000L), (23L, 1001L)))
  }

  // ---- robustness ---------------------------------------------------------

  test("null text is dropped consistently (never NPEs) across the new " +
      "operators — matching the SQL oracles' null propagation") {
    val docs = Seq((0L, "a", "alpha beta gamma delta"),
      (1L, "a", null.asInstanceOf[String]),
      (2L, "b", "epsilon zeta eta theta")).toDF("doc_id", "source", "text")
    val boiler = TextAnalysis.removeBoilerplate(docs, col("doc_id"),
      col("text"), col("source"), 2, 3L)
    assert(boiler.count() === 2 &&
      !boiler.collect().map(_.getAs[Long]("doc_id")).contains(1L))
    val chunks = TextAnalysis.cdcChunkTable(docs, col("doc_id"),
      col("text"))
    assert(!chunks.collect().map(_.getAs[Long]("doc_id")).contains(1L))
    assert(TextAnalysis.cdcDeduplicate(docs, col("doc_id"), col("text"))
      .count() === 2)
    assert(TextAnalysis.hashingTf(docs, col("doc_id"), col("text"))
      .where(col("doc_id") === 1L).count() === 0)
    // null weight rows never pass the >= threshold filter (null compare)
    val topp = Sampling.topPPerGroup(
      docs.select(col("source"), col("doc_id"),
        when(col("text").isNotNull,
          TextAnalysis.tokenCount(col("text"))).as("w")),
      col("source"), col("doc_id"), col("w"), p = 0.9)
    assert(!topp.collect().map(_.getAs[Long]("id")).contains(1L))
  }

  test("boilerplate removal survives one degenerate group holding the " +
      "whole corpus (dictionary stays bounded, result correct)") {
    val docs = (0L until 200L).map(i =>
      (i, "only", s"cookie banner unique$i word$i tail$i pad"))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.removeBoilerplate(docs, col("doc_id"),
      col("text"), col("source"), lineTokens = 2, minDocFreq = 100L)
    val rows = out.collect()
    assert(rows.length === 200)
    assert(rows.forall(_.getAs[Long]("n_removed") === 1L),
      "the shared banner line must be removed in every doc")
    assert(rows.forall(!_.getAs[String]("clean_text").contains("cookie")))
  }

  // ---- snapshot diff ------------------------------------------------------

  test("snapshot diff classifies added/removed/changed and drops " +
      "unchanged") {
    val prev = Seq((0L, "same"), (1L, "was this"), (2L, "gone"))
      .toDF("doc_id", "text")
    val next = Seq((0L, "same"), (1L, "now this"), (3L, "brand new"))
      .toDF("doc_id", "text")
    val d = Snapshots.diff(prev, next, col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("status")).toMap
    assert(d === Map(1L -> "changed", 2L -> "removed", 3L -> "added"))
  }

  // ---- ROC / AUC ----------------------------------------------------------

  private lazy val scored = Seq(
    // (score, truth): a perfect split at 0.5
    (0.9, true), (0.8, true), (0.7, true),
    (0.3, false), (0.2, false), (0.1, false)
  ).toDF("score", "truth")

  test("rocCurve on a perfect ranker walks tp first, then fp") {
    val pts = Evaluation.rocCurve(scored, col("score"), col("truth"),
        binDecimals = 2)
      .orderBy(col("score_bin").desc).collect()
    assert(pts.map(r => (r.getAs[Long]("tp"), r.getAs[Long]("fp"))).toSeq
      === Seq((1L, 0L), (2L, 0L), (3L, 0L), (3L, 1L), (3L, 2L), (3L, 3L)))
    assert(pts.last.getAs[Double]("tpr") === 1.0)
    assert(pts.last.getAs[Double]("fpr") === 1.0)
  }

  test("aucBinned: perfect ranker = 1, anti-ranker = 0, ties = 0.5") {
    def auc(rows: Seq[(Double, Boolean)]): Double =
      Evaluation.aucBinned(rows.toDF("score", "truth"), col("score"),
        col("truth")).head().getAs[Double]("auc")
    assert(auc(Seq((0.9, true), (0.8, true), (0.1, false))) === 1.0)
    assert(auc(Seq((0.9, false), (0.8, false), (0.1, true))) === 0.0)
    // every score identical: AUC is the tie half = 0.5
    assert(auc(Seq((0.5, true), (0.5, false), (0.5, true))) === 0.5)
  }
}
