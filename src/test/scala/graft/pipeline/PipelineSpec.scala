package graft.pipeline

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LLM-data-pipeline operator tests: dedup (exact/minhash/simhash),
  * ANN, text analysis, multimodal plumbing — on synthetic fixtures with
  * known ground truth. */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps " +
      "in the warm afternoon sun near the old wooden fence"

  private lazy val docs = Seq(
    (0L, base),
    (1L, base), // exact dup of 0
    (2L, base.replace("lazy", "sleepy")), // near dup of 0
    (3L, "completely different content about distributed query engines " +
      "and columnar storage formats for analytical workloads at scale"),
    (4L, "yet another unrelated document discussing streaming windows " +
      "and watermarks in modern dataflow systems everywhere")
  ).toDF("doc_id", "text")

  test("exact duplicates by content hash") {
    val d = Dedup.exactDuplicates(docs, col("doc_id"), col("text")).collect()
    assert(d.length === 1)
    assert(d(0).getAs[Long]("n") === 2)
    assert(d(0).getAs[Long]("keep_id") === 0L)
  }

  test("normalized duplicates catch case/whitespace variants") {
    val noisy = Seq((0L, "Hello  World"), (1L, "hello world "),
      (2L, "other")).toDF("doc_id", "text")
    val d = Dedup.normalizedDuplicates(noisy, col("doc_id"), col("text"))
      .collect()
    assert(d.length === 1 && d(0).getAs[Long]("n") === 2)
  }

  test("minhash LSH finds exact and near dups, skips unrelated") {
    val pairs = Dedup.nearDuplicates(docs, col("doc_id"), col("text"),
      threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // identical
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L))) // near
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("lshCandidateEval: exact copies always collide, so the planted " +
      "truth is fully recalled; metrics are integers in [0, 1e6]") {
    val row = Dedup.lshCandidateEval(docs, col("doc_id"), col("text"),
      threshold = 0.7).collect()(0)
    val (nTrue, nCand, nHit) = (row.getAs[Long]("n_true"),
      row.getAs[Long]("n_candidates"), row.getAs[Long]("n_hit"))
    // truth at 0.7: the (0,1) exact pair plus the one-word-edit near
    // pairs (0,2)/(1,2) — J = |17 shared| / |23 union| ≈ 0.74
    assert(nTrue === Dedup.jaccardNearDuplicates(docs, col("doc_id"),
      col("text"), 0.7).count())
    assert(nTrue === 3)
    // the J=1 exact pair collides in EVERY band; the J≈0.74 near pairs
    // are the default 4×4 banding's probabilistic tail — which is the
    // point of the harness: it MEASURES that miss instead of hiding it
    assert(nHit >= 1 && nHit <= nTrue)
    assert(nCand >= nHit)
    assert(row.getAs[Long]("recall_ppm") === nHit * 1000000L / nTrue)
    val prec = row.getAs[Long]("precision_ppm")
    assert(prec > 0 && prec <= 1000000L)
    // more, narrower bands (16×2): collision odds at J≈0.74 rise from
    // ~76% to ~99.99% per pair — recall must reach 1.0 here
    val wide = Dedup.lshCandidateEval(docs, col("doc_id"), col("text"),
      threshold = 0.7, k = 32, bands = 16, rows = 2).collect()(0)
    assert(wide.getAs[Long]("n_hit") === 3)
    assert(wide.getAs[Long]("recall_ppm") === 1000000L)
  }

  test("portableMinhashSignature is partitioning-independent and " +
      "permutation-invariant over the shingle set") {
    val sh = Seq(
      (0L, Seq("aa bb cc", "bb cc dd", "cc dd ee")),
      (1L, Seq("cc dd ee", "aa bb cc", "bb cc dd")), // same set, reordered
      (2L, Seq("zz yy xx"))
    ).toDF("id", "sh")
    val sigs = sh.select(col("id"),
      Dedup.portableMinhashSignature(col("sh"), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) === sigs(1L), "order must not matter")
    assert(sigs(0L) !== sigs(2L))
    val again = sh.repartition(5).select(col("id"),
      Dedup.portableMinhashSignature(col("sh"), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(again === sigs)
  }

  test("prefix-filtered jaccard join: exact pairs, agrees with all-pairs") {
    val pairs = Dedup.jaccardNearDuplicates(docs, col("doc_id"),
      col("text"), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys === Set((0L, 1L), (0L, 2L), (1L, 2L)))
    assert(pairs.find(p => (p._1, p._2) == (0L, 1L)).get._3 === 1.0)
    // exact recall guarantee: identical result to brute-force all-pairs
    // verification over every candidate (here: every pair)
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0))
    val all = for (a <- ids; b <- ids if a < b) yield (a, b)
    val brute = Dedup.verifyJaccard(
      all.toSeq.toDF("id_a", "id_b"),
      docs.select(col("doc_id").as("id"),
        TextAnalysis.shingles(col("text"), 3).as("sh")),
      threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys === brute)
  }

  test("minhash jaccard estimate is exact-1.0 for identical docs") {
    val out = Dedup.nearDuplicates(docs, col("doc_id"), col("text"), 0.99)
      .collect()
    assert(out.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L &&
      r.getDouble(2) == 1.0))
  }

  test("hot-band cap bounds candidate volume; narrow buckets still pair") {
    // one degenerate band shared by 50 docs, one clean 2-doc band
    val hot = (0L until 50L).map(i => (i, 0, "HOT"))
    val cool = Seq((100L, 1, "COOL"), (101L, 1, "COOL"))
    val bands = (hot ++ cool).toDF("id", "band_id", "band")
    val uncapped = Dedup.candidatePairs(bands).count()
    assert(uncapped === 50L * 49 / 2 + 1)
    val capped = Dedup.candidatePairs(bands, maxBandWidth = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((100L, 101L))) // hot bucket dropped entirely
    // end-to-end: the cap leaves real near-dup recall intact (planted
    // pairs agree on many bands, none of which is corpus-degenerate)
    val pairs = Dedup.nearDuplicates(docs, col("doc_id"), col("text"),
      threshold = 0.5, maxBandWidth = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)))
  }

  test("connected components: chains merge transitively, islands stay apart") {
    // 1-2, 2-3 chain; 5-6 island; 9 never appears (no row expected)
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("connected components: long chain converges via pointer jumping") {
    // a 64-node path needs log-rounds, not 64 rounds, to converge
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(chain, maxIter = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cc.length === 64 && cc.forall(_._2 === 0L))
  }

  test("duplicate clusters: transitive closure of near-dup pairs") {
    // docs 0,1,2 are pairwise near dups → one cluster labeled 0
    val out = Dedup.duplicateClusters(docs, col("doc_id"), col("text"),
      threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(0L -> 0L, 1L -> 0L, 2L -> 0L))
  }

  test("simhash near-duplicates: identical → distance 0; near → small") {
    val out = Dedup.simhashNearDuplicates(docs, col("doc_id"), col("text"),
      maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(out(((0L, 1L))) === 0)
    assert(out.contains((0L, 2L))) // one word changed → few bits
    assert(!out.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("normalize: unit length, zero vector → null, cosine-invariant") {
    val vecs = Seq(
      (0L, Array(3.0f, 4.0f)),
      (1L, Array(0.0f, 0.0f))).toDF("id", "vec")
    val out = vecs.select(col("id"),
      Ann.normalize(col("vec")).as("u"),
      Ann.norm(Ann.toDouble(col("vec"))).as("n")).orderBy("id").collect()
    assert(out(0).getAs[Double]("n") === 5.0)
    val u = out(0).getSeq[Double](1)
    assert(math.abs(u(0) - 0.6) < 1e-12 && math.abs(u(1) - 0.8) < 1e-12)
    assert(out(1).isNullAt(1)) // zero vector has no direction
    // native kernel ≡ Column-fold reference on real float embeddings
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50)
    val diverging = emb.select(
      Ann.normalize(col("embedding")).as("a"),
      Ann.normalizeHof(col("embedding")).as("b"))
      .where(col("a") =!= col("b"))
    assert(diverging.count() === 0)
  }

  test("candidatePairs contract is positional: any column names work") {
    val bands = Seq((1L, 0, "X"), (2L, 0, "X"), (3L, 1, "Y"))
      .toDF("doc", "bid", "b") // deliberately non-standard names
    val capped = Dedup.candidatePairs(bands, maxBandWidth = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((1L, 2L)))
  }

  test("ANN brute-force top-k: nearest by construction") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val queries = vecs.where(col("vec_id") === 0L)
    val out = Ann.bruteForceTopK(
      vecs.select(col("vec_id"), col("embedding")),
      queries.select(col("vec_id"), col("embedding")), k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq === Seq(1L, 2L))
    assert(out(0).getAs[Double]("sim") > 0.99)
  }

  test("ANN LSH top-k recalls the true neighbor set on clustered data") {
    val rnd = new scala.util.Random(3)
    def jitter(v: Array[Float]): Array[Float] =
      v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f)
    val c1 = Array.fill(16)(1.0f)
    val c2 = Array.tabulate(16)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val corpus = ((0 until 20).map(i => (i.toLong, jitter(c1))) ++
      (20 until 40).map(i => (i.toLong, jitter(c2)))).toDF("id", "vec")
    val queries = Seq((100L, c1)).toDF("qid", "qvec")
    val exact = Ann.bruteForceTopK(corpus, queries, 5)
      .collect().map(_.getAs[Long]("id")).toSet
    val approx = Ann.lshTopK(corpus, queries, 5, dim = 16,
      planes = 4, tables = 16)
      .collect().map(_.getAs[Long]("id")).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall too low (exact=$exact approx=$approx)")
    // all candidates come from cluster 1
    assert(approx.forall(_ < 20))
  }

  test("cosine near-duplicates via LSH + exact verify") {
    val v = Array.fill(16)(1.0f)
    val vecs = Seq(
      (0L, v), (1L, v.map(_ * 2.0f)), // cosine 1.0
      (2L, Array.tabulate(16)(i => if (i < 8) 1.0f else -1.0f)))
      .toDF("id", "vec")
    val out = Ann.cosineNearDuplicates(vecs, col("id"), col("vec"),
      threshold = 0.95, dim = 16, planes = 4, tables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((0L, 1L)))
  }

  test("minhash signature: expression and table paths agree; agreement " +
      "rate tracks Jaccard (permutation sanity)") {
    val sh = docs.select(col("doc_id").as("id"),
      TextAnalysis.shingles(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
    val exprSigs = sh.select(col("id"),
      Dedup.minhashSignature(col("sh"), 64).as("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val tableSigs = Dedup.minhashSignatureTable(sh, 64).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(exprSigs === tableSigs)
    // doc 0 vs doc 2 differ by one word; their true 3-shingle Jaccard is
    // high, and signature agreement must track it (a biased "permutation"
    // collapses to all-or-nothing agreement — the round-2 bug)
    val agree01 = exprSigs(0L).zip(exprSigs(1L)).count(t => t._1 == t._2)
    assert(agree01 === 64) // identical docs → identical signatures
    val agree02 = exprSigs(0L).zip(exprSigs(2L)).count(t => t._1 == t._2)
    assert(agree02 > 32 && agree02 < 64,
      s"agreement $agree02/64 inconsistent with a partial-overlap pair")
  }

  test("deduplicate keeps one representative per duplicate cluster") {
    val kept = Dedup.deduplicate(docs, col("doc_id"), col("text"),
      threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // docs 0,1,2 form a near-dup cluster → keep 0; 3 and 4 unrelated
    assert(kept === Set(0L, 3L, 4L))
  }

  test("IVF top-k recalls brute-force results on clustered data") {
    val rnd = new scala.util.Random(11)
    def jitter(v: Array[Float]): Array[Float] =
      v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f)
    val c1 = Array.fill(16)(1.0f)
    val c2 = Array.tabulate(16)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val c3 = Array.tabulate(16)(i => if (i < 8) 1.0f else -1.0f)
    val corpus = ((0 until 20).map(i => (i.toLong, jitter(c1))) ++
      (20 until 40).map(i => (i.toLong, jitter(c2))) ++
      (40 until 60).map(i => (i.toLong, jitter(c3)))).toDF("id", "vec")
    val queries = Seq((100L, c1)).toDF("qid", "qvec")
    val model = Ann.trainIvf(corpus, nCells = 6, iterations = 2)
    assert(model.nCells === 6)
    val exact = Ann.bruteForceTopK(corpus, queries, 5)
      .collect().map(_.getAs[Long]("id")).toSet
    val ivf = Ann.ivfTopK(corpus, queries, 5, model, nprobe = 2)
      .collect().map(_.getAs[Long]("id")).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall (exact=$exact ivf=$ivf)")
  }

  test("IVF/PQ training survives sparse ids (no stride-divisible id)") {
    // all-odd ids with stride 2: the systematic seed sample matches
    // nothing and must top up from the id-ordered head
    val corpus = (0 until 16).map(i =>
      (2L * i + 1, Array.tabulate(8)(j => (i + j).toFloat)))
      .toDF("id", "vec")
    val ivf = Ann.trainIvf(corpus, nCells = 8, iterations = 1)
    assert(ivf.nCells === 8)
    val pq = Ann.trainPq(corpus, m = 2, ksub = 8, iterations = 1)
    assert(pq.m === 2 && pq.ksub === 8)
    assert(Ann.pqEncode(corpus, pq).count() === 16)
  }

  test("standing IVF index: ivfTopKIndexed over buildIvfIndex equals " +
      "the one-shot ivfTopK") {
    val rnd = new scala.util.Random(17)
    def jitter(v: Array[Float]): Array[Float] =
      v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f)
    val c1 = Array.fill(16)(1.0f)
    val c2 = Array.tabulate(16)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val corpus = ((0 until 20).map(i => (i.toLong, jitter(c1))) ++
      (20 until 40).map(i => (i.toLong, jitter(c2)))).toDF("id", "vec")
    val queries = Seq((100L, c1)).toDF("qid", "qvec")
    val model = Ann.trainIvf(corpus, nCells = 4, iterations = 2)
    val index = Ann.buildIvfIndex(corpus, model)
    assert(index.columns.toSeq === Seq("id", "cell", "vec"))
    val direct = Ann.ivfTopK(corpus, queries, 5, model, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val viaIndex = Ann.ivfTopKIndexed(index, queries, 5, model, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(viaIndex.toSeq.sorted === direct.toSeq.sorted)
  }

  test("PQ: codes are deterministic, in range, and ADC+rerank recalls " +
      "brute force on clustered data") {
    val rnd = new scala.util.Random(13)
    def jitter(v: Array[Float]): Array[Float] =
      v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f)
    val c1 = Array.fill(16)(1.0f)
    val c2 = Array.tabulate(16)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val corpus = ((0 until 30).map(i => (i.toLong, jitter(c1))) ++
      (30 until 60).map(i => (i.toLong, jitter(c2)))).toDF("id", "vec")
    val model = Ann.trainPq(corpus, m = 4, ksub = 8, iterations = 2)
    assert(model.m === 4 && model.ksub === 8 && model.dsub === 4)
    val codes = Ann.pqEncode(corpus, model)
    assert(codes.count() === 60)
    val arr = codes.collect().map(r =>
      r.getLong(0) -> r.getSeq[Int](1))
    assert(arr.forall(_._2.length === 4))
    assert(arr.forall(_._2.forall(c => c >= 0 && c < 8)))
    // deterministic: re-encoding yields identical codes
    val again = Ann.pqEncode(corpus, model).collect().map(r =>
      r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(arr.forall { case (id, code) => again(id) === code })
    val queries = Seq((100L, c1)).toDF("qid", "qvec")
    val exact = Ann.bruteForceTopK(corpus, queries, 5)
      .collect().map(_.getAs[Long]("id")).toSet
    val pq = Ann.pqTopK(corpus, queries, 5, model, rerank = 4)
    val got = pq.collect()
    assert(got.length === 5)
    // output sims are EXACT (re-ranked) — identical to brute-force sims
    val recall = exact.intersect(got.map(_.getAs[Long]("id")).toSet)
      .size.toDouble / exact.size
    assert(recall >= 0.8, s"PQ recall $recall")
    // standing code table gives identical results to the one-shot form
    val viaIndex = Ann.pqTopKIndexed(Ann.buildPqIndex(corpus, model),
      corpus, queries, 5, model, rerank = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(viaIndex.toSeq.sorted ===
      got.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted)
  }

  test("IVF-PQ composition: equals full-scan PQ when probing every " +
      "cell; exact on separated clusters at nprobe=1; indexed form " +
      "identical") {
    val rnd = new scala.util.Random(29)
    def jitter(v: Array[Float]): Array[Float] =
      v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f)
    val c1 = Array.fill(16)(1.0f)
    val c2 = Array.tabulate(16)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val corpus = ((0 until 30).map(i => (i.toLong, jitter(c1))) ++
      (30 until 60).map(i => (i.toLong, jitter(c2)))).toDF("id", "vec")
    val ivfModel = Ann.trainIvf(corpus, nCells = 2)
    val pqModel = Ann.trainPq(corpus, m = 4, ksub = 8, iterations = 2)
    val queries = Seq((100L, c1)).toDF("qid", "qvec")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSeq.sorted
    // probing every cell degenerates to the full-scan PQ search
    val allCells = rows(Ann.ivfPqTopK(corpus, queries, 5, ivfModel,
      pqModel, nprobe = 2, rerank = 4))
    val fullPq = rows(Ann.pqTopK(corpus, queries, 5, pqModel,
      rerank = 4))
    assert(allCells === fullPq)
    // separated clusters: the query's top-5 all live in its own cell,
    // so nprobe=1 with a shortlist covering the cell (5×8 ≥ 30 — the
    // tight cluster quantizes to near-identical codes, so a SMALLER
    // ADC shortlist tie-breaks by id, not true rank) recalls brute
    // force exactly
    val one = Ann.ivfPqTopK(corpus, queries, 5, ivfModel, pqModel,
      nprobe = 1, rerank = 8)
    val exact = Ann.bruteForceTopK(corpus, queries, 5)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(one.collect().map(_.getAs[Long]("id")).toSet === exact)
    // standing composed index gives identical results
    val index = Ann.buildIvfIndex(corpus, ivfModel)
      .join(Ann.pqEncode(corpus, pqModel), "id")
    val viaIndex = rows(Ann.ivfPqTopKIndexed(index, queries, 5,
      ivfModel, pqModel, nprobe = 1, rerank = 8))
    assert(viaIndex === rows(one))
  }

  test("token counts: whitespace and BPE-ish") {
    val df = Seq(Tuple1("hello world, it's 42 degrees!")).toDF("text")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")).as("ws"),
      TextAnalysis.bpeishTokenCount(col("text")).as("bpe")).collect()(0)
    assert(r.getAs[Int]("ws") === 5)
    // hello|world|,|it|'|s|4|2|degrees|! = 10
    assert(r.getAs[Int]("bpe") === 10)
  }

  test("language ID heuristic on real multilingual samples") {
    val samples = Seq(
      ("en", "the cat and the dog are in the house that it built"),
      ("de", "der hund und die katze sind nicht in einem haus zu sehen"),
      ("es", "el perro y la casa es que los gatos por una ventana"),
      ("fr", "le chien et la maison est un des chats que pour demain"),
      ("zh", "这是一个中文句子"),
      ("und", "xyzzy qwerty plugh"))
    val df = samples.toDF("expected", "text")
      .withColumn("got", TextAnalysis.langId(col("text")))
    val rows = df.collect()
    rows.foreach(r => assert(r.getString(2) === r.getString(0),
      s"text '${r.getString(1)}'"))
  }

  test("quality score: prose scores higher than garbage") {
    val df = Seq(
      ("prose", base),
      ("garbage", "!!! ??? ### 12345 67890 @@@ %%% ^^^ &&&")).toDF("kind", "text")
      .select(col("kind"), TextAnalysis.qualityScore(col("text")).as("q"))
    val byKind = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byKind("prose") > byKind("garbage"))
    assert(byKind("prose") > 0.5 && byKind("garbage") < 0.5)
  }

  test("fingerprints: identical docs agree, rolling hash is order-sensitive") {
    val df = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "zeta epsilon delta gamma beta alpha")).toDF("id", "text")
      .select(col("id"),
        TextAnalysis.minShingleFingerprint(col("text")).as("fp"),
        TextAnalysis.rollingHash(col("text")).as("rh"))
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val m = rows.map(t => t._1 -> (t._2, t._3)).toMap
    assert(m(0L) === m(1L))
    assert(m(0L)._2 !== m(2L)._2) // reversed word order → different rolling hash
  }

  test("multimodal: REAL image feature extraction — blockwise integer " +
      "moments match the generative formula exactly; duplicate seeds " +
      "agree; undecodable payloads sentinel") {
    import spark.implicits._
    val imgs = Multimodal.renderGradientPng(
      Seq((0L, 7L, 16), (1L, 7L, 16), (2L, 8L, 16)).toDS())
    val bad = Seq(Multimodal.MediaRecord(9L, "image",
      Array[Byte](1, 2, 3),
      Multimodal.MediaMeta(None, None, None, None))).toDS()
    val feats = Multimodal.extractFeatures(imgs.union(bad), grid = 4)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats.size === 4)
    // recompute the 16 block sums/variances straight from the pixel
    // formula g(x, y) = mix32(seed·256 + y·16 + x) mod 256
    val s = new Array[Long](16)
    val ss = new Array[Long](16)
    for (y <- 0 until 16; x <- 0 until 16) {
      val g = Multimodal.mix32(7L * 256 + y * 16 + x) % 256
      val b = (y / 4) * 4 + x / 4
      s(b) += g
      ss(b) += g * g
    }
    val f0 = feats(0L)
    assert(f0.width === 16 && f0.height === 16)
    assert(f0.block_sum.toSeq === s.toSeq)
    assert(f0.block_var_num.toSeq ===
      s.indices.map(b => 16L * ss(b) - s(b) * s(b)))
    assert(f0.features.length === 32)
    // float embedding is the normalized integer grid
    assert(f0.features(0) === (s(0).toDouble / (255.0 * 16)).toFloat)
    // same seed → identical features; different seed → different
    assert(feats(1L).block_sum.toSeq === f0.block_sum.toSeq)
    assert(feats(1L).features.toSeq === f0.features.toSeq)
    assert(feats(2L).block_sum.toSeq !== f0.block_sum.toSeq)
    // corrupt payload: sentinel row, job survives
    assert(feats(9L).width === -1 && feats(9L).features.isEmpty)
    // a BMP render of the same pixels decodes to the SAME grid (both
    // containers lossless RGB) while the payload bytes differ — the
    // content-vs-byte dedup contrast dedup_images_content relies on
    val bmp = Multimodal.renderGradientPng(
      Seq((5L, 7L, 16)).toDS(), "bmp").collect().head
    assert(bmp.payload.toSeq !==
      imgs.collect().head.payload.toSeq)
    val bmpFeats = Multimodal.extractFeatures(
      Seq(bmp).toDS(), grid = 4).collect().head
    assert(bmpFeats.block_sum.toSeq === f0.block_sum.toSeq)
    assert(bmpFeats.block_var_num.toSeq === f0.block_var_num.toSeq)
  }

  test("multimodal: REAL nearest-neighbor resize — exact source pixels, " +
      "metadata updated, corrupt payloads pass through") {
    import spark.implicits._
    val imgs = Multimodal.renderGradientPng(
      Seq((1L, 7L, 32), (2L, 9L, 32)).toDS())
    val resized = Multimodal.resizeImage(imgs, 8, 8).collect()
    assert(resized.forall(r => r.meta.width.contains(8) &&
      r.meta.height.contains(8) && r.meta.codec.contains("png")))
    // decoded resized pixels ARE the generative formula at (4x, 4y)
    resized.foreach { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      assert(img.getWidth === 8 && img.getHeight === 8)
      val seed = if (r.mediaId == 1L) 7L else 9L
      def mix32(k: Long): Long = {
        var z = (k * 2654435761L) & 0xFFFFFFFFL
        z ^= z >>> 16
        z = (z * 40503L) & 0xFFFFFFFFL
        z ^= z >>> 13
        z
      }
      for (y <- 0 until 8; x <- 0 until 8) {
        val want =
          (mix32(seed * 1024L + (4L * y) * 32L + 4L * x) % 256L).toInt
        assert((img.getRGB(x, y) & 0xFF) === want, s"id=${r.mediaId} ($x,$y)")
      }
    }
    // corrupt blob: passes through, flagged, job survives
    val junk = Multimodal.resizeImage(
      Seq(Multimodal.MediaRecord(9L, "image", Array[Byte](1, 2, 3),
        Multimodal.MediaMeta(None, None, None, Some("png")))).toDS(),
      8, 8).collect()
    assert(junk.head.meta.codec.contains("undecodable"))
    assert(junk.head.payload.toSeq === Seq[Byte](1, 2, 3))
  }

  test("multimodal: REAL audio energy hash — planted duplicates agree, " +
      "corrupt and misaligned payloads yield sentinels") {
    import spark.implicits._
    val wavs = Multimodal.renderModulatedWav(
      Seq((1L, 7L), (2L, 7L), (3L, 8L)).toDS())
    val fps = Multimodal.audioEnergyHash(wavs).collect()
      .map(f => f.media_id -> f).toMap
    assert(fps(1L).ehash === fps(2L).ehash) // same seed → same audio
    assert(fps(1L).ehash_bits === fps(2L).ehash_bits)
    assert(fps(1L).ehash !== fps(3L).ehash)
    assert(fps(1L).ehash_bits.length === 64)
    // corrupt payload → sentinel, job survives
    val junk = Multimodal.audioEnergyHash(
      Seq(Multimodal.MediaRecord(9L, "audio", Array[Byte](1, 2, 3),
        Multimodal.MediaMeta(None, None, None, None))).toDS()).collect()
    assert(junk.head.ehash === -1L && junk.head.ehash_bits === "")
    // non-block-aligned frame count → sentinel, not a wrong hash
    val odd = Multimodal.audioEnergyHash(
      Multimodal.renderWav(Seq((4L, 8000, 803)).toDS()), blocks = 65)
      .collect()
    assert(odd.head.ehash === -1L)
  }

  test("multimodal: frame sampling slices payload deterministically") {
    val media = Multimodal.fromText(docs, col("doc_id"), col("text"))
    val frames = media.select(col("media_id"),
      Multimodal.frameSample(col("payload"), n = 4, frameBytes = 10)
        .as("frames")).collect()
    frames.foreach { r =>
      val fs = r.getSeq[Array[Byte]](1)
      assert(fs.length === 4)
      assert(fs.forall(_.length === 10))
    }
  }

  test("multimodal: REAL PNG round-trip — ImageIO-rendered payloads " +
      "decode back to their pixel dimensions; junk bytes degrade, " +
      "not crash") {
    import spark.implicits._
    val dims = spark.createDataset(Seq(
      (1L, 17, 9), (2L, 300, 1), (3L, 1, 1)))
    val media = Multimodal.renderPng(dims)
    // the payloads are genuine PNG files (magic bytes)
    val payloads = media.collect()
    assert(payloads.forall(_.payload.take(4).toSeq ===
      Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
    val decoded = Multimodal.decodeImageDims(media).collect()
      .map(d => d.media_id -> ((d.width, d.height, d.codec))).toMap
    assert(decoded === Map(
      1L -> ((17, 9, "png")), 2L -> ((300, 1, "png")),
      3L -> ((1, 1, "png"))))
    // corrupt payload: reported, not thrown
    val junk = spark.createDataset(Seq(Multimodal.MediaRecord(
      9L, "image", Array[Byte](1, 2, 3, 4),
      Multimodal.MediaMeta(None, None, None, None))))
    val bad = Multimodal.decodeImageDims(junk).collect().head
    assert((bad.width, bad.height, bad.codec) === ((-1, -1, "undecodable")))
  }

  test("multimodal: REAL WAV round-trip — javax.sound-rendered payloads " +
      "decode to their format, frame count, and exact square-wave RMS") {
    import spark.implicits._
    val specs = spark.createDataset(Seq(
      (1L, 8000, 800), (2L, 16000, 1234), (57L, 12000, 801)))
    val media = Multimodal.renderWav(specs)
    // payloads are genuine RIFF/WAVE files (magic bytes)
    val payloads = media.collect()
    assert(payloads.forall(_.payload.take(4).toSeq ===
      "RIFF".getBytes.toSeq))
    assert(payloads.forall(_.payload.slice(8, 12).toSeq ===
      "WAVE".getBytes.toSeq))
    val dec = Multimodal.decodeAudioStats(media).collect()
      .map(a => a.media_id ->
        ((a.sample_rate, a.channels, a.n_frames, a.rms))).toMap
    // RMS of an alternating ±A wave is exactly A = 1000 + id % 100
    assert(dec === Map(
      1L -> ((8000L, 1L, 800L, 1001.0)),
      2L -> ((16000L, 1L, 1234L, 1002.0)),
      57L -> ((12000L, 1L, 801L, 1057.0))))
    // corrupt payload: reported, not thrown
    val junk = spark.createDataset(Seq(Multimodal.MediaRecord(
      9L, "audio", Array[Byte](82, 73, 70, 70, 1, 2),
      Multimodal.MediaMeta(None, None, None, None))))
    val bad = Multimodal.decodeAudioStats(junk).collect().head
    assert((bad.sample_rate, bad.codec) === ((-1L, "undecodable")))
  }

  test("multimodal: REAL animated-GIF round-trip — sequence-written " +
      "payloads decode to frame count and exact sampled intensities") {
    import spark.implicits._
    val specs = spark.createDataset(Seq(
      (7L, 10, 5), (2L, 8, 3), (41L, 12, 6)))
    val media = Multimodal.renderGif(specs)
    // payloads are genuine GIF89a streams
    val payloads = media.collect()
    assert(payloads.forall(_.payload.take(6).toSeq ===
      "GIF89a".getBytes.toSeq))
    val dec = Multimodal.decodeVideoStats(media, stride = 2).collect()
      .map(v => v.media_id ->
        ((v.n_frames, v.width, v.height, v.sampled_frames,
          v.intensity_sum))).toMap
    def sum(id: Long, nf: Int) =
      (0 until nf by 2).map(f => (id * 31 + f * 17) % 256).sum
    assert(dec === Map(
      7L -> ((5L, 10L, 10L, 3L, sum(7, 5))),
      2L -> ((3L, 8L, 8L, 2L, sum(2, 3))),
      41L -> ((6L, 12L, 12L, 3L, sum(41, 6)))))
    // stride 1 decodes every frame; counts agree with getNumImages
    val all = Multimodal.decodeVideoStats(media, stride = 1).collect()
      .map(v => v.media_id -> v.sampled_frames).toMap
    assert(all === Map(7L -> 5L, 2L -> 3L, 41L -> 6L))
    // corrupt payload: reported, not thrown
    val junk = spark.createDataset(Seq(Multimodal.MediaRecord(
      9L, "video", Array[Byte](71, 73, 70, 56),
      Multimodal.MediaMeta(None, None, None, None))))
    val bad = Multimodal.decodeVideoStats(junk).collect().head
    assert((bad.n_frames, bad.codec) === ((-1L, "undecodable")))
  }

  test("scene cuts: detected exactly where the generative gray level " +
      "wraps; none below threshold; corrupt payloads yield no rows") {
    import spark.implicits._
    // id 14: levels 14*31 + f*17 mod 256 for f=0..5 — wraps where the
    // +17 step crosses 256; expected cuts from the formula directly
    val specs = Seq((14L, 8, 6), (2L, 8, 3)).toDS()
    val media = Multimodal.renderGif(specs)
    val got = Multimodal.detectSceneCuts(media, threshold = 100L)
      .collect().map(c => (c.media_id, c.frame, c.delta)).toSet
    val expected = (for {
      (id, nf) <- Seq((14L, 6), (2L, 3))
      f <- 1 until nf
      cur = (id * 31 + f * 17) % 256
      prev = (id * 31 + (f - 1) * 17) % 256
      if math.abs(cur - prev) >= 100
    } yield (id, f.toLong, math.abs(cur - prev))).toSet
    assert(got === expected)
    assert(expected.nonEmpty, "fixture plants at least one wrap cut")
    // monotone +17 steps never fire below threshold
    assert(got.forall(_._3 === 239L), "only wrap deltas qualify")
    val junk = spark.createDataset(Seq(Multimodal.MediaRecord(
      9L, "video", Array[Byte](71, 73, 70, 56),
      Multimodal.MediaMeta(None, None, None, None))))
    assert(Multimodal.detectSceneCuts(junk, 100L).count() === 0L)
  }

  test("keyframes: frame 0 plus one per cut, shots numbered in order, " +
      "PNG payload decodes back to the generative gray") {
    import spark.implicits._
    val specs = Seq((14L, 8, 6), (2L, 8, 3)).toDS()
    val got = Multimodal.extractKeyframes(
      Multimodal.renderGif(specs), threshold = 100L).collect()
      .sortBy(k => (k.media_id, k.frame))
    val expected = (for {
      (id, nf) <- Seq((14L, 6), (2L, 3))
      f <- 0 until nf
      cur = (id * 31 + f * 17) % 256
      prev = (id * 31 + (f - 1) * 17) % 256
      if f == 0 || math.abs(cur - prev) >= 100
    } yield (id, f.toLong, cur)).sorted
    assert(got.map(k => (k.media_id, k.frame, k.mean)).toSeq === expected)
    // shot indexes are 0,1,2,... per video in frame order
    got.groupBy(_.media_id).foreach { case (_, ks) =>
      assert(ks.sortBy(_.frame).map(_.shot).toSeq ===
        ks.indices.map(_.toLong))
    }
    // the emitted PNG is a real image of the keyframe: solid gray at
    // the frame's generative level
    got.foreach { k =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(k.png))
      assert(img.getWidth === 8 && img.getHeight === 8)
      // raw raster sample — getRGB on a linear-gray image would run
      // the gray→sRGB conversion and bend the stored level
      assert(img.getRaster.getSample(3, 4, 0).toLong === k.mean)
    }
    val junk = spark.createDataset(Seq(Multimodal.MediaRecord(
      9L, "video", Array[Byte](71, 73, 70, 56),
      Multimodal.MediaMeta(None, None, None, None))))
    assert(Multimodal.extractKeyframes(junk, 100L).count() === 0L)
  }

  test("image entropy: solid image 0 bits, half-and-half 1 bit, " +
      "corrupt payload sentinel") {
    import spark.implicits._
    def png(levels: (Int, Int)): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) {
        val g = if (y < 4) levels._1 else levels._2
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = spark.createDataset(Seq(
      Multimodal.MediaRecord(0L, "image", png((80, 80)),
        Multimodal.MediaMeta(None, None, None, None)),
      Multimodal.MediaRecord(1L, "image", png((10, 200)),
        Multimodal.MediaMeta(None, None, None, None)),
      Multimodal.MediaRecord(2L, "image", Array[Byte](1, 2, 3),
        Multimodal.MediaMeta(None, None, None, None))))
    val out = Multimodal.imageEntropy(media).collect()
      .map(e => e.media_id -> e).toMap
    assert(out(0L).entropy_bits === 0.0 && out(0L).distinct_levels === 1L)
    assert(out(1L).entropy_bits === 1.0 && out(1L).distinct_levels === 2L)
    assert(out(0L).n_px === 64L)
    assert(out(2L).n_px === -1L && out(2L).entropy_bits === -1.0)
  }

  test("semantic dedup: equals brute force on separated clusters; " +
      "subset of brute force always; min-id keeper") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def jitter(base: Array[Double], eps: Double) =
      base.map(_ + rnd.nextGaussian() * eps)
    // two well-separated cluster centers + planted near-dups
    val c1 = Array(10.0, 0.0, 0.0, 0.0)
    val c2 = Array(0.0, 10.0, 0.0, 0.0)
    val vecs: Seq[(Long, Array[Double])] =
      (0L until 10L).map(i => i -> jitter(c1, 2.0)) ++
      (10L until 20L).map(i => i -> jitter(c2, 2.0)) ++
      Seq(100L -> jitter(c1, 0.01), 101L -> jitter(c2, 0.01),
        102L -> jitter(c1, 0.01))
    val df = vecs.toDF("vec_id", "embedding")
    val model = Ann.trainIvf(df, nCells = 2)
    val got = Ann.semanticDedup(df, col("vec_id"), col("embedding"),
        model, threshold = 0.999)
      .collect().map(r => (r.getAs[Long]("drop_id"),
        r.getAs[Long]("keep_id"))).toSet
    // brute force ground truth at the same threshold
    val brute = (for {
      (ia, va) <- vecs; (ib, vb) <- vecs if ia < ib
      dot = va.zip(vb).map { case (x, y) => x * y }.sum
      sim = dot / (math.sqrt(va.map(x => x * x).sum) *
        math.sqrt(vb.map(x => x * x).sum))
      if sim >= 0.999
    } yield (ia, ib)).toSet
    val bruteDrops = brute.groupBy(_._2)
      .map { case (b, ps) => (b, ps.map(_._1).min) }.toSet
    // near-dups here never straddle the 2 well-separated cells → exact
    assert(got === bruteDrops)
    assert(brute.nonEmpty) // the planted dups are real
    // and every reported drop is a true near-dup pair
    got.foreach { case (d, k) => assert(brute.contains((k, d))) }
  }

  test("int8 quantization: codes in range, zero vector safe, scale " +
      "reconstructs max") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(2.0f, 2.0f, -2.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Ann.int8QuantStats(df, col("vec_id"), col("embedding"))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("dim"), r.getAs[Double]("scale"),
          r.getAs[Long]("max_code"), r.getAs[Long]("sum_abs_code"))))
      .toMap
    // vec 1: amax=1.0 → codes (64, -127, 32, 0) [round(0.5*127)=64]
    assert(out(1L) === ((4L, math.rint(1.0 / 127 * 1e6) / 1e6, 127L,
      64L + 127L + 32L)))
    // zero vector: all-zero codes, scale 0
    assert(out(2L) === ((4L, 0.0, 0L, 0L)))
    // vec 3: amax=2 → codes (127,127,-127,64)
    assert(out(3L) === ((4L, math.rint(2.0 / 127 * 1e6) / 1e6, 127L,
      127L * 3 + 64L)))
    // codes column itself stays in [-127, 127]
    val codes = df.select(Ann.int8Codes(col("embedding")).as("c"))
      .selectExpr("explode(c) as v").collect().map(_.getLong(0))
    assert(codes.forall(c => c >= -127 && c <= 127))
  }
}
