package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the properties that decide whether these
  * operators survive a 100 TB scale-up — filter pushdown reaching the
  * parquet scan, column pruning, broadcast joins for small dims, and no
  * cartesian products in BGP chains. Regressions here are performance
  * bugs even when results stay correct. */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def executedPlan(df: DataFrame): String = {
    df.collect() // force AQE to finalize
    def unwrap(p: SparkPlan): String = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case other                    => other.toString
    }
    unwrap(df.queryExecution.executedPlan)
  }

  test("time-range query pushes timestamp + bucket filters into the scan") {
    val dir = java.nio.file.Files.createTempDirectory("plan").resolve("log")
    val log = new graft.storage.EventLog(spark, dir.toString, 1000L)
    log.append(graft.core.RdfEvent.toDF(spark, (0 until 100).map(i =>
      graft.core.RdfEvent(i * 100L, s"http://e.org/s$i", "http://e.org/p",
        i.toString, ""))))
    val plan = log.query(2000, 4000).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("timestamp"), s"no pushed timestamp filter in:\n$plan")
    // partition (directory) pruning on the bucket column
    assert(plan.contains(graft.storage.EventLog.BucketCol))
  }

  test("SPARQL pattern constants reach a physical quads scan as pushed " +
      "filters") {
    // on a REAL quads table (EventLog parquet), a constant-predicate
    // pattern must push `predicate = <iri>` into the scan
    val dir = java.nio.file.Files.createTempDirectory("plan2").resolve("log")
    val log = new graft.storage.EventLog(spark, dir.toString, 86400000L)
    log.append(graft.core.RdfEvent.toDF(spark, (0 until 50).map(i =>
      graft.core.RdfEvent(i, s"http://e.org/s$i",
        if (i % 2 == 0) "http://e.org/temp" else "http://e.org/hum",
        i.toString, ""))))
    val q = graft.sparql.SparqlParser.parse(
      "SELECT ?s ?v WHERE { ?s <http://e.org/temp> ?v }")
    val df = graft.sparql.SparqlCompiler.compile(log.read(), q)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(predicate"),
      s"constant predicate not pushed to the scan:\n$plan")
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
  }

  test("BGP over the inline quads adapter stays a single codegen stage " +
      "with no cartesian product") {
    val df = SparkEntry.queries("r1_bgp_join")(spark, sf)
    val plan = executedPlan(df)
    assert(!plan.toLowerCase.contains("cartesianproduct"),
      s"BGP chain degenerated to a cartesian product:\n$plan")
  }

  test("BGP self-joins are hash equi-joins, never cartesian") {
    val plan = executedPlan(SparkEntry.queries("r6_exists_semijoin")(spark, sf))
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
    assert(plan.contains("Join"), plan)
  }

  test("OPTIONAL with an outer-variable crossing filter keeps the equi " +
      "key extractable — hash/sort-merge join, not a nested loop") {
    val plan = executedPlan(
      SparkEntry.queries("r39_optional_outer_filter")(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"crossing filter degenerated the LeftJoin to a nested loop:\n$plan")
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
  }

  test("small dimension join broadcasts (q3: customer side)") {
    val plan = executedPlan(SparkEntry.queries("q3_join_broadcast")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast join for the filtered customer dim:\n$plan")
  }

  test("column pruning: token counting reads only the needed columns") {
    val df = SparkEntry.queries("text_tokens")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"))
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"scan reads more columns than projected: $readSchema")
  }

  test("events scan prunes columns for the quads adapter") {
    val df = graft.sources.EventsAsQuads.quads(spark, sf)
      .select("subject", "predicate")
    val plan = df.queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    // props is never needed by the quads mapping
    assert(!readSchema.contains("props"),
      s"quads adapter scan fails to prune: $readSchema")
  }

  test("whole-stage codegen covers the hot scan→filter→project spans") {
    val df = SparkEntry.queries("f_is_outlier")(spark, sf)
    val plan = executedPlan(df)
    // codegen'd operators render with the `*(stageId)` marker
    assert(plan.contains("*(1)"),
      s"no codegen span in extension-function filter plan:\n$plan")
  }

  test("document fingerprinting is ONE codegen'd map stage: no explode, " +
      "no shuffle, no join") {
    val df = SparkEntry.queries("text_fingerprint")(spark, sf)
    val plan = executedPlan(df)
    assert(!plan.contains("Exchange"),
      s"fingerprint plan shuffles — should be a pure map stage:\n$plan")
    assert(!plan.contains("Generate") && !plan.toLowerCase.contains("join"),
      s"fingerprint plan explodes/joins — should be a pure map stage:\n$plan")
    assert(plan.contains("*(1)"), s"fingerprint stage not codegen'd:\n$plan")
  }

  test("simhash table is shuffle-free per doc; near-dup pairs shuffle " +
      "only on chunk keys") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val c = org.apache.spark.sql.functions.col _
    val sims = graft.pipeline.Dedup.simhashTable(docs, c("doc_id"), c("text"))
    val simPlan = executedPlan(sims)
    assert(!simPlan.contains("Exchange"),
      s"per-doc simhash must not shuffle:\n$simPlan")
    val pairs = graft.pipeline.Dedup.simhashNearDuplicates(docs,
      c("doc_id"), c("text"), maxHamming = 3)
    val pairPlan = executedPlan(pairs)
    assert(!pairPlan.toLowerCase.contains("cartesianproduct"), pairPlan)
  }

  test("minhash LSH candidate generation shuffles on band keys " +
      "(sort-merge/hash join, no broadcast of the full corpus, " +
      "no cartesian)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pairs = graft.pipeline.Dedup.nearDuplicates(docs,
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text"), threshold = 0.8,
      k = 64, bands = 16, rows = 4)
    val plan = executedPlan(pairs)
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
  }

  test("OPTIONAL compiles to an outer hash/sort-merge join, no cartesian") {
    val plan = executedPlan(SparkEntry.queries("r12_optional")(spark, sf))
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
    assert(plan.contains("Outer") || plan.contains("LeftOuter"),
      s"no outer join in OPTIONAL plan:\n$plan")
  }

  test("VALUES inline data joins via broadcast (never shuffles the scan " +
      "side onto a 2-row local relation)") {
    val plan = executedPlan(SparkEntry.queries("r18_values")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"VALUES join did not broadcast:\n$plan")
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
  }

  test("ORDER BY + LIMIT plans TakeOrderedAndProject (per-partition " +
      "top-k, no global sort)") {
    val plan = executedPlan(SparkEntry.queries("r16_topk")(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k query fell back to a global sort:\n$plan")
  }

  test("MINUS compiles to an anti join; subquery join is not cartesian") {
    val minusPlan = executedPlan(SparkEntry.queries("r15_minus")(spark, sf))
    assert(minusPlan.contains("Anti"),
      s"MINUS did not plan an anti join:\n$minusPlan")
    val subqPlan = executedPlan(SparkEntry.queries("r24_subquery")(spark, sf))
    assert(!subqPlan.toLowerCase.contains("cartesianproduct"), subqPlan)
  }

  test("prefix-filtered jaccard join has no cartesian product") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pairs = graft.pipeline.Dedup.jaccardNearDuplicates(docs,
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text"), threshold = 0.8)
    val plan = executedPlan(pairs)
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
  }

  test("PII profile is one shuffle-free codegen'd map stage") {
    val c = org.apache.spark.sql.functions.col _
    val df = graft.pipeline.Pii.piiTable(
      spark.read.parquet(s"$sf/documents.parquet"), c("doc_id"), c("text"))
    val plan = executedPlan(df)
    assert(!plan.contains("Exchange"),
      s"PII profile shuffles — should be a pure map stage:\n$plan")
    assert(plan.contains("*(1)"), s"PII stage not codegen'd:\n$plan")
  }

  test("hash sampling is a pure filter: no shuffle, scan columns pruned") {
    val c = org.apache.spark.sql.functions.col _
    val df = graft.pipeline.Sampling.stratifiedSample(
      spark.read.parquet(s"$sf/documents.parquet"),
      c("lang"), c("doc_id"), Map("en" -> 0.5), defaultRate = 0.1)
      .select("doc_id")
    val plan = executedPlan(df)
    assert(!plan.contains("Exchange"),
      s"hash sampling shuffles — should be a pure filter:\n$plan")
  }

  test("quota sampling shuffles on the SALTED stratum key first (skew-" +
      "proof two-phase top-n), never a lone global stratum window") {
    val c = org.apache.spark.sql.functions.col _
    val df = graft.pipeline.Sampling.quotaSample(
      spark.read.parquet(s"$sf/documents.parquet"),
      c("lang"), c("doc_id"), n = 5)
    val plan = executedPlan(df)
    // phase 1 partitions by (stratum, input partition id): the exchange
    // key includes the salt column
    assert(plan.contains("__p"),
      s"phase-1 salt column missing from the plan:\n$plan")
    assert(plan.contains("Window"), plan)
  }

  test("vocabulary aggregation pre-combines map-side (partial aggregate " +
      "before the token-key exchange)") {
    val c = org.apache.spark.sql.functions.col _
    val df = graft.pipeline.TextAnalysis.vocabulary(
      spark.read.parquet(s"$sf/documents.parquet"), c("doc_id"), c("text"))
    val plan = executedPlan(df)
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("partial"),
      s"no map-side partial aggregation in vocabulary plan:\n$plan")
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
  }

  test("end-to-end curation pipeline composes into one plan: no " +
      "cartesian, dedup join is the only join") {
    val plan = executedPlan(SparkEntry.queries("pipeline_e2e")(spark, sf))
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
    // quality filter + sample are pure filters; chunking is a generate —
    // the only join in the whole chain is the keep-min dedup equi-join
    assert(plan.contains("Join"), plan)
    assert(plan.contains("Generate"), plan)
  }

  test("repetition profile is one shuffle-free codegen'd map stage " +
      "(native mode kernel, no explode)") {
    val c = org.apache.spark.sql.functions.col _
    val df = graft.pipeline.TextAnalysis.repetitionTable(
      spark.read.parquet(s"$sf/documents.parquet"), c("doc_id"), c("text"))
    val plan = executedPlan(df)
    assert(!plan.contains("Exchange"),
      s"repetition profile shuffles — should be a pure map stage:\n$plan")
    assert(!plan.contains("Generate"), plan)
    assert(plan.contains("*(1)"), s"repetition stage not codegen'd:\n$plan")
  }

  test("contamination screen broadcasts the eval n-gram set (semi-join, " +
      "no shuffle of corpus n-grams onto eval keys, no cartesian)") {
    val c = org.apache.spark.sql.functions.col _
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.pipeline.Contamination.overlapTable(
      docs.where(c("doc_id") < 450), c("doc_id"), c("text"),
      docs.where(c("doc_id") >= 450), c("text"))
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"eval side not broadcast:\n$plan")
    // ONE corpus scan + one eval scan: the hit-marker left join +
    // per-doc aggregation replaces the earlier two-corpus-scan
    // (semi-join + rejoin) shape
    assert(plan.linesIterator.count(_.contains("Relation [")) <= 2,
      s"corpus scanned more than once:\n$plan")
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
  }

  test("common-ngram mining pre-combines map-side and takes top-k " +
      "without a global sort") {
    val c = org.apache.spark.sql.functions.col _
    val df = graft.pipeline.TextAnalysis.commonNgrams(
      spark.read.parquet(s"$sf/documents.parquet"), c("doc_id"), c("text"),
      n = 3, minDf = 2L, k = 50)
    val plan = executedPlan(df)
    assert(plan.contains("partial"),
      s"no map-side partial aggregation in ngram plan:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k cut fell back to a global sort:\n$plan")
  }

  test("URL domain stats shuffle only on the domain key; extraction is " +
      "a codegen'd map+generate stage") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    // synthetic prose has no URLs (AQE would collapse the aggregate on
    // an empty generate) — plant one per doc as the oracle entry does
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("t", concat(col("text"), lit(" https://x"),
        col("doc_id") % 5, lit(".example.com/p")))
    val df = graft.pipeline.UrlAnalysis.domainStats(docs, col("doc_id"),
      col("t"))
    val plan = executedPlan(df)
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
    assert(plan.contains("Generate"), plan)
    assert(plan.contains("partial"),
      s"no map-side partial aggregation in domain stats plan:\n$plan")
  }

  test("hash split is a pure map stage; surprisal pre-combines map-side") {
    val c = org.apache.spark.sql.functions.col _
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val split = graft.pipeline.Sampling.hashSplit(
      docs.select(c("doc_id")), c("doc_id"),
      Seq("train" -> 0.9, "val" -> 0.1))
    val splitPlan = executedPlan(split)
    assert(!splitPlan.contains("Exchange"),
      s"hash split shuffles — should be a pure map stage:\n$splitPlan")
    val vocab = graft.pipeline.TextAnalysis.vocabulary(
      docs, c("doc_id"), c("text"))
    val surprisal = graft.pipeline.TextAnalysis.unigramSurprisal(
      docs, c("doc_id"), c("text"), vocab)
    val sPlan = executedPlan(surprisal)
    assert(sPlan.contains("partial"),
      s"no map-side partial aggregation in surprisal plan:\n$sPlan")
    assert(!sPlan.toLowerCase.contains("cartesianproduct"), sPlan)
  }

  test("connected components: per-round plans are equi-joins, no cartesian") {
    val spark2 = spark
    import spark2.implicits._
    val pairs = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = graft.pipeline.Dedup.connectedComponents(pairs)
    val plan = executedPlan(cc)
    // the final labels frame is localCheckpoint-backed; the audit is on
    // convergence having used joins (scan of checkpointed RDD) — the
    // strongest assertion available post-truncation is no cartesian and
    // a bounded row count
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
    assert(cc.count() === 41)
  }

  test("BM25: term filter precedes the postings shuffle, df stats " +
      "broadcast, top-k is TakeOrdered") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val top = graft.pipeline.Retrieval.bm25TopK(docs, col("doc_id"),
      col("text"), Seq("spark", "vector"), k = 10)
    val plan = executedPlan(top)
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k is not a per-partition heap:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"),
      s"df-stats join is not broadcast:\n$plan")
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
    // the isin(queryTerms) filter must survive into the physical plan
    // (it is what keeps the postings shuffle proportional to |q| terms)
    assert(plan.contains("spark"), s"no term filter in plan:\n$plan")
  }

  test("packConcat has no single-partition window and explodes " +
      "sequence() per row") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val packed = graft.pipeline.Packing.packConcat(docs, col("doc_id"),
      col("text"), budget = 256L)
    val plan = executedPlan(packed)
    assert(!plan.contains("Window"),
      s"packConcat fell back to a window (one-task global sort):\n$plan")
    assert(plan.contains("Generate explode"),
      s"straddle expansion is not a generator:\n$plan")
  }

  test("edit-distance dedup joins on the length bucket — hash/sort " +
      "equi-join, never cartesian") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pairs = graft.pipeline.Dedup.editDistanceDuplicates(docs,
      col("doc_id"), col("text"), maxDist = 8)
    val plan = executedPlan(pairs)
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"bucket join degraded to nested loop:\n$plan")
  }

  test("NB scoring joins the model as a BROADCAST hash join — no " +
      "shuffle keyed on tokens, no cartesian beyond the C-class " +
      "broadcast expansion") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val m = graft.pipeline.Classifier.trainNaiveBayes(
      docs.where(col("doc_id") < 40), col("text"), col("lang"))
    val scored = graft.pipeline.Classifier.scoreNaiveBayes(
      docs.where(col("doc_id") >= 40), col("doc_id"), col("text"), m)
    val plan = executedPlan(scored)
    assert(plan.contains("BroadcastHashJoin"),
      s"model join did not broadcast:\n$plan")
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
    // the doc-keyed aggregation pre-combines map-side
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"),
      s"score aggregation shape unexpected:\n$plan")
  }

  test("curriculumBins never funnels through a single partition " +
      "(no SinglePartition exchange, unlike a global ntile window)") {
    val df = SparkEntry.queries("curriculum_bins")(spark, sf)
    val plan = executedPlan(df)
    assert(!plan.contains("SinglePartition"),
      s"global funnel in curriculum binning:\n$plan")
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
  }

  test("temperatureSample joins the rate table as a BROADCAST and " +
      "stays scan-shaped (no row shuffle)") {
    val df = SparkEntry.queries("sample_temperature")(spark, sf)
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"rate join did not broadcast:\n$plan")
    // the documents themselves must not be hash-repartitioned: the only
    // allowed exchange feeds the tiny rate/count aggregation
    assert(!"Exchange hashpartitioning\\((doc_id|lang)#"
      .r.findFirstIn(plan).isDefined,
      s"document rows shuffled:\n$plan")
  }

  test("asOfJoin is ONE key-hash window shuffle — no join operator, " +
      "no per-key nested loop") {
    val df = SparkEntry.queries("asof_join")(spark, sf)
    val plan = executedPlan(df)
    assert(plan.contains("Window"), s"no window operator:\n$plan")
    val lower = plan.toLowerCase
    assert(!lower.contains("cartesianproduct") &&
      !lower.contains("broadcastnestedloop"), plan)
    assert(!lower.contains("sortmergejoin") && !lower.contains("hashjoin"),
      s"as-of must not plan a join:\n$plan")
    // exactly one exchange: the __k hash partitioning for the window
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, saw $exchanges:\n$plan")
  }

  test("rangeJoin plans a hash/sort-merge EQUI-join on (key, bucket) — " +
      "never a nested loop with a range residual") {
    val df = SparkEntry.queries("range_join")(spark, sf)
    val plan = executedPlan(df)
    val lower = plan.toLowerCase
    assert(lower.contains("sortmergejoin") || lower.contains("hashjoin"),
      s"no equi-join operator:\n$plan")
    assert(!lower.contains("cartesianproduct") &&
      !lower.contains("broadcastnestedloop"),
      s"range residual fell back to a nested loop:\n$plan")
  }

  test("sessionize + sessionStats reuse the key partitioning: the " +
      "window and the aggregate are two exchanges at most") {
    val df = SparkEntry.queries("session_stats")(spark, sf)
    val plan = executedPlan(df)
    assert(plan.contains("Window"), s"no window operator:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected ≤2 shuffles, saw $exchanges:\n$plan")
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
  }

  test("CDC chunk table is a shuffle-free codegen'd explode; chunk " +
      "dedup adds only the md5-keyed aggregation exchange") {
    val chunks = SparkEntry.queries("text_cdc_chunks")(spark, sf)
    val plan = executedPlan(chunks)
    assert(!plan.contains("Exchange"),
      s"CDC chunking must not shuffle:\n$plan")
    val dedupPlan = executedPlan(SparkEntry.queries("dedup_cdc")(spark, sf))
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(dedupPlan).length
    assert(exchanges <= 2, // partial/final of the distinct-doc agg
      s"chunk dedup should be one keyed agg, saw $exchanges:\n$dedupPlan")
  }

  test("boilerplate removal flags via a BROADCAST join (the dictionary " +
      "is bounded by totalLines/minDocFreq) — no shuffle of the corpus " +
      "for flagging") {
    val plan = executedPlan(
      SparkEntry.queries("text_boilerplate")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"boilerplate dictionary must broadcast:\n$plan")
    assert(!plan.toLowerCase.contains("sortmergejoin"),
      s"corpus-side flagging should never sort-merge:\n$plan")
  }

  test("top-p nucleus: the threshold joins back by BROADCAST and the " +
      "corpus pass is a pure filter (one histogram exchange only)") {
    val plan = executedPlan(SparkEntry.queries("sample_topp")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"threshold table must broadcast:\n$plan")
  }

  test("ROC/AUC windows run over the bin histogram AFTER aggregation — " +
      "the corpus never passes through the single-partition window") {
    val plan = executedPlan(SparkEntry.queries("classify_roc")(spark, sf))
    // the single-partition exchange must consume an aggregate, not a scan
    val idx = plan.indexOf("Exchange SinglePartition")
    assert(idx >= 0, s"expected the bin-histogram window exchange:\n$plan")
    val upstream = plan.substring(idx)
    assert(upstream.contains("HashAggregate"),
      s"single-partition window must sit on the binned aggregate:\n$plan")
  }

  test("snapshot diff is ONE id-keyed full-outer join over (id, md5) " +
      "projections — no cartesian, bodies never shuffle") {
    val plan = executedPlan(SparkEntry.queries("corpus_diff")(spark, sf))
    assert(plan.toLowerCase.contains("fullouter"),
      s"expected a full-outer join:\n$plan")
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
    // the text column must be consumed by md5 at the scan side: the
    // exchange carries only doc_id + hash
    assert(!"Exchange hashpartitioning\\([^)]*text"
      .r.findFirstIn(plan).isDefined,
      s"document text must not be a shuffle key/payload:\n$plan")
  }

  test("materialized CDC dedup: the first-occurrence aggregation and " +
      "keep-join stay equi (no cartesian), reassembly is one doc agg") {
    val plan = executedPlan(
      SparkEntry.queries("dedup_cdc_apply")(spark, sf))
    assert(!plan.toLowerCase.contains("cartesianproduct") &&
      !plan.toLowerCase.contains("broadcastnestedloop"),
      s"keeper join fell back to a nested loop:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 4,
      s"expected ≤4 hash exchanges (firsts agg, join sides, doc agg), " +
        s"saw $exchanges:\n$plan")
  }

  test("triangle counting: wedge and closing joins are hash equi-joins " +
      "with no cartesian or nested-loop fallback") {
    val plan = executedPlan(
      SparkEntry.queries("graph_triangles")(spark, sf))
    assert(!plan.toLowerCase.contains("cartesianproduct") &&
      !plan.toLowerCase.contains("broadcastnestedloop"),
      s"triangle joins fell back to a non-equi strategy:\n$plan")
  }

  test("ppl buckets: the bucket-label join back to the corpus is a " +
      "broadcast, never a shuffle of the scored rows") {
    val plan = executedPlan(
      SparkEntry.queries("quality_ppl_buckets")(spark, sf))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"),
      s"histogram label join must broadcast:\n$plan")
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
  }

  test("MAD outliers: both median tables join back via broadcast; the " +
      "corpus is never shuffled") {
    val plan = executedPlan(
      SparkEntry.queries("quality_mad_outliers")(spark, sf))
    val bcasts = "BroadcastExchange".r.findAllIn(plan).length
    assert(bcasts >= 2,
      s"expected median AND mad broadcasts, saw $bcasts:\n$plan")
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
  }

  test("SRP signatures are one shuffle-free map stage over the " +
      "embeddings scan") {
    val df = graft.pipeline.Embeddings.srpSignatures(
      spark.read.parquet(s"$sf/embeddings.parquet"),
      org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.col("embedding"), dim = 64).toDF()
    val plan = executedPlan(df)
    assert(!plan.contains("Exchange"),
      s"signature computation must not shuffle:\n$plan")
  }

  test("waterfill: the corpus is touched by ONE aggregation; the cap " +
      "is solved driver-side from the pinned histogram (no second " +
      "plan branch, no join at all)") {
    val df = SparkEntry.queries("corpus_waterfill")(spark, sf)
    val plan = executedPlan(df)
    assert(!plan.toLowerCase.contains("cartesianproduct") &&
      !plan.toLowerCase.contains("join"),
      s"expected a join-free projection over the pinned histogram:\n$plan")
    // the returned frame reads the checkpointed domain histogram —
    // the corpus scan happened exactly once, at pin time
    assert(!plan.contains("Scan parquet"),
      s"documents rescanned after the pin:\n$plan")
  }

  test("line dedup: ownership aggregates with map-side partial " +
      "aggregation; the text column never rides the ownership shuffle") {
    val df = SparkEntry.queries("dedup_lines")(spark, sf)
    val plan = executedPlan(df)
    // owner table: partial_min before the exchange
    assert(plan.contains("partial_min"),
      s"ownership min must combine map-side:\n$plan")
    // the ownership exchange carries (line_hash, occ_key) only — no
    // raw line text: every Exchange holding `line` also holds `idx`
    // (the occurrence side used for reassembly), never the bare
    // owner-side rows
    assert(!plan.toLowerCase.contains("cartesianproduct"))
  }

  test("line-rule filter is one shuffle-free map over the scan (the " +
      "scan-side projection codegen'd; the higher-order lambdas are " +
      "the one legitimate codegen break)") {
    val df = SparkEntry.queries("text_line_filter")(spark, sf)
    val plan = executedPlan(df)
    assert(!plan.contains("Exchange"),
      s"filterLines must not shuffle:\n$plan")
    assert(plan.contains("*(1)"),
      s"the scan stage must be codegen'd:\n$plan")
  }

  test("script profile is one shuffle-free codegen'd map stage") {
    val df = SparkEntry.queries("text_scripts")(spark, sf)
    val plan = executedPlan(df)
    assert(!plan.contains("Exchange"),
      s"scriptProfile must not shuffle:\n$plan")
    assert(plan.contains("*(1)"),
      s"scriptProfile must stay inside codegen:\n$plan")
  }

  test("url canonicalization: the group-size table joins back without " +
      "a cartesian; canonicalization itself adds no exchange beyond " +
      "the count") {
    val df = SparkEntry.queries("url_canonicalize")(spark, sf)
    val plan = executedPlan(df)
    assert(!plan.toLowerCase.contains("cartesianproduct"),
      s"no cartesian in the group join:\n$plan")
    // exactly one aggregation chain feeds the join: partial + final
    assert(plan.contains("partial_count"),
      s"group sizes must combine map-side:\n$plan")
  }

  test("cluster topics: cluster-size table broadcasts; the corpus is " +
      "tokenized exactly once (one explode/generate in the plan)") {
    val df = SparkEntry.queries("cluster_topics")(spark, sf)
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"marginal tables must broadcast:\n$plan")
    val generates = "(?i)generate".r.findAllIn(plan).length
    assert(generates <= 2,
      s"expected a single tokenize explode (± its reuse), got " +
        s"$generates in:\n$plan")
  }

  test("matched sample: the quota table joins back as a BROADCAST; " +
      "selection never plans a single-partition global window") {
    val df = SparkEntry.queries("sample_matched")(spark, sf)
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"quota join must broadcast:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"no global one-reducer stage in the selector:\n$plan")
  }

  test("interval join is a hash equi-join on (key, bucket) — no " +
      "cartesian, no sort-merge over bare keys, exactly-once without " +
      "a distinct/dedup exchange") {
    val df = SparkEntry.queries("interval_join")(spark, sf)
    val plan = executedPlan(df)
    assert(!plan.toLowerCase.contains("cartesianproduct"),
      s"grid join must stay an equi-join:\n$plan")
    assert(!plan.contains("HashAggregate(keys=[lid") &&
      !plan.toLowerCase.contains("distinct"),
      s"exactly-once must come from bucket ownership, not dedup:\n$plan")
  }

  test("bloom semi-join: the probe filter runs on the FACT SCAN side, " +
      "below the semi-join's exchange — rows are rejected before they " +
      "are shuffled") {
    val df = SparkEntry.queries("bloom_semijoin")(spark, sf)
    val plan = executedPlan(df)
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0, s"expected a semi-join:\n$plan")
    // the UDF probe must appear in the plan BELOW the join operator
    // (plan text is top-down: deeper operators print later)
    val filterIdx = plan.indexOf("UDF")
    assert(filterIdx > joinIdx,
      s"bloom probe must sit under the join, at the scan:\n$plan")
    assert(plan.contains("LeftSemi"), s"exact finish is a semi-join:\n$plan")
  }

  test("vocab coverage: the vocabulary joins back as a BROADCAST; the " +
      "corpus is tokenized exactly once; counts combine map-side") {
    val df = SparkEntry.queries("tok_coverage")(spark, sf)
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab join must broadcast:\n$plan")
    val generates = "(?i)generate".r.findAllIn(plan).length
    assert(generates <= 1,
      s"corpus must be tokenized once, got $generates explodes:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"token counts must combine map-side:\n$plan")
  }

  test("split leakage: the content hash is computed BELOW the " +
      "exchange — raw text never rides the ownership shuffle") {
    val df = SparkEntry.queries("split_leakage")(spark, sf)
    val plan = executedPlan(df)
    assert(plan.contains("partial_count"),
      s"leak counts must combine map-side:\n$plan")
    // the exchange output column set carries the md5, not `text`
    val exchange = plan.linesIterator
      .find(_.contains("Exchange hashpartitioning")).getOrElse("")
    assert(!exchange.contains("text"),
      s"raw text must not be a shuffle key:\n$exchange")
  }

  test("z-order value is one shuffle-free codegen'd map stage (pure " +
      "bit math, no UDF)") {
    val df = SparkEntry.queries("zorder_value")(spark, sf)
    val plan = executedPlan(df)
    assert(!plan.contains("Exchange"),
      s"morton code must not shuffle:\n$plan")
    assert(!plan.contains("UDF"), s"bit math must be native:\n$plan")
    assert(plan.contains("*(1)"),
      s"the interleave must stay inside codegen:\n$plan")
  }

  test("DSIR weights: the bucket model joins back as a BROADCAST; " +
      "bucket counts combine map-side; no corpus-sized window") {
    val df = SparkEntry.queries("sample_dsir")(spark, sf)
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"the B-row log-ratio model must broadcast:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"(id, bucket) counts must combine map-side:\n$plan")
  }

  test("indexed multi-query BM25: query terms semi-join the postings; " +
      "df stats and the query table broadcast back") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val idx = graft.pipeline.Retrieval.buildBm25Acc(docs,
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text")).index
    import spark.implicits._
    val q = Seq((1L, "spark"), (2L, "hash")).toDF("query_id", "token")
    val plan = executedPlan(
      graft.pipeline.Retrieval.bm25ScoresIndexedForQueries(idx, q))
    assert(plan.contains("BroadcastHashJoin"),
      s"df/query joins must broadcast:\n$plan")
    assert(plan.contains("LeftSemi"),
      s"the term filter must be a semi-join on the postings:\n$plan")
  }

  test("RRF fusion: rank lists aggregate map-side; fused top-k is a " +
      "two-phase window, never a single global partition") {
    val df = SparkEntry.queries("retrieval_fusion")(spark, sf)
    val plan = executedPlan(df)
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"rrf sums must combine map-side:\n$plan")
    // the two-phase top-k salts phase 1 by partition id — no window
    // may run with an EMPTY partition spec (a single global partition)
    val emptyPartWindow = plan.linesIterator.exists(l =>
      l.contains("Window [") && l.contains("], [], ["))
    assert(!emptyPartWindow,
      s"no window may use a single global partition:\n$plan")
  }

  test("containment prefix: candidates shuffle on the shingle hash; " +
      "the per-doc rarity window partitions by doc id") {
    val df = SparkEntry.queries("dedup_containment")(spark, sf)
    val plan = executedPlan(df)
    assert(plan.contains("partial_count"),
      s"pair/df counts must combine map-side:\n$plan")
    assert("(?i)cartesian".r.findFirstIn(plan).isEmpty,
      s"containment must never plan a cartesian product:\n$plan")
  }

  test("any-anchor funnel: ONE key-hash exchange and ONE sort feed all " +
      "k window passes AND the final key aggregation") {
    val df = SparkEntry.queries("events_funnel_anyanchor")(spark, sf)
    val plan = executedPlan(df)
    assert("(?i)cartesian".r.findFirstIn(plan).isEmpty, plan)
    // the k chained MAX windows share one partitioning+ordering, and
    // the final groupBy reuses the same key partitioning — a second
    // hash exchange or a second per-key sort means the recurrence
    // degenerated to one shuffle per step
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges == 1,
      s"expected exactly 1 key-hash exchange, got $exchanges in:\n$plan")
    val sorts = "\\bSort \\[".r.findAllIn(plan).size
    assert(sorts == 1,
      s"expected exactly 1 per-key sort, got $sorts in:\n$plan")
  }

  test("IVF-PQ search: probed-cell join and query join are BROADCASTs; " +
      "no cartesian anywhere in the composed plan") {
    val c = org.apache.spark.sql.functions.col _
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(c("vec_id"), c("embedding"))
    val ivfModel = graft.pipeline.Ann.trainIvf(emb, nCells = 4)
    val pqModel = graft.pipeline.Ann.trainPq(emb, m = 8, ksub = 16)
    val df = graft.pipeline.Ann.ivfPqTopK(emb,
      emb.where(c("vec_id") < 3), k = 5, ivfModel, pqModel,
      nprobe = 2, rerank = 4)
    val plan = executedPlan(df)
    assert("(?i)cartesian".r.findFirstIn(plan).isEmpty, plan)
    assert(plan.contains("BroadcastHashJoin"),
      s"query-side joins must broadcast (corpus never shuffles on " +
        s"query keys):\n$plan")
  }
}
