package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Package-level CLI entry point — the analogue of the reference's
  * `janus` binary (`/root/reference/src/main.rs`): package help pointing
  * at the operational entry points, plus the internal storage benchmark
  * (`benchmark-storage-rdf`). The operational surfaces remain
  * [[graft.http.HttpApiServer]] (REST/SSE/WS API), ReplayBus ingestion,
  * and the `graft.Verify` / `graft.Bench` mains.
  */
object Main {

  val Overview: String =
    """graft package entry point
      |
      |Primary entry points:
      |  serve <storageDir> [port]   REST + SSE + WebSocket API over a
      |                              quad log, one port for all three
      |  replay <file> <storageDir>  N-Quads replay and ingestion
      |  graft.Verify <sf> <out>     correctness dump (driver contract)
      |  graft.Bench                 benchmark main (SPARK_GRAFT_SF_DIR)
      |
      |Pipeline subcommands:
      |  curate <docs.parquet> <outDir> [minQuality] [sampleRate]
      |                              clean -> dedup -> quality-filter ->
      |                              sample a document corpus
      |
      |Benchmark subcommands:
      |  benchmark-storage-rdf [n]   quad-log write/read benchmark
      |""".stripMargin

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(2, Runtime.getRuntime.availableProcessors()).toString)
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Dispatch; returns a process exit code (testable without exiting). */
  def run(args: Array[String], out: String => Unit = println): Int =
    args.toList match {
      case Nil | ("info" :: _) | ("help" :: _) | ("--help" :: _) =>
        out(Overview)
        0
      case "benchmark-storage-rdf" :: rest =>
        rest.headOption.map(a => scala.util.Try(a.toLong).toOption) match {
          case Some(None) =>
            out(Overview)
            out(s"invalid count: ${rest.head}")
            2
          case parsed =>
            benchmarkStorageRdf(session(), parsed.flatten.getOrElse(1000000L),
              out)
            0
        }
      case "replay" :: file :: storageDir :: Nil =>
        val spark = session()
        val log = new graft.storage.EventLog(spark, storageDir)
        val (stored, errors) =
          graft.storage.ReplayBus.ingestFile(spark, file, log)
        out(s"replay complete: stored=$stored parse_errors=$errors")
        0
      case "serve" :: storageDir :: rest
          if rest.headOption.forall(a => scala.util.Try(a.toInt).isSuccess) =>
        val port = rest.headOption.map(_.toInt).getOrElse(8080)
        val spark = session()
        val registry = new graft.api.QueryRegistry()
        val log = new graft.storage.EventLog(spark, storageDir)
        val api = new graft.api.JanusApi(spark, registry, _ => log.read())
        // REST server on an ephemeral port; the gateway fronts it on
        // the public port so WS upgrades, SSE, and REST share one
        // address like the reference's single server (`server.rs:273`)
        val restServer = new graft.http.HttpApiServer(api, registry, 0,
          bindHost = Some("127.0.0.1"))
        restServer.start()
        val gateway = new graft.http.HttpGateway(restServer, port)
        gateway.start()
        out(s"serving REST/SSE/WS on port ${gateway.boundPort}")
        Thread.currentThread().join() // serve until killed
        0
      case "curate" :: docs :: outDir :: rest if rest.length <= 2 &&
          rest.forall(a => scala.util.Try(a.toDouble).isSuccess) =>
        val minQuality = rest.headOption.map(_.toDouble).getOrElse(0.7)
        val sampleRate = rest.drop(1).headOption.map(_.toDouble).getOrElse(1.0)
        val (inDocs, outDocs) =
          curate(session(), docs, outDir, minQuality, sampleRate)
        out(s"curate complete: in=$inDocs out=$outDocs -> $outDir")
        0
      case other =>
        out(Overview)
        out(s"unknown command: ${other.mkString(" ")}")
        2
    }

  /** One-command corpus curation: NFC/whitespace cleanup → exact dedup
    * (keep the smallest doc_id per normalized content hash) → quality
    * gate → deterministic hash sample → parquet. The same declarative
    * chain as the `pipeline_e2e` driver entry — a handful of scans and
    * one join, no materialization barriers between stages. */
  def curate(spark: SparkSession, docsPath: String, outDir: String,
      minQuality: Double, sampleRate: Double): (Long, Long) = {
    import graft.pipeline.{Sampling, TextAnalysis}
    val docs = spark.read.parquet(docsPath)
    val cleaned = docs.withColumn("text",
      TextAnalysis.cleanText(col("text")))
    val withH = cleaned.withColumn("__h", md5(col("text")))
    val keepers = withH.groupBy(col("__h"))
      .agg(min(col("doc_id")).as("doc_id"))
    val deduped = withH.join(keepers, Seq("__h", "doc_id")).drop("__h")
    val gated = deduped.where(
      TextAnalysis.qualityScore(col("text")) >= minQuality)
    val sampled =
      if (sampleRate >= 1.0) gated
      else Sampling.sampleByKey(gated, col("doc_id"), sampleRate)
    sampled.write.mode("overwrite").parquet(outDir)
    (docs.count(), spark.read.parquet(outDir).count())
  }

  /** The reference's RDF storage benchmark shape
    * (`main.rs:benchmark_segmented_storage_rdf`): n synthetic quads with
    * its subject/predicate/object mod-patterns, bulk-written to the quad
    * log, then time-range reads at increasing sizes. */
  def benchmarkStorageRdf(spark: SparkSession, n: Long,
      out: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-bench-rdf")
      .resolve("log").toString
    val log = new graft.storage.EventLog(spark, dir)
    val base = 1700000000000L
    val quads = spark.range(n).select(
      (col("id") + base).as("timestamp"),
      concat(lit("http://example.org/person/person_"), col("id") % 10000)
        .as("subject"),
      when(col("id") % 10 <= 3, "http://example.org/knows")
        .when(col("id") % 10 <= 6, "http://example.org/worksAt")
        .when(col("id") % 10 <= 8, "http://example.org/livesIn")
        .otherwise("http://example.org/hasAge").as("predicate"),
      when(col("id") % 10 <= 3,
        concat(lit("http://example.org/person/person_"),
          (col("id") + 1) % 10000))
        .when(col("id") % 10 <= 6,
          concat(lit("http://example.org/organization/org_"),
            col("id") % 1000))
        .when(col("id") % 10 <= 8,
          concat(lit("http://example.org/location/city_"), col("id") % 100))
        .otherwise(concat(lit("\""), col("id") % 60 + 20, lit("\"")))
        .as("object"),
      concat(lit("http://example.org/graph/graph_"), col("id") % 100)
        .as("graph"))
    val t0 = System.nanoTime()
    log.appendBulk(quads, parallelism =
      spark.sparkContext.defaultParallelism)
    val writeSec = (System.nanoTime() - t0) / 1e9
    out(f"write: $n quads in $writeSec%.2f s (${n / writeSec}%.0f quads/s)")
    Seq(100L, 1000L, 10000L, 100000L, n).filter(_ <= n).foreach { size =>
      val t1 = System.nanoTime()
      val rows = log.query(base, base + size - 1).count()
      val sec = (System.nanoTime() - t1) / 1e9
      out(f"read[$size%7d]: $rows rows in $sec%.3f s")
    }
  }

  def main(args: Array[String]): Unit = {
    val code = run(args)
    if (code != 0) sys.exit(code)
  }
}
