package graft

import org.scalatest.funsuite.AnyFunSuite

/** CLI entry-point surface, porting the reference's janus_cli_test.rs
  * semantics: package-level help lists the primary entry points and the
  * storage benchmark subcommand; the default invocation points at the
  * operational surfaces. */
class MainSpec extends AnyFunSuite {

  private def captured(args: Array[String]): (Int, String) = {
    val sb = new StringBuilder
    val code = Main.run(args, s => sb.append(s).append('\n'))
    (code, sb.toString)
  }

  test("help lists primary entry points and benchmark subcommand") {
    val (code, out) = captured(Array("--help"))
    assert(code === 0)
    assert(out.contains("serve"))
    assert(out.contains("replay"))
    assert(out.contains("graft.Verify"))
    assert(out.contains("graft.Bench"))
    assert(out.contains("benchmark-storage-rdf"))
  }

  test("default invocation prints the overview and succeeds") {
    val (code, out) = captured(Array.empty)
    assert(code === 0)
    assert(out.contains("graft package entry point"))
  }

  test("unknown command prints usage and fails") {
    val (code, out) = captured(Array("frobnicate"))
    assert(code === 2)
    assert(out.contains("unknown command: frobnicate"))
    assert(out.contains("graft package entry point"))
  }

  test("malformed numeric arguments fail with usage, not a stack trace") {
    val (code, out) = captured(Array("benchmark-storage-rdf", "abc"))
    assert(code === 2)
    assert(out.contains("invalid count: abc"))
    val (code2, out2) = captured(Array("serve", "/tmp/x", "notaport"))
    assert(code2 === 2)
    assert(out2.contains("unknown command"))
  }

  test("curate subcommand cleans, dedups, gates, and writes parquet") {
    val spark = TestSpark.spark
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("curate-in")
      .resolve("docs.parquet").toString
    val out = java.nio.file.Files.createTempDirectory("curate-out")
      .resolve("result").toString
    val prose = "a perfectly ordinary paragraph of reasonable prose " +
      "repeated to pass the length based quality gate " * 3
    Seq(
      (1L, prose),
      (2L, prose + " "),        // whitespace-only variant → deduped
      (3L, "x"),                // fails the quality gate
      (4L, prose + " distinct tail keeps this document alive"))
      .toDF("doc_id", "text").write.parquet(in)
    val (inN, outN) = Main.curate(spark, in, out,
      minQuality = 0.7, sampleRate = 1.0)
    assert(inN === 4L && outN === 2L)
    val kept = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 4L))
  }

  test("benchmark-storage-rdf runs the reference benchmark shape") {
    val sb = new StringBuilder
    Main.benchmarkStorageRdf(TestSpark.spark, n = 2000L,
      s => sb.append(s).append('\n'))
    val out = sb.toString
    assert(out.contains("write: 2000 quads"))
    assert(out.contains("read[   1000]: 1000 rows"))
    assert(out.contains("read[   2000]: 2000 rows"))
  }
}
