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
