package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The fail-loud contract of the bench harness: a run where any section
  * or registered query throws must be machine-distinguishable from a
  * green run — `ok=false` in the JSON artifact and a nonzero exit from
  * `main`. Round 8's bench recorded rc=0 while ~76 queries threw
  * `ExtendedAnalysisException`, which silently voided the round's
  * evidence; this spec pins the fix. */
class BenchFailLoudSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val fineQuery: (SparkSession, String) => DataFrame =
    (s, dir) => s.read.parquet(s"$dir/region.parquet")

  test("a forced per-query failure yields ok=false (nonzero exit)") {
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("forced")
    val report = Bench.run(spark, sf,
      Map("zz_boom" -> boom, "aa_fine" -> fineQuery),
      nCpus = 4, scaleQuads = 5000L, probeMaxSec = Some(1e9))
    assert(!report.ok)
    assert(report.json.contains("\"ok\":false"))
    assert(report.failed.exists(_.startsWith("zz_boom:")))
    assert(report.results.contains("aa_fine"),
      "healthy queries still produce timings in a failing run")
  }

  test("a bogus sf dir fails the storage section AND every query " +
      "instead of recording a green total") {
    val report = Bench.run(spark, "/nonexistent/sfX",
      Map("q" -> fineQuery), nCpus = 4, scaleQuads = 5000L, probeMaxSec = Some(1e9))
    assert(!report.ok)
    assert(report.failed.exists(_.startsWith("storage:")))
    assert(report.failed.exists(_.startsWith("q:")))
  }

  test("a healthy run is ok=true and carries the contention-probe " +
      "series plus per-query medians") {
    val report = Bench.run(spark, sf, Map("aa_fine" -> fineQuery),
      nCpus = 4, scaleQuads = 5000L, probeMaxSec = Some(1e9))
    assert(report.ok, s"failed=${report.failed}")
    assert(report.json.contains("\"ok\":true"))
    assert(report.json.contains("\"probes\":{\"p00_start\":"))
    assert(report.json.contains("\"queries_median\":{\"aa_fine\":"))
    // every storage headline metric present
    Seq("storage_write", "storage_write_flat", "range_query_100pct",
      "point_query", "live_injection_50ev").foreach(k =>
      assert(report.results.contains(k), k))
  }

  test("a loaded machine is rejected: any contention probe above the " +
      "threshold flips ok=false even when every query succeeds") {
    // probes are strictly positive, so threshold 0 always trips —
    // simulating round 12's 0.73 s probe spike without needing to
    // actually load the machine
    val report = Bench.run(spark, sf, Map("aa_fine" -> fineQuery),
      nCpus = 4, scaleQuads = 5000L, probeMaxSec = Some(0.0))
    assert(!report.ok)
    assert(report.json.contains("\"ok\":false"))
    assert(report.failed.exists(_.startsWith("probe_contention:")),
      s"failed=${report.failed}")
    assert(report.results.contains("aa_fine"),
      "timings are still recorded in a rejected run")
  }

  test("compact summary line fits whole inside the driver's 2000-char " +
      "stdout tail, even when hundreds of queries fail") {
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("forced")
    val manyFailing = (1 to 300)
      .map(i => f"q$i%03d_a_rather_long_query_name" -> boom).toMap
    val report = Bench.run(spark, sf, manyFailing,
      nCpus = 4, scaleQuads = 5000L, probeMaxSec = Some(1e9))
    assert(!report.ok)
    assert(report.compactJson.startsWith("{\"metric\":\"total\""))
    assert(report.compactJson.contains("\"failed_n\":300"))
    // compact line + sbt's "[success] Total time..." trailer must both
    // fit in the 2000-char window with margin
    assert(report.compactJson.length < 1800,
      s"compact line too long: ${report.compactJson.length}")
  }
}
