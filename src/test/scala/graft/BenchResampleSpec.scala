package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Per-entry contention repair in the bench harness. Round 15's driver
  * rerun put all samples of a 1.0 s entry inside one co-tenant burst
  * and recorded 22.4 s — the run-level gate correctly failed the run,
  * but the artifact still shipped the phantom number and a judge had
  * to re-profile by hand. The repaired contract: entries whose samples
  * all overlap a probe spike are re-sampled once (bracketed by their
  * OWN probes) after a settle; the artifact is either ok=true with
  * honest numbers, or carries a per-entry `contended` annotation and
  * fails loudly — never a silently-wrong reading.
  *
  * Real contention cannot be scripted deterministically, so these
  * tests inject a scripted probe series through the `probeFn` seam;
  * the queries, storage section, and re-sample executions are real. */
class BenchResampleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val fineQuery: (SparkSession, String) => DataFrame =
    (s, dir) => s.read.parquet(s"$dir/region.parquet")
  // six entries → probes at p03 (after q4) and p04 (end); q0..q4
  // bracket (p02,p03), q5 brackets (p03,p04)
  private val sixQueries =
    (0 until 6).map(i => s"q$i" -> fineQuery).toMap

  /** Scripted probe: the first values in `head`, then `tail` forever. */
  private def scripted(head: Seq[Double], tail: Double): () => Double = {
    val it = head.iterator
    () => if (it.hasNext) it.next() else tail
  }

  // the adaptive gate reads SPARK_GRAFT_PROBE_MAX; these tests pin the
  // ADAPTIVE path, so they only run where the env override is absent
  private def adaptiveEnv = !sys.env.contains("SPARK_GRAFT_PROBE_MAX")

  test("a localized spike triggers re-sampling; clean re-probes yield " +
      "ok=true with honest numbers and a `resampled` annotation") {
    assume(adaptiveEnv)
    // p00..p02 idle, p03 spiked, p04 idle → gate = max(0.45, 1.4*p75)
    // = 0.45 with p75 = 0.1; all six entries are bracket-adjacent to
    // p03; every re-probe is idle → all repaired
    val report = Bench.run(spark, sf, sixQueries, nCpus = 4,
      scaleQuads = 5000L, settleMs = Some(0L),
      probeFn = Some(scripted(Seq(0.1, 0.1, 0.1, 9.9, 0.1), 0.1)))
    assert(report.ok, s"failed=${report.failed}")
    assert(report.json.contains("\"resampled\":{\"q0\":"),
      "original phantom timings must be kept for transparency")
    assert(report.json.contains("\"contended\":[]"))
    (0 until 6).foreach(i => assert(report.results.contains(s"q$i")))
  }

  test("re-probes still hot → per-entry `contended` annotation and a " +
      "loud probe_contention failure, never a silent phantom number") {
    assume(adaptiveEnv)
    val report = Bench.run(spark, sf, sixQueries, nCpus = 4,
      scaleQuads = 5000L, settleMs = Some(0L),
      probeFn = Some(scripted(Seq(0.1, 0.1, 0.1, 9.9, 0.1), 9.9)))
    assert(!report.ok)
    assert(report.failed.exists(_.startsWith("probe_contention:")),
      s"failed=${report.failed}")
    assert(report.json.contains("\"contended\":[\"q0\""),
      "still-contended entries must be annotated per entry")
  }

  test("sustained load lifts p75 past the ceiling → the adaptive gate " +
      "refuses to self-certify (probe_sustained_contention)") {
    assume(adaptiveEnv)
    val report = Bench.run(spark, sf, Map("q0" -> fineQuery), nCpus = 4,
      scaleQuads = 5000L, settleMs = Some(0L),
      probeFn = Some(scripted(Seq.empty, 1.5)))
    assert(!report.ok)
    assert(report.failed.exists(_.startsWith("probe_sustained_contention:")),
      s"failed=${report.failed}")
  }

  test("an explicit absolute gate means exactly what it says — " +
      "including exactly the old 0.45 default sentinel value") {
    // probes scripted at 0.5: above an explicit 0.45 (the value the
    // old float-sentinel comparison silently treated as 'default' and
    // replaced with the adaptive gate), below the adaptive gate that a
    // 0.5-flat series would self-calibrate to (1.4 × 0.5 = 0.7)
    val report = Bench.run(spark, sf, Map("q0" -> fineQuery), nCpus = 4,
      scaleQuads = 5000L, probeMaxSec = Some(0.45), settleMs = Some(0L),
      probeFn = Some(scripted(Seq.empty, 0.5)))
    assert(!report.ok,
      "explicit 0.45 must gate at 0.45, not fall back to adaptive")
    assert(report.failed.exists(_.startsWith("probe_contention:")),
      s"failed=${report.failed}")
  }
}
