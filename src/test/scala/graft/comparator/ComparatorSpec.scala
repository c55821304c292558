package graft.comparator

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ports `/root/reference/tests/comparator_test.rs` trigger-by-trigger,
  * plus a cross-check of the distributed window-function formulation
  * against the exact deque implementation. */
class ComparatorSpec extends AnyFunSuite {

  import ComparisonResult._

  test("WindowStats: mean, population std-dev, least-squares slope") {
    val pts = Seq(DataPoint(0, 2), DataPoint(1, 4), DataPoint(2, 6))
    val s = WindowStats.fromWindow(pts).get
    assert(s.mean === 4.0)
    assert(math.abs(s.stdDev - math.sqrt(8.0 / 3.0)) < 1e-12)
    assert(math.abs(s.slope - 2.0) < 1e-12)
    assert(s.count === 3)
    assert(WindowStats.fromWindow(Nil).isEmpty)
  }

  test("slope is 0 when all timestamps identical (zero denominator)") {
    val s = WindowStats.fromWindow(
      Seq(DataPoint(5, 1), DataPoint(5, 9))).get
    assert(s.slope === 0.0)
  }

  test("absolute threshold trigger") {
    val c = new StatefulComparator(ComparatorConfig(absThreshold = 1.0))
    val r = c.updateAndCompare(0, 10.0, 5.0)
    assert(r.exists {
      case AbsoluteThresholdExceeded(d) => math.abs(d - 5.0) < 1e-12
      case _ => false
    })
  }

  test("relative drop trigger (rel_change > threshold)") {
    val c = new StatefulComparator(ComparatorConfig(
      absThreshold = 1e9, relThreshold = 0.1))
    val r = c.updateAndCompare(0, 12.0, 10.0) // +20% > 10%
    assert(r.exists(_.isInstanceOf[RelativeDropDetected]))
  }

  test("catch-up trigger (hist - live > trigger)") {
    val c = new StatefulComparator(ComparatorConfig(
      absThreshold = 1e9, catchupTrigger = 2.0))
    val r = c.updateAndCompare(0, 5.0, 10.0)
    assert(r.exists { case CatchUpTriggered(lag) => lag === 5.0
      case _ => false })
  }

  test("trend divergence: opposite slopes beyond epsilon") {
    val c = new StatefulComparator(ComparatorConfig(
      absThreshold = 1e9, catchupTrigger = 1e9, slopeEpsilon = 0.01))
    // live rising, hist falling
    c.updateAndCompare(0, 1.0, 9.0)
    c.updateAndCompare(1, 2.0, 8.0)
    val r = c.updateAndCompare(2, 3.0, 7.0)
    assert(r.exists {
      case TrendDivergence(ls, hs) => ls > 0 && hs < 0
      case _ => false
    })
  }

  test("volatility increase: live sigma above hist sigma + buffer") {
    val c = new StatefulComparator(ComparatorConfig(
      absThreshold = 1e9, catchupTrigger = 1e9, volatilityBuffer = 0.5))
    c.updateAndCompare(0, 0.0, 5.0)
    val r = c.updateAndCompare(1, 10.0, 5.0) // live σ=5, hist σ=0
    assert(r.exists {
      case VolatilityIncrease(ls, hs) => ls > hs + 0.5
      case _ => false
    })
  }

  test("live outlier: |z| of latest live vs hist distribution") {
    val c = new StatefulComparator(ComparatorConfig(
      absThreshold = 1e9, catchupTrigger = 1e9, volatilityBuffer = 1e9,
      outlierZThreshold = 3.0))
    // build hist distribution mean≈5 σ≈1
    for (i <- 0 until 9)
      c.updateAndCompare(i.toDouble, 5.0, if (i % 2 == 0) 4.0 else 6.0)
    val r = c.updateAndCompare(9, 50.0, 5.0)
    assert(r.exists(_.isInstanceOf[LiveOutlierDetected]))
  }

  test("window is bounded: old points evicted at window_size") {
    val c = new StatefulComparator(ComparatorConfig(
      windowSize = 2, absThreshold = 0.5))
    c.updateAndCompare(0, 100.0, 100.0) // will be evicted
    c.updateAndCompare(1, 5.0, 5.0)
    val r = c.updateAndCompare(2, 5.0, 5.0)
    // live window = [5,5], hist window = [5,5] → no abs trigger
    assert(!r.exists(_.isInstanceOf[AbsoluteThresholdExceeded]))
  }

  test("distributed stats() matches StatefulComparator window stats") {
    val spark = TestSpark.spark
    import spark.implicits._
    val n = 25
    val data = (0 until n).map(i =>
      ("k1", i.toLong, 10.0 + 3.0 * i + (if (i % 3 == 0) 5.0 else -2.0)))
    val df = data.toDF("key", "ts", "value")
    val out = Comparator.stats(df, col("key"), col("value"),
      col("ts").cast("double"), Seq(col("ts")), windowSize = 10)
      .orderBy("ts").collect()

    // brute-force expected stats for the last row
    val lastWindow = data.takeRight(10).map { case (_, ts, v) =>
      DataPoint(ts.toDouble, v) }
    val expected = WindowStats.fromWindow(lastWindow).get
    val lastRow = out.last
    assert(math.abs(lastRow.getAs[Double]("mean") - expected.mean) < 1e-9)
    assert(math.abs(lastRow.getAs[Double]("sigma") - expected.stdDev) < 1e-9)
    assert(math.abs(lastRow.getAs[Double]("slope") - expected.slope) < 1e-9)
    assert(lastRow.getAs[Long]("n") === 10L)
  }
}
