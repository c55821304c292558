package graft.comparator

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayDeque

/** Stateful live-vs-historical comparator (SURVEY.md §2.6) — rebuild of
  * `/root/reference/src/stream/comparator.rs:1-240`.
  *
  * [[WindowStats]]/[[StatefulComparator]] are the exact per-key streaming
  * core (bounded deque, population std-dev, least-squares slope, six
  * anomaly triggers). [[Comparator.stats]] is the distributed
  * formulation: the same statistics as window functions
  * (`avg`/`stddev_pop`/`regr_slope` over a count-bounded frame), which is
  * how the operator runs over a keyed table at scale.
  */
final case class DataPoint(timestamp: Double, value: Double)

final case class WindowStats(
    mean: Double, stdDev: Double, slope: Double, count: Int)

object WindowStats {
  private val Eps = 2.220446049250313e-16

  /** Mean, population σ, least-squares slope (`comparator.rs:20-57`). */
  def fromWindow(window: Seq[DataPoint]): Option[WindowStats] = {
    if (window.isEmpty) return None
    val n = window.length.toDouble
    val sumVal = window.map(_.value).sum
    val mean = sumVal / n
    val varianceSum = window.map(dp => math.pow(dp.value - mean, 2)).sum
    val stdDev = math.sqrt(varianceSum / n)
    val sumX = window.map(_.timestamp).sum
    val sumXY = window.map(dp => dp.timestamp * dp.value).sum
    val sumX2 = window.map(dp => dp.timestamp * dp.timestamp).sum
    val denominator = n * sumX2 - sumX * sumX
    val slope =
      if (math.abs(denominator) < Eps) 0.0
      else (n * sumXY - sumX * sumVal) / denominator
    Some(WindowStats(mean, stdDev, slope, window.length))
  }
}

/** Thresholds (`comparator.rs:62-91`, defaults mirrored). */
final case class ComparatorConfig(
    absThreshold: Double = 1.0,
    relThreshold: Double = 0.1,
    catchupTrigger: Double = 2.0,
    slopeEpsilon: Double = 0.01,
    volatilityBuffer: Double = 0.5,
    windowSize: Int = 10,
    outlierZThreshold: Double = 3.0)

sealed trait ComparisonResult extends Product with Serializable
object ComparisonResult {
  final case class AbsoluteThresholdExceeded(diff: Double) extends ComparisonResult
  final case class RelativeDropDetected(relChange: Double) extends ComparisonResult
  final case class CatchUpTriggered(lag: Double) extends ComparisonResult
  final case class TrendDivergence(liveSlope: Double, histSlope: Double)
      extends ComparisonResult
  final case class VolatilityIncrease(liveSigma: Double, histSigma: Double)
      extends ComparisonResult
  final case class LiveOutlierDetected(value: Double, zScore: Double)
      extends ComparisonResult
}

/** Per-key stateful comparator (`comparator.rs:140-236`): bounded live +
  * historical deques; each update emits any of the six triggers. */
final class StatefulComparator(
    config: ComparatorConfig = ComparatorConfig()) {
  import ComparisonResult._

  private val Eps = 2.220446049250313e-16
  private val liveHistory = ArrayDeque.empty[DataPoint]
  private val histHistory = ArrayDeque.empty[DataPoint]

  def updateAndCompare(timestamp: Double, liveVal: Double, histVal: Double)
      : Seq[ComparisonResult] = {
    addPoint(liveHistory, timestamp, liveVal)
    addPoint(histHistory, timestamp, histVal)
    (WindowStats.fromWindow(liveHistory.toSeq),
      WindowStats.fromWindow(histHistory.toSeq)) match {
      case (Some(live), Some(hist)) => compareStats(live, hist)
      case _                        => Nil
    }
  }

  private def addPoint(history: ArrayDeque[DataPoint], ts: Double,
      value: Double): Unit = {
    if (history.length >= config.windowSize) history.removeHead()
    history.append(DataPoint(ts, value))
  }

  private def compareStats(live: WindowStats, hist: WindowStats)
      : Seq[ComparisonResult] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[ComparisonResult]
    val absDiff = math.abs(live.mean - hist.mean)
    if (absDiff > config.absThreshold)
      out += AbsoluteThresholdExceeded(absDiff)
    if (math.abs(hist.mean) > Eps) {
      val relChange = (live.mean - hist.mean) / hist.mean
      if (relChange > config.relThreshold)
        out += RelativeDropDetected(relChange)
    }
    val lag = hist.mean - live.mean
    if (lag > config.catchupTrigger) out += CatchUpTriggered(lag)
    if (live.slope * hist.slope < 0.0 &&
        math.abs(live.slope) > config.slopeEpsilon &&
        math.abs(hist.slope) > config.slopeEpsilon)
      out += TrendDivergence(live.slope, hist.slope)
    if (live.stdDev > hist.stdDev + config.volatilityBuffer)
      out += VolatilityIncrease(live.stdDev, hist.stdDev)
    liveHistory.lastOption.foreach { latest =>
      if (hist.stdDev > Eps) {
        val z = (latest.value - hist.mean) / hist.stdDev
        if (math.abs(z) > config.outlierZThreshold)
          out += LiveOutlierDetected(latest.value, z)
      }
    }
    out.toSeq
  }
}

object Comparator {

  /** Distributed rolling statistics: for each row, mean / population σ /
    * least-squares slope over the last `windowSize` rows of its key
    * (ordered by `orderCols`). This is the scale path for §2.6 — one
    * shuffle on the key, then a bounded window frame per partition; no
    * state lives on the driver. */
  def stats(df: DataFrame, keyCol: Column, valueCol: Column, xCol: Column,
      orderCols: Seq[Column], windowSize: Int = 10): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
      .rowsBetween(-(windowSize - 1), 0)
    df.withColumn("mean", avg(valueCol).over(w))
      .withColumn("sigma", stddev_pop(valueCol).over(w))
      .withColumn("slope", coalesce(regr_slope(valueCol, xCol).over(w),
        lit(0.0)))
      .withColumn("n", count(valueCol).over(w))
  }

  /** Distributed batch form of the SIX comparator triggers
    * ([[StatefulComparator.updateAndCompare]], `comparator.rs:140-236`):
    * per row, rolling live/hist stats over the last `windowSize` rows
    * of its key, then exactly compareStats' conditions as boolean
    * columns `t_abs t_rel t_catchup t_trend t_vol t_outlier`. Same
    * math, same machine-epsilon guards — but one shuffle on the key and
    * bounded window frames instead of driver-side deques, so a billion
    * keys evaluate in parallel. */
  def triggers(df: DataFrame, keyCol: Column, liveCol: Column,
      histCol: Column, xCol: Column, orderCols: Seq[Column],
      config: ComparatorConfig = ComparatorConfig()): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
      .rowsBetween(-(config.windowSize - 1), 0)
    val Eps = 2.220446049250313e-16
    val lMean = avg(liveCol).over(w)
    val hMean = avg(histCol).over(w)
    val lSig = stddev_pop(liveCol).over(w)
    val hSig = stddev_pop(histCol).over(w)
    val lSlope = coalesce(regr_slope(liveCol, xCol).over(w), lit(0.0))
    val hSlope = coalesce(regr_slope(histCol, xCol).over(w), lit(0.0))
    df.withColumn("t_abs", abs(lMean - hMean) > config.absThreshold)
      .withColumn("t_rel", abs(hMean) > Eps &&
        (lMean - hMean) / hMean > config.relThreshold)
      .withColumn("t_catchup", (hMean - lMean) > config.catchupTrigger)
      .withColumn("t_trend", lSlope * hSlope < 0.0 &&
        abs(lSlope) > config.slopeEpsilon &&
        abs(hSlope) > config.slopeEpsilon)
      .withColumn("t_vol", lSig > hSig + config.volatilityBuffer)
      .withColumn("t_outlier", hSig > Eps &&
        abs((liveCol - hMean) / hSig) > config.outlierZThreshold)
  }
}
