package graft.storage

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — multi-dimensional data skipping
  * for the 100 TB scan.
  *
  * A layout sorted on ONE column prunes range predicates on that column
  * only; a box query that is selective in BOTH dimensions still reads
  * every file for the second predicate. Interleaving the bits of the
  * two dimensions into one sort key makes file-level min/max ranges
  * tight in BOTH dimensions at once, so a two-sided box query skips
  * most files — the same mechanism behind Delta/Iceberg `OPTIMIZE
  * ZORDER BY` and the row-group statistics pruning Parquet already
  * does, lifted to the file-clustering decision graft controls at
  * write time. [[ZOrderSpec]] measures the effect on the events table:
  * a user×time box prunes strictly more z-clustered files than
  * time-sorted files.
  *
  * The z-value itself is pure integer bit math (no UDF, fully
  * codegen'd, engine-portable — the `zorder_value` oracle replays the
  * identical formula in SQL).
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative longs into one
    * Morton code: bit i of `a` lands at position 2i+1, bit i of `b` at
    * 2i, so the code orders by (a, b) locality. Out-of-range inputs
    * raise (codegen'd `raise_error`) — silently masking high bits would
    * corrupt the clustering, not just slow it. `2·bits ≤ 62` keeps the
    * code in a positive long. */
  def zValue2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")
    val lim = 1L << bits
    def checked(c: Column, name: String): Column =
      when(c.isNull || c < 0 || c >= lim,
        raise_error(concat(lit(s"zValue2: $name outside [0, $lim): "),
          c.cast("string")))).otherwise(c.cast("long"))
    val av = checked(a, "a")
    val bv = checked(b, "b")
    (0 until bits).map { i =>
      shiftleft(shiftright(av, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(bv, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** The same interleave as ANSI SQL text over two expressions — the
    * oracle/portability half of [[zValue2]] (DuckDB `&`/`|`/`<<`/`>>`
    * semantics match Spark's for non-negative longs). */
  def zValue2Sql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((((($a) >> $i) & 1) << ${2 * i + 1}) | (((($b) >> $i) & 1) << ${2 * i}))"
    }.mkString("(", " | ", ")")

  /** Write `df` z-clustered on (a, b) into `nFiles` parquet files:
    * range-partition by the z-value (one shuffle, same cost class as
    * any sort-based write) and sort within each file so Parquet
    * row-group stats are tight too. The z column itself is dropped —
    * clustering is a LAYOUT property, not schema. */
  def clusterWrite(df: DataFrame, a: Column, b: Column, path: String,
      nFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue2(a, b, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Per-file min/max envelope of two columns — the file-skipping
    * metadata a reader consults. One scan, aggregated by
    * `input_file_name`; at scale this is exactly the stats a catalog
    * (or the Parquet footers) would serve without the scan. */
  def fileMinMax(spark: SparkSession, path: String,
      aCol: String, bCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(aCol)).as("a_min"), max(col(aCol)).as("a_max"),
        min(col(bCol)).as("b_min"), max(col(bCol)).as("b_max"))

  /** How many files a box query `[aLo,aHi] × [bLo,bHi]` must read under
    * the layout at `path` — the skip-effectiveness metric
    * [[ZOrderSpec]] compares across layouts. */
  def candidateFiles(spark: SparkSession, path: String,
      aCol: String, bCol: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long): Long =
    fileMinMax(spark, path, aCol, bCol)
      .where(col("a_max") >= aLo && col("a_min") <= aHi &&
        col("b_max") >= bLo && col("b_min") <= bHi)
      .count()
}
