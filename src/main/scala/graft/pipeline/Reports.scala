package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Standing corpus reports — CUBE dashboards maintained incrementally.
  *
  * A full `CUBE(dims)` over 100 TB is affordable exactly once; the
  * standing form keeps the cube ADDITIVE by materializing only
  * algebraic partials (counts and sums — averages derive at read
  * time), so each new batch folds in with one tiny aggregation over
  * `|cube rows of the batch| + |standing cube|` rows instead of a
  * corpus rescan. The fold law is exact: integer adds are associative,
  * so any batch split reproduces the one-shot cube bit-for-bit
  * ([[ReportsSpec]] and the `corpus_cube_incremental` gate entry prove
  * it against the one-shot CUBE).
  *
  * Dimension values must be non-null (enforced fail-loud): CUBE's
  * rollup marker IS null, so a null data value would alias its own
  * rollup row and folding would double-count it.
  */
object Reports {

  /** One batch → its additive cube: `(dims*, n, sum_<measure>)` with
    * nulls marking rollup levels. */
  def cubePartial(df: DataFrame, dims: Seq[Column], measure: Column)
      : DataFrame = {
    val guarded = dims.zipWithIndex.map { case (d, i) =>
      when(d.isNull, raise_error(lit(
        s"cubePartial: null dimension value (position $i) would alias " +
          "the rollup marker"))).otherwise(d).as(s"d$i")
    }
    df.select(guarded :+ measure.cast("long").as("__m"): _*)
      .cube(guarded.indices.map(i => col(s"d$i")): _*)
      .agg(count(lit(1)).as("n"), sum(col("__m")).as("sum_m"))
  }

  /** Fold any number of cube partials into one standing cube — one
    * aggregation over the UNION of the (small) cube tables; grouping
    * keys align because every partial used the same dims, and the
    * rollup null is a real groupBy key. */
  def foldCubes(cubes: Seq[DataFrame]): DataFrame = {
    require(cubes.nonEmpty, "nothing to fold")
    val dims = cubes.head.columns.takeWhile(_.startsWith("d"))
    cubes.reduce(_ unionByName _)
      .groupBy(dims.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_m")).as("sum_m"))
  }

  /** Read-time view of a standing cube: derive the average from the
    * additive partials. */
  def withAvg(cube: DataFrame, decimals: Int = 6): DataFrame =
    cube.withColumn("avg_m",
      round(col("sum_m").cast("double") / col("n").cast("double"),
        decimals))
}
