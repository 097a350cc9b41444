package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over Array[Float]/Array[Double] columns via higher-order
  * functions — sequential left-fold accumulation in double precision, the
  * same evaluation order DuckDB's list functions use, which keeps the
  * similarity oracles bit-comparable (outputs are additionally rounded to
  * 4 decimals so last-bit drift can never flip a comparison).
  */
object VectorFns {

  /** Cast an Array[Float] embedding column to Array[Double]. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product: left fold over element-wise products. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm. */
  def normSq(v: Column): Column = dot(v, v)

  /** Cosine similarity given precomputed squared norms (computed as
    * dot/(sqrt(na)*sqrt(nb)) — mirror this exact expression shape in any
    * oracle).
    */
  def cosineWithNorms(dotAb: Column, normSqA: Column, normSqB: Column): Column =
    dotAb / (sqrt(normSqA) * sqrt(normSqB))

  /** Signed projection of v onto the deterministic integer-valued
    * hyperplane family used by LSH bucketing:
    * plane j has coefficient ((i*7 + j*13) mod 11) - 5 at dimension i.
    * Integer coefficients make the projections exactly reproducible in SQL.
    */
  def planeDot(v: Column, j: Int, dims: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(dims - 1)),
        i => element_at(v, i + 1) * ((i * 7 + lit(j * 13)) % 11 - 5).cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Random-hyperplane LSH bucket id from `planes` sign bits. */
  def lshBucket(v: Column, planes: Int, dims: Int): Column =
    (0 until planes)
      .map(j => when(planeDot(v, j, dims) > 0, lit(1L << j)).otherwise(0L))
      .reduce(_ + _)
}
