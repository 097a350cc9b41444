package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{CloudOptimize, Tables}

/** Multi-dimensional data layout — Z-order (Morton) clustering, the
  * storage-side answer to "queries filter on BOTH price and size but a
  * file sort can only serve one of them". Interleaving the bits of two
  * bucketized keys produces a single sort key whose contiguous ranges
  * are small axis-aligned boxes, so after `repartitionByRange(morton) +
  * sortWithinPartitions(morton)` every parquet file's min/max footer
  * stats are tight on BOTH dimensions and a 2-D box predicate prunes to
  * a handful of files. At 100 TB this is the difference between a
  * two-column filter scanning the whole table and scanning ~1/files of
  * it — the same contract Delta/Iceberg `OPTIMIZE ZORDER BY` sells,
  * expressed here as plain Spark.
  *
  * The interleave is pure integer arithmetic (div/mod by powers of two),
  * generated ONCE as a SQL string and spliced into both the Spark plan
  * (`expr`, Spark `div`) and the DuckDB oracle (`//`) — bit-identical by
  * construction, codegen'd scan-side, no UDF.
  */
object Layout {

  /** Bits per dimension (4 → a 16×16 grid, 256 cells). */
  val ZBits = 4

  /** The Morton interleave of two pre-bucketized coordinates in
    * [0, 2^bits) as a SQL expression string: x occupies even bits, y odd
    * bits. `divOp` is the integer-division spelling (`div` on Spark,
    * `//` on DuckDB) — the ONE definition both engines evaluate.
    */
  def mortonSql(x: String, y: String, bits: Int, divOp: String): String =
    (0 until bits).map { i =>
      s"(($x $divOp ${1L << i}) % 2) * ${1L << (2 * i)}" +
        s" + (($y $divOp ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  /** Spark Column form of [[mortonSql]] over two long columns already in
    * [0, 2^bits).
    */
  def morton(x: String, y: String, bits: Int = ZBits): Column =
    expr(mortonSql(x, y, bits, "div"))

  /** Fixed-origin bucketization of the part table's two query dimensions
    * onto the 16×16 grid: `x` from retail price in integer cents,
    * `y` from size. `v*k div span` keeps everything in exact int64 (the
    * deciles trick) and `least` clamps the top edge. Documented data
    * bounds, not computed ones: a layout key must be stable as new data
    * arrives, or files written last week sort differently from today's.
    */
  val XOriginCents = 90000L
  val XSpanCents = 10000L
  val YOriginSize = 1L
  val YSpanSize = 50L

  private def grid(v: String, origin: Long, span: Long): String =
    s"least(${(1L << ZBits) - 1}, (($v - $origin) * ${1L << ZBits}) $divSpark $span)"
  private val divSpark = "div"

  /** Z-order layout audit: every part mapped to its Morton cell, then
    * per-cell counts and per-dimension bounds — the report that shows
    * each contiguous Morton range covers a tight 2-D box (the property
    * file-level pruning relies on). One scan-side projection + one
    * map-side-combined aggregate over ≤256 cells.
    */
  def qZorderLayout(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.part(s, dir)
      .select(col("p_partkey"), col("p_size"),
        round(col("p_retailprice") * 100).cast("long").as("cents"))
      .withColumn("x", expr(grid("cents", XOriginCents, XSpanCents)))
      .withColumn("y", expr(grid("p_size", YOriginSize, YSpanSize)))
      .withColumn("z", morton("x", "y"))
    cells.groupBy(col("z"))
      .agg(count(lit(1)).as("n_parts"),
        min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"),
        min(col("p_size")).as("min_size"), max(col("p_size")).as("max_size"))
      .orderBy(col("z"))
  }

  val qZorderLayoutOracle: String = {
    def gridSql(v: String, origin: Long, span: Long): String =
      s"least(${(1L << ZBits) - 1}, (($v - $origin) * ${1L << ZBits}) // $span)"
    s"""WITH p AS (
       |  SELECT p_partkey, p_size, CAST(round(p_retailprice * 100) AS BIGINT) AS cents
       |  FROM part
       |), g AS (
       |  SELECT p_partkey, p_size, cents,
       |    ${gridSql("cents", XOriginCents, XSpanCents)} AS x,
       |    ${gridSql("CAST(p_size AS BIGINT)", YOriginSize, YSpanSize)} AS y
       |  FROM p
       |)
       |SELECT ${mortonSql("x", "y", ZBits, "//")} AS z,
       |  count(*) AS n_parts,
       |  min(cents) AS min_cents, max(cents) AS max_cents,
       |  min(p_size) AS min_size, max(p_size) AS max_size
       |FROM g
       |GROUP BY z
       |ORDER BY z""".stripMargin
  }

  /** Z-order clustered write: append the Morton key over the two given
    * pre-bucketized grid columns and delegate to [[CloudOptimize.write]]
    * with the Morton key as the sort contract — range-shuffled (skew
    * splits at key boundaries), internally sorted, size-capped files
    * whose footer stats are tight on both source dimensions.
    */
  def writeZOrdered(
      df: DataFrame,
      outPath: String,
      xCol: String,
      yCol: String,
      numPartitions: Option[Int] = None,
      maxRecordsPerFile: Long = 1000000L): Unit = {
    val keyed = df.withColumn("z_key", morton(xCol, yCol))
    CloudOptimize.write(keyed, outPath, partitionCols = Nil,
      sortCols = Seq("z_key"), maxRecordsPerFile = maxRecordsPerFile,
      numPartitions = numPartitions)
  }
}
