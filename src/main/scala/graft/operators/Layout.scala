package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of two normalized key
  * columns so that range-partitioning + sorting by the combined key
  * co-locates rows that are close in BOTH dimensions — the standard
  * multi-dimensional clustering trick for parquet data skipping (each
  * file's min/max on each raw key stays tight, so point/range predicates
  * on either dimension prune files).
  *
  * Keys are first normalized to `bits`-wide cells by exact integer math
  * over the column's min/max (two scalar aggregates, broadcast as
  * literals), then interleaved by an unrolled shift/mask expression — pure
  * arithmetic, whole-stage-codegen'd, and generated from the same loop
  * that emits the oracle SQL so the two can never drift.
  */
object Layout {

  /** Normalized cell: (x - min) * 2^bits DIV (max - min + 1) — exact
    * integer math (Spark `DIV` = DuckDB `//`), all values non-negative.
    * Double division would silently lose bits past 2^53-sized keys.
    */
  def cell(x: String, mn: Long, mx: Long, bits: Int): Column =
    expr(s"CAST((($x - $mn) * ${1L << bits}) DIV ${mx - mn + 1L} AS BIGINT)")

  def cellSql(x: String, mn: Long, mx: Long, bits: Int): String =
    s"(($x - $mn) * ${1L << bits}) // ${mx - mn + 1L}"

  /** Same cell math with the bounds as SQL references (e.g. a bounds CTE's
    * columns) instead of driver-computed literals.
    */
  def cellSqlRef(x: String, mnSql: String, mxSql: String, bits: Int): String =
    s"(($x - $mnSql) * ${1L << bits}) // ($mxSql - $mnSql + 1)"

  /** Morton interleave of two `bits`-wide cells: x in even positions, y in
    * odd. Unrolled: OR over i of ((x>>i)&1)<<2i | ((y>>i)&1)<<(2i+1).
    */
  def morton(px: Column, py: Column, bits: Int): Column =
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(px, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(py, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)

  def mortonSql(px: String, py: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(((($px >> $i) & 1) << ${2 * i}) | (((($py >> $i) & 1)) << ${2 * i + 1}))"
    }.mkString("(", " | ", ")")

  /** Attach the z-key for (xCol, yCol) given driver-computed key bounds. */
  def zkey(df: DataFrame, xCol: String, yCol: String,
           xMin: Long, xMax: Long, yMin: Long, yMax: Long, bits: Int): DataFrame =
    df.withColumn("zkey",
      morton(cell(xCol, xMin, xMax, bits),
             cell(yCol, yMin, yMax, bits), bits))

  /** The layout writer: z-key, then range-partition + sort so each output
    * file covers one contiguous z-range (tight per-file min/max on both
    * raw keys). `numFiles` maps to the target file count at scale.
    */
  def zorderLayout(df: DataFrame, xCol: String, yCol: String, bits: Int,
                   numFiles: Int): DataFrame = {
    val Row2 = df.agg(min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
      min(col(yCol)).cast("long"), max(col(yCol)).cast("long")).head()
    zkey(df, xCol, yCol, Row2.getLong(0), Row2.getLong(1), Row2.getLong(2),
        Row2.getLong(3), bits)
      .repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions("zkey")
  }

  /** The sink half: materialize the z-ordered layout as parquet. Each file
    * covers one contiguous z-range, so parquet footer min/max on the raw
    * key columns stays tight and predicates on EITHER dimension prune
    * files — this is the write-side product the `zorder_layout` audit
    * query models.
    */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, bits: Int,
                  numFiles: Int, path: String): Unit =
    zorderLayout(df, xCol, yCol, bits, numFiles)
      .write.mode("overwrite").parquet(path)

  /** Audit a written layout: per physical file, row count and the z/raw-key
    * envelopes — the direct evidence that files are disjoint in z and tight
    * on both raw keys (what makes skipping work). Runs as one grouped scan,
    * no footer parsing.
    */
  def fileAudit(spark: org.apache.spark.sql.SparkSession, path: String,
                xCol: String, yCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n"),
        min(col("zkey")).as("z_min"), max(col("zkey")).as("z_max"),
        min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"))
}
