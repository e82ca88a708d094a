package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture primitives for pipeline snapshots: diff two table
  * snapshots into insert/update/delete/unchanged row classes, and build
  * SCD-2 validity intervals from an append-only change stream. Both are
  * single-shuffle operators (one full-outer join; one window) — the shapes
  * that let a 100 TB nightly snapshot be reconciled without ever collecting
  * or sorting a whole table globally.
  */
object ChangeCapture {

  /** Classify `newDf` vs `oldDf` by `keys`: rows only in `newDf` are
    * `insert`, only in `oldDf` are `delete`, in both with any difference in
    * `compareCols` are `update`, else `unchanged`. One full-outer shuffle
    * join on the key columns. Keys join with PLAIN equality: a NULL key is
    * never an identity (consistent with primary-key semantics and with the
    * SQL mirrors' `o.k = n.k`) — a null-keyed old row reads as `delete`, a
    * null-keyed new row as `insert`. Value comparison IS null-safe (`<=>`),
    * so NULL → value transitions classify as updates rather than vanishing.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    // side-presence markers, NOT key-nullability: a row whose KEY VALUE is
    // null is unmatched under === but still present on its side — reading
    // the null key as "side absent" would classify a null-keyed old row as
    // an insert instead of a delete
    val o = oldDf.select((keys ++ compareCols).map(col): _*)
      .withColumn("__op", lit(true)).alias("o")
    val n = newDf.select((keys ++ compareCols).map(col): _*)
      .withColumn("__np", lit(true)).alias("n")
    val on = keys.map(k => col(s"o.$k") === col(s"n.$k")).reduce(_ && _)
    val same = compareCols.map(c => col(s"o.$c") <=> col(s"n.$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    o.join(n, on, "full_outer")
      .withColumn("status",
        when(col("o.__op").isNull, lit("insert"))
          .when(col("n.__np").isNull, lit("delete"))
          .when(same, lit("unchanged"))
          .otherwise(lit("update")))
      .select(
        keys.map(k => coalesce(col(s"o.$k"), col(s"n.$k")).as(k)) :+
          col("status"): _*)
  }

  /** SCD-2 intervals from a change stream: within each entity (`keys`),
    * collapse consecutive rows with an unchanged `state` into one validity
    * interval [valid_from, valid_to), valid_to NULL on the current row.
    * Gaps-and-islands with two window passes over ONE shuffle (both windows
    * share the same partitioning and sort, so Catalyst plans a single
    * exchange + sort). `ord +: tiebreak` must be a TOTAL order within the
    * entity — with ties, which of two same-instant states survives would be
    * partition-dependent (the same discipline as [[SeriesOps.rate]]).
    */
  def scd2Intervals(df: DataFrame, keys: Seq[String], ord: Column,
                    tiebreak: Seq[Column], state: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ord") +: tiebreak: _*)
    val changes = df
      .withColumn("__ord", ord)
      .withColumn("__st", state)
      .withColumn("__prev", lag(col("__st"), 1).over(w))
      // null-safe inequality: the first row of each entity (prev NULL) and
      // real NULL states both compare correctly
      .where(!(col("__prev") <=> col("__st")))
    changes
      .withColumn("valid_to", lead(col("__ord"), 1).over(w))
      .select(keys.map(col) ++ Seq(col("__st").as("state"),
        col("__ord").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.cast("int").as("is_current")): _*)
  }
}
