package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis (view → click → purchase): for each entity,
  * the earliest time it completed step k STRICTLY AFTER its step-k−1 time;
  * the report aggregates per-step reach, conversion from the previous step,
  * and mean step latency.
  *
  * Shape at scale: step k is one filtered scan joined to the step-k−1
  * entity frame on the entity key and re-aggregated — every stage is a
  * keyed shuffle join + groupBy with map-side combine, so no per-entity
  * event list is ever collected or sorted (the fold-over-sorted-events
  * formulation would need either a per-entity sort of the whole corpus or
  * unbounded collect_list state). Entity frames shrink monotonically
  * (each stage filters to converters), and each is cached because the
  * report reads every stage twice (its own count + the next stage's join).
  *
  * The strict `>` means a same-instant pair does not count as progression
  * — at µs resolution simultaneous view+click is a bot signature, not a
  * funnel step; the tie policy is pinned by spec and oracle alike.
  */
object Funnel {

  /** Per-entity step times: one row per entity that completed ALL `steps`,
    * columns t1..tk. Intermediate stage frames are returned too (index i =
    * entities completing steps 0..i) so callers can count reach per stage.
    */
  def stageFrames(events: DataFrame, key: Column, ts: Column, typ: Column,
                  steps: Seq[String]): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel: no steps")
    val frames = Seq.newBuilder[DataFrame]
    var acc: DataFrame = null
    for ((st, i) <- steps.zipWithIndex) {
      val evs = events.where(typ === st)
        .select(key.as("__k"), ts.as("__ts"))
      acc =
        if (i == 0) evs.groupBy(col("__k")).agg(min(col("__ts")).as("t1"))
        else {
          val prevCols = (1 to i).map(j => min(col(s"t$j")).as(s"t$j"))
          acc.join(evs, "__k")
            .where(col("__ts") > col(s"t$i"))
            .groupBy(col("__k"))
            .agg(prevCols.head, (prevCols.tail :+ min(col("__ts")).as(s"t${i + 1}")): _*)
        }
      acc = acc.cache()
      frames += acc
    }
    frames.result()
  }

  /** 3-row-per-step funnel report: (step, name, n, conv_from_prev,
    * avg_lag_us). Stage counts come from single-row aggregates cross-joined
    * (all bounded), so the report is one small plan over the cached frames.
    */
  def report(events: DataFrame, key: Column, ts: Column, typ: Column,
             steps: Seq[String]): DataFrame = {
    val frames = stageFrames(events, key, ts, typ, steps)
    val spark = events.sparkSession
    val aggs = frames.zipWithIndex.map { case (f, i) =>
      if (i == 0) f.agg(count(lit(1)).as("n1"))
      else f.agg(count(lit(1)).as(s"n${i + 1}"),
        sum(col(s"t${i + 1}") - col(s"t$i")).as(s"lag${i + 1}"))
    }
    // the cross-joined aggregate is ONE bounded row: materialize it eagerly
    // so every cached stage frame can be released here — otherwise each
    // report() call in a long-lived session pins steps × calls frames in
    // executor storage until someone clearCache()s
    val one = aggs.reduce(_.crossJoin(_)).localCheckpoint()
    frames.foreach(_.unpersist())
    val rows = steps.indices.map { i =>
      val n = col(s"n${i + 1}")
      val conv =
        if (i == 0) lit(null).cast("double")
        else when(col(s"n$i") > 0,
          round(n.cast("double") / col(s"n$i"), 6)).cast("double")
      val lag =
        if (i == 0) lit(null).cast("double")
        else when(n > 0,
          round(col(s"lag${i + 1}").cast("double") / n, 6)).cast("double")
      one.select(lit(i + 1).as("step"), lit(steps(i)).as("name"),
        n.as("n_entities"), conv.as("conv_from_prev"), lag.as("avg_lag_us"))
    }
    rows.reduce(_.unionByName(_))
  }

  /** DuckDB mirror of [[report]] over the events table (µs domain). */
  def reportSql(steps: Seq[String]): String = {
    val stages = steps.zipWithIndex.map { case (st, i) =>
      if (i == 0)
        s"""s1 AS (SELECT user_id AS k, MIN(epoch_us(ts)) AS t1
           |  FROM events WHERE event_type = '$st' GROUP BY 1)""".stripMargin
      else {
        val prev = (1 to i).map(j => s"MIN(s$i.t$j) AS t$j").mkString(", ")
        s"""s${i + 1} AS (SELECT s$i.k, $prev, MIN(epoch_us(e.ts)) AS t${i + 1}
           |  FROM s$i JOIN events e ON e.user_id = s$i.k
           |  WHERE e.event_type = '$st' AND epoch_us(e.ts) > s$i.t$i
           |  GROUP BY 1)""".stripMargin
      }
    }.mkString(",\n")
    val aggSel = steps.indices.map { i =>
      if (i == 0) s"(SELECT COUNT(*) FROM s1) AS n1"
      else s"""(SELECT COUNT(*) FROM s${i + 1}) AS n${i + 1},
              |(SELECT SUM(t${i + 1} - t$i) FROM s${i + 1}) AS lag${i + 1}"""
        .stripMargin.replace("\n", " ")
    }.mkString(",\n       ")
    val rows = steps.zipWithIndex.map { case (st, i) =>
      val conv = if (i == 0) "CAST(NULL AS DOUBLE)"
      else s"CASE WHEN n$i > 0 THEN round(n${i + 1}::DOUBLE / n$i, 6) END"
      val lag = if (i == 0) "CAST(NULL AS DOUBLE)"
      else s"CASE WHEN n${i + 1} > 0 THEN round(lag${i + 1}::DOUBLE / n${i + 1}, 6) END"
      s"""SELECT ${i + 1} AS step, '$st' AS name, n${i + 1} AS n_entities,
         |       $conv AS conv_from_prev, $lag AS avg_lag_us FROM one"""
        .stripMargin.replace("\n", " ")
    }.mkString("\nUNION ALL\n")
    s"""WITH $stages,
       |one AS (SELECT $aggSel)
       |$rows""".stripMargin
  }
}
