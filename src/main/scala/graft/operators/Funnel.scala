package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis (view → click → purchase): for each entity,
  * the earliest time it completed step k STRICTLY AFTER its step-k−1 time;
  * the report aggregates per-step reach, conversion from the previous step,
  * and mean step latency.
  *
  * Shape at scale: ONE keyed shuffle. Funnel-type events repartition by
  * entity and sort within partitions on (entity, ts) — Spark's external
  * sort, spill-safe at any size — then a streaming state machine walks each
  * entity's events once with O(steps) state and emits one step-time vector
  * per entity. No per-entity event list is ever collected (a bot entity
  * with millions of events costs zero extra memory), and the whole corpus
  * moves through exactly one exchange — versus the staged-join
  * formulation's 2×steps shuffles of the same rows (one join + one
  * re-aggregation per step), which is why this query was 85× off the
  * single-node oracle time at sf0.1 before the rewrite.
  *
  * The strict `>` means a same-instant pair does not count as progression
  * — at µs resolution simultaneous view+click is a bot signature, not a
  * funnel step; the tie policy is pinned by spec and oracle alike. The
  * result is sort-order independent: an event can only bind to its own
  * step's slot, same-type ties resolve to the min either way, and a
  * same-instant cross-step pair fails the strict `>` in both orders.
  */
object Funnel {

  /** One entity's step-completion times; t(i) = earliest instant the entity
    * finished step i strictly after t(i−1), None once the chain breaks.
    * (Not `private`: Catalyst's generated deserializer needs public access.)
    */
  case class StepTimes(t: Seq[Option[Long]])
  case class FunnelEvent(k: String, ts: Long, step: Int)

  /** Per-entity step times (one row per entity seen in ANY step, columns
    * tied by position: element i of `t` = step i's completion time).
    */
  private def stepTimes(events: DataFrame, key: Column, ts: Column,
                        typ: Column, steps: Seq[String]): Dataset[StepTimes] = {
    require(steps.nonEmpty, "funnel: no steps")
    val spark = events.sparkSession
    import spark.implicits._
    val nSteps = steps.length
    // step name → index resolved in-plan (events outside the funnel are
    // dropped before the shuffle, so the exchange only moves funnel rows)
    val stepIdx = (array_position(array(steps.map(lit): _*), typ) - 1).cast("int")
    events.where(typ.isInCollection(steps))
      .select(key.cast("string").as("k"), ts.cast("long").as("ts"),
        stepIdx.as("step"))
      .as[FunnelEvent]
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("ts"))
      .mapPartitions { rows =>
        val it = rows.buffered
        new Iterator[StepTimes] {
          def hasNext: Boolean = it.hasNext
          def next(): StepTimes = {
            val k0 = it.head.k
            val t = Array.fill[Option[Long]](nSteps)(None)
            while (it.hasNext && it.head.k == k0) {
              val e = it.next()
              if (t(e.step).isEmpty &&
                  (e.step == 0 || t(e.step - 1).exists(_ < e.ts)))
                t(e.step) = Some(e.ts)
            }
            StepTimes(t.toIndexedSeq)
          }
        }
      }
  }

  /** 1-row-per-step funnel report: (step, name, n_entities, conv_from_prev,
    * avg_lag_us). The per-entity pass feeds ONE global aggregate; the
    * single bounded row is checkpointed so the per-step report selects
    * don't re-run the scan.
    */
  def report(events: DataFrame, key: Column, ts: Column, typ: Column,
             steps: Seq[String]): DataFrame = {
    val times = stepTimes(events, key, ts, typ, steps)
    def t(i: Int) = element_at(col("t"), i + 1) // 1-based element_at
    val aggs = steps.indices.flatMap { i =>
      val n = count(when(t(i).isNotNull, 1)).as(s"n${i + 1}")
      if (i == 0) Seq(n)
      else Seq(n, sum(when(t(i).isNotNull, t(i) - t(i - 1))).as(s"lag${i + 1}"))
    }
    val one = times.agg(aggs.head, aggs.tail: _*).localCheckpoint()
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
