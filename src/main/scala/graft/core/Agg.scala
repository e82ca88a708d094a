package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The closed set of five aggregation methods, id-stable with the reference
  * (reference: kenshin/agg.py:9-36 — order [average, sum, last, max, min]).
  *
  * Each maps to a codegen'd Spark built-in over a (value, ts) pair:
  * `last` is "latest valid value in the window", i.e. max_by(value, ts)
  * (the reference applies operator.itemgetter(-1) to a time-sorted list).
  * Nulls are ignored natively by Spark aggregates, matching the reference's
  * filter_values (kenshin/storage.py:612-615); an all-null window yields null.
  */
sealed abstract class AggMethod(val id: Int, val name: String) {
  /** Spark aggregate expression over a value column (ts used for `last`). */
  def expr(value: Column, ts: Column): Column
  /** DuckDB-equivalent SQL fragment over column names (for oracles). */
  def sql(value: String, ts: String): String
}

object AggMethod {
  case object Average extends AggMethod(0, "average") {
    def expr(value: Column, ts: Column): Column = avg(value)
    def sql(value: String, ts: String): String = s"avg($value)"
  }
  case object Sum extends AggMethod(1, "sum") {
    def expr(value: Column, ts: Column): Column = sum(value)
    def sql(value: String, ts: String): String = s"sum($value)"
  }
  case object Last extends AggMethod(2, "last") {
    def expr(value: Column, ts: Column): Column = max_by(value, when(value.isNotNull, ts))
    def sql(value: String, ts: String): String =
      s"arg_max($value, $ts)" // DuckDB arg_max ignores rows with null value
  }
  case object Max extends AggMethod(3, "max") {
    def expr(value: Column, ts: Column): Column = max(value)
    def sql(value: String, ts: String): String = s"max($value)"
  }
  case object Min extends AggMethod(4, "min") {
    def expr(value: Column, ts: Column): Column = min(value)
    def sql(value: String, ts: String): String = s"min($value)"
  }

  val all: Seq[AggMethod] = Seq(Average, Sum, Last, Max, Min)

  def byId(id: Int): AggMethod = all(id)

  def byName(name: String): AggMethod = name match {
    case "average" | "avg" => Average
    case "sum"             => Sum
    case "last"            => Last
    case "max"             => Max
    case "min"             => Min
    case other             => throw InvalidConfig(s"unknown aggregation method '$other'")
  }
}
