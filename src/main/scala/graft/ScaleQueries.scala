package graft

import graft.operators.{ChangeCapture, Graph, Quantiles, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 scale-path operator surface: each of these exists because the
  * straightforward formulation stops working at 100 TB — PageRank needs
  * exact fixed-point sums to be reproducible under distributed addition,
  * histogram quantiles replace the per-group global sort, snapshot CDC
  * reconciles nightly copies with one join, SCD-2 builds validity intervals
  * with one window, per-dimension embedding stats lean entirely on
  * map-side combine, temperature rebalance keeps the corpus path a single
  * narrow filter, inverted postings bound stopword state by truncation,
  * token entropy moves transcendentals into a shared literal table, and
  * the funnel avoids any per-entity event sort. All oracle-checked like
  * the core queries.
  */
object ScaleQueries {

  // ---- fixed-point PageRank over the customer→supplier order graph ------
  val PrIters = 3
  val PrTopK = 100

  /** Who are the load-bearing suppliers/customers in the order graph?
    * Bipartite directed graph: customer --(ordered from)--> supplier,
    * distinct edges from orders⋈lineitem. Node ids disambiguate the two
    * namespaces arithmetically (cust → 2k, supp → 2k+1).
    */
  def graphPagerank(s: SparkSession, dir: String): DataFrame = {
    val orders = Queries.table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Queries.table(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val edges = orders.join(li, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
    Graph.pagerank(edges, PrIters, dedupEdges = true)
      .orderBy(col("rank").desc, col("n"))
      .limit(PrTopK)
      .select(col("n").as("node"), col("rank"))
  }

  val graphPagerankSql: String = {
    val edgesSql =
      """SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin
    s"""${Graph.pagerankSql(edgesSql, PrIters)}
       |SELECT n AS node, rank FROM r$PrIters
       |ORDER BY rank DESC, n LIMIT $PrTopK""".stripMargin
  }

  // ---- histogram quantile estimation --------------------------------------
  val HistBins = 128
  val HistPcts = Seq(50, 90, 99)

  def quantileHistogram(s: SparkSession, dir: String): DataFrame =
    Quantiles.histogramQuantiles(
      Queries.events(s, dir).select(col("event_type"), col("value").as("v")),
      Seq("event_type"), col("v"), HistBins, HistPcts)
      .orderBy("event_type")

  val quantileHistogramSql: String =
    s"""SELECT * FROM ${Quantiles.histogramQuantilesSql(
      "(SELECT event_type, value AS v FROM events)", "event_type",
      HistBins, HistPcts)}
       |ORDER BY event_type""".stripMargin

  // ---- snapshot CDC diff ---------------------------------------------------
  /** Nightly-snapshot reconciliation: old/new snapshots of the orders table
    * derived deterministically (new adds keys ≡0 mod 17, drops keys ≡0 mod
    * 13, flips status on keys ≡0 mod 11), classified in one full-outer
    * join, then rolled up per class with a key checksum.
    */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val base = Queries.table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val old = base.where(expr("o_orderkey % 17 != 0"))
      .select(col("o_orderkey"), col("o_orderstatus").as("st"),
        col("o_totalprice").as("tp"))
    val nw = base.where(expr("o_orderkey % 13 != 0"))
      .select(col("o_orderkey"),
        when(expr("o_orderkey % 11 = 0"), lit("X"))
          .otherwise(col("o_orderstatus")).as("st"),
        col("o_totalprice").as("tp"))
    ChangeCapture.snapshotDiff(old, nw, Seq("o_orderkey"), Seq("st", "tp"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
      .orderBy("status")
  }

  val snapshotDiffSql: String =
    """WITH o AS (SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS tp,
      |                  1 AS op
      |           FROM orders WHERE o_orderkey % 17 <> 0),
      |n AS (SELECT o_orderkey AS k,
      |             CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END AS st,
      |             o_totalprice AS tp, 1 AS np
      |      FROM orders WHERE o_orderkey % 13 <> 0),
      |d AS (SELECT coalesce(o.k, n.k) AS k,
      |             -- presence markers, not key-nullability: a NULL key is
      |             -- unmatched but its side is still present
      |             CASE WHEN o.op IS NULL THEN 'insert'
      |                  WHEN n.np IS NULL THEN 'delete'
      |                  WHEN o.st IS NOT DISTINCT FROM n.st
      |                   AND o.tp IS NOT DISTINCT FROM n.tp THEN 'unchanged'
      |                  ELSE 'update' END AS status
      |      FROM o FULL JOIN n ON o.k = n.k)
      |SELECT status, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS key_sum
      |FROM d GROUP BY 1 ORDER BY status""".stripMargin

  // ---- SCD-2 validity intervals -------------------------------------------
  /** Per-user event_type state history as SCD-2 rows: one interval per
    * consecutive run of the same state, ordered by (µs, event_id) — the
    * same total-order discipline as ts_rate.
    */
  def scd2Intervals(s: SparkSession, dir: String): DataFrame = {
    val ev = Queries.events(s, dir).select(
      col("user_id"), col("event_id"), expr("ts DIV 1000").as("us"),
      col("event_type"))
    ChangeCapture.scd2Intervals(ev, Seq("user_id"), col("us"),
      Seq(col("event_id")), col("event_type"))
      .orderBy("user_id", "valid_from", "state")
  }

  val scd2IntervalsSql: String =
    """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
      |            FROM events),
      |ch AS (SELECT user_id, event_id, us, event_type AS st,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
      |       FROM ev),
      |flt AS (SELECT * FROM ch WHERE prev IS DISTINCT FROM st)
      |SELECT user_id, st AS state, us AS valid_from,
      |       lead(us) OVER w2 AS valid_to,
      |       CAST(lead(us) OVER w2 IS NULL AS INT) AS is_current
      |FROM flt WINDOW w2 AS (PARTITION BY user_id ORDER BY us, event_id)
      |ORDER BY user_id, valid_from, state""".stripMargin

  // ---- temperature mixture sampling ---------------------------------------
  val TempSalt = "tempr"

  /** √-temperature (T=2) language rebalance over documents — the
    * multilingual-pretraining mix, sitting between keep-everything and
    * sample_rebalance's full uniform.
    */
  def sampleTemperature(s: SparkSession, dir: String): DataFrame =
    operators.Sampling.rebalanceTemperature(
      Queries.table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source")),
      col("doc_id"), col("lang"), TempSalt)
      .orderBy("doc_id")

  val sampleTemperatureSql: String =
    s"""WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
       |m AS (SELECT MIN(n) AS mn FROM c)
       |SELECT d.doc_id, d.lang, d.source
       |FROM documents d JOIN c USING (lang), m
       |WHERE ${operators.Sampling.bucketOfSql("d.doc_id", TempSalt)}
       |      < CAST(floor(${operators.Sampling.Den} * sqrt(mn::DOUBLE / n)) AS BIGINT)
       |ORDER BY d.doc_id""".stripMargin

  // ---- inverted index postings --------------------------------------------
  val PostingsK = 5

  /** Truncated inverted index over the document corpus: per token df/cf +
    * top-5 postings by (tf desc, doc_id).
    */
  def invertedPostings(s: SparkSession, dir: String): DataFrame =
    operators.Retrieval.invertedPostings(
      Queries.table(s, dir, "documents").select(col("doc_id"), col("text")),
      "doc_id", "text", PostingsK)
      .orderBy("token")

  val invertedPostingsSql: String =
    s"""SELECT * FROM ${operators.Retrieval.invertedPostingsSql(PostingsK)}
       |ORDER BY token""".stripMargin

  // ---- data-quality validation report --------------------------------------
  /** Pre-promotion constraint report over the relational snapshot: pk
    * uniqueness, lineitem→orders referential coverage, null and range
    * bounds. The range rule is deliberately tight enough to fail on real
    * data so the report's violation path is exercised, not just zeros.
    */
  def dataValidate(s: SparkSession, dir: String): DataFrame = {
    val orders = Queries.table(s, dir, "orders")
    val li = Queries.table(s, dir, "lineitem")
    // r14: rules grouped by the table they scan — orders' three rules are
    // ONE aggregate pass, lineitem's fk probe and range rule share ONE
    // join+aggregate pass. Same five report rows; 7 table scans → 3.
    operators.Validate.report(Seq(
      operators.Validate.fused(orders,
        pks = Seq("orders_pk_unique" -> Seq("o_orderkey")),
        preds = Seq(
          "orders_status_domain" -> col("o_orderstatus").isin("F", "O", "P"),
          "orders_price_cap" -> (col("o_totalprice") < 300000.0))),
      operators.Validate.fkCoveredFused(li, orders, "lineitem_fk_orders",
        "l_orderkey", "o_orderkey",
        preds = Seq("lineitem_qty_range" ->
          (col("l_quantity").isNotNull && col("l_quantity") >= 1 && col("l_quantity") <= 50)))))
      .orderBy("rule")
  }

  val dataValidateSql: String =
    """WITH r AS (
      |  SELECT 'orders_pk_unique' AS rule, COUNT(*) AS n_checked,
      |         COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_violations FROM orders
      |  UNION ALL
      |  SELECT 'lineitem_fk_orders', (SELECT COUNT(*) FROM lineitem),
      |         (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
      |            ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
      |  UNION ALL
      |  SELECT 'orders_status_domain', COUNT(*),
      |         CAST(COALESCE(SUM(CASE WHEN o_orderstatus IN ('F','O','P') THEN 0 ELSE 1 END), 0) AS BIGINT)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'lineitem_qty_range', COUNT(*),
      |         CAST(COALESCE(SUM(CASE WHEN l_quantity IS NOT NULL
      |                        AND l_quantity >= 1 AND l_quantity <= 50
      |                   THEN 0 ELSE 1 END), 0) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'orders_price_cap', COUNT(*),
      |         CAST(COALESCE(SUM(CASE WHEN o_totalprice < CAST(300000.0 AS DOUBLE) THEN 0 ELSE 1 END), 0) AS BIGINT)
      |  FROM orders)
      |SELECT rule, n_checked, n_violations,
      |       CAST(n_violations = 0 AS INT) AS pass
      |FROM r ORDER BY rule""".stripMargin

  // ---- ordered-step funnel -------------------------------------------------
  val FunnelSteps = Seq("view", "click", "purchase")

  /** view → click → purchase conversion over the event stream: per-step
    * reach, conversion rate, and mean µs latency; strict-after ordering.
    */
  def eventFunnel(s: SparkSession, dir: String): DataFrame =
    operators.Funnel.report(
      Queries.events(s, dir)
        .select(col("user_id"), expr("ts DIV 1000").as("us"), col("event_type")),
      col("user_id"), col("us"), col("event_type"), FunnelSteps)
      .orderBy("step")

  val eventFunnelSql: String =
    s"""${operators.Funnel.reportSql(FunnelSteps)}
       |ORDER BY step""".stripMargin

  // ---- token entropy (lexical diversity) ----------------------------------
  /** Shannon entropy of the per-doc token distribution — the boilerplate /
    * keyword-stuffing quality signal. Transcendentals come from ONE shared
    * ln literal table indexed by both engines (TextAnalysis.LnTable).
    */
  def textEntropy(s: SparkSession, dir: String): DataFrame =
    operators.TextAnalysis.tokenEntropy(
      Queries.table(s, dir, "documents").select(col("doc_id"), col("text")))
      .orderBy("doc_id")

  val textEntropySql: String =
    s"""SELECT * FROM ${operators.TextAnalysis.tokenEntropySql}
       |ORDER BY doc_id""".stripMargin

  // ---- per-dimension embedding stats --------------------------------------
  def embedDimStats(s: SparkSession, dir: String): DataFrame =
    Similarity.dimStats(Queries.table(s, dir, "embeddings")
      .select(col("embedding")))
      .orderBy("dim")

  val embedDimStatsSql: String =
    s"""${Similarity.dimStatsSql}
       |ORDER BY dim""".stripMargin
}
