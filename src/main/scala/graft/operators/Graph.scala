package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PageRank over an arbitrary directed edge list — the graph
  * centrality companion to the connected-components dedup operator
  * ([[Dedup.clusterLabels]]): where CC answers "which docs are the same",
  * PageRank answers "which nodes matter" (domain authority for crawl
  * prioritization, user influence over an interaction graph).
  *
  * All arithmetic is FIXED-POINT INTEGER (ranks scaled by 1e12, floor
  * division everywhere): float PageRank is non-deterministic under
  * distributed summation (double addition is not associative, so partial
  * aggregation order changes low bits every run), which would break both
  * the cross-engine oracle and run-to-run reproducibility. Integer sums
  * are exact and order-independent; the cost is a bounded (≤ 1e-12 per
  * term) downward bias that is identical on every engine.
  *
  * Update rule per round, for damping d = 85/100 and N nodes:
  * {{{
  *   share(u)   = rank(u) DIV outdeg(u)              // per-node, exact
  *   inbound(v) = Σ_{(u,v) ∈ E} share(u)             // exact integer sum
  *   dangling   = Σ_{outdeg(u)=0} rank(u)            // exact integer sum
  *   rank'(v)   = (15*SCALE) DIV (100*N)             // teleport
  *              + (85*dangling) DIV (100*N)          // dangling mass
  *              + (85*inbound(v)) DIV 100
  * }}}
  *
  * Cost shape at scale: the node/rank table is graph-sized, so it is NEVER
  * broadcast (unlike CC's bounded pair-graph labels) — each round is the
  * canonical two-shuffle join+groupBy, with the edge and degree tables
  * cached across rounds and each round's ranks localCheckpoint'ed so round
  * k+1's plan does not re-analyze k stacked joins. Rounds are a fixed
  * unroll so the DuckDB oracle can mirror them as materialized CTEs.
  */
object Graph {

  val Scale = 1000000000000L // 1e12: 85*Scale fits a BIGINT with 5 digits spare

  /** `iters` rounds of integer PageRank over `edges` (cols `src`, `dst`;
    * duplicates allowed — they are weighted as parallel edges; pass
    * `dedupEdges = true` for an unweighted simple graph; null endpoints
    * are dropped — NULL is the reserved dangling-mass group key below).
    * Returns (node, rank) with rank on the 1e12 scale.
    *
    * Edge dedup runs AFTER the repartition on purpose: hash(src) already
    * clusters every (src, dst) group, so the dropDuplicates aggregate is
    * exchange-free on top of the one repartition shuffle — a caller-side
    * `.distinct()` would pay a second full-edge exchange (hash(src, dst)
    * then hash(src)) for the same result.
    *
    * Round shape (round-10 fusion): the dangling-mass aggregate no longer
    * runs as its own pass-plus-broadcast over the rank table — dangling
    * rows ride the SAME union → groupBy(n) shuffle as the inbound shares,
    * grouped under the reserved NULL key (no node id can collide: null
    * endpoints are filtered at the door). Each round checkpoints the slim
    * (n, x) aggregate instead of the full (n, deg, rank) table, reads the
    * one dangling row back as a driver literal (bounded collect, ~32
    * in-memory partitions), and rebuilds ranks lazily as a zipper join of
    * the cached nodeDeg with the checkpointed aggregate — both hash(n)
    * partitioned, so no exchange. One shuffle per round, total.
    * Measured vs the two-pass broadcast shape, interleaved warm runs on
    * the same box: sf0.1 3.9–4.8 vs 4.7 s, 10× 5.8–7.7 vs 6.0–8.2 s,
    * 100× (58.7M edges) 18.4 vs 17.9 s — NEUTRAL within box noise at
    * these sizes; kept for the structural reasons above, which a local
    * box cannot price: on a real cluster the old shape's per-round
    * dangling pass is a full extra scan job of the rank table plus a
    * broadcast barrier. Integer sums are order-independent, so ranks stay
    * bit-identical (oracle hash-exact at sf0.01/sf0.1).
    */
  /** Below this node count the per-round share table is explicitly
    * broadcast (~24 B/node ⇒ ≤ ~100 MB hashed at the cap). The hint exists
    * because each round's ranks derive from a localCheckpoint whose stats
    * are UNKNOWN (planned as huge), which otherwise INVERTS the build side:
    * the planner broadcasts the known-small cached EDGE table instead —
    * a fresh hash-relation build of every edge, every round (measured
    * r14: the dominant per-round cost at sf0.1). Past the cap nothing is
    * hinted and the round keeps the zipper shape the scaladoc above
    * describes — the rank table is graph-sized and must never broadcast
    * blindly.
    */
  val BroadcastShareMaxNodes = 4000000L

  def pagerank(edges: DataFrame, iters: Int,
               dedupEdges: Boolean = false,
               roundProbe: (DataFrame, DataFrame) => Unit = (_, _) => (),
               broadcastShareMaxNodes: Long = BroadcastShareMaxNodes): DataFrame = {
    val cast = edges
      .where(col("src").isNotNull && col("dst").isNotNull)
      .select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src"))
    val e = (if (dedupEdges) cast.dropDuplicates("src", "dst") else cast).cache()
    // static per-node state: out-degree, NULL for dangling nodes — carried
    // WITH the rank through every round so no round re-joins a separate
    // degree or node table. One fused pass: tagging each endpoint row with
    // its src-ness and summing under a single groupBy builds nodes AND
    // out-degrees in ONE shuffle with map-side combine, where the textbook
    // distinct-then-join-degrees shape pays two full endpoint shuffles
    // plus a join. NULLIF(·, 0) restores the dangling-node NULL marker.
    val nodeDeg = e.select(col("src").as("n"), lit(1L).as("s"))
      .unionByName(e.select(col("dst").as("n"), lit(0L).as("s")))
      .groupBy(col("n")).agg(nullif(sum(col("s")), lit(0L)).as("deg"))
      .cache()
    val nn = nodeDeg.count() // one bounded driver scalar, reused every round
    require(nn > 0, "pagerank: empty graph")
    // init is a constant projection over the just-materialized nodeDeg
    // cache — round 1's scans of it are in-memory reads, so a checkpoint
    // here would only add a materialization job
    val init = nodeDeg.select(col("n"), col("deg"), lit(Scale / nn).as("rank"))
    val out = (1 to iters).foldLeft(init) { (ranks, _) =>
      val sharesBase = ranks.where(col("deg").isNotNull)
        .select(col("n").as("src"), expr("rank DIV deg").as("share"))
      val shares =
        if (nn <= broadcastShareMaxNodes) broadcast(sharesBase) else sharesBase
      val contribPlan = e.join(shares, "src")
        .select(col("dst").as("n"), col("share").as("x"))
        .unionByName(ranks.where(col("deg").isNull)
          .select(lit(null).cast("long").as("n"), col("rank").as("x")))
        .groupBy(col("n")).agg(sum(col("x")).as("x"))
      val contrib = contribPlan.localCheckpoint()
      // dangling mass: ONE row of the in-memory checkpoint — a bounded
      // driver read, not a data-sized collect
      val dt = contrib.where(col("n").isNull).select(col("x"))
        .collect().headOption.map(_.getLong(0)).getOrElse(0L)
      // both Scala / and Spark DIV floor alike here: every operand is
      // non-negative (ranks are sums of non-negative integer terms)
      val next = nodeDeg.join(
          contrib.where(col("n").isNotNull).select(col("n"), col("x").as("inb")),
          Seq("n"), "left")
        .select(col("n"), col("deg"),
          (lit((15L * Scale) / (100L * nn)) // teleport term: driver constant
            + lit((85L * dt) / (100L * nn)) // dangling term: driver constant
            + expr("(85 * coalesce(inb, 0)) DIV 100")).as("rank"))
      // test seam: PlanAuditSpec pins the round's physical shape (one
      // exchange in contrib, zipper-joined next) — checkpointing erases
      // the plan, so the pin needs the frames pre-checkpoint/pre-action
      roundProbe(contribPlan, next)
      next
    }
    // the final ranks frame is a lazy join over e/nodeDeg-derived caches —
    // pin it once so the caches can be released instead of holding
    // executor storage for the session's lifetime
    val fin = out.localCheckpoint()
    e.unpersist()
    nodeDeg.unpersist()
    fin.select(col("n"), col("rank"))
  }

  /** Unrolled DuckDB mirror of the fused round shape (dangling mass rides
    * the same union → GROUP BY as the inbound shares, under the reserved
    * NULL key). `edgesSql` must yield (src, dst).
    */
  def pagerankSql(edgesSql: String, iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      // every SUM is cast back to BIGINT: DuckDB promotes SUM(BIGINT) to
      // HUGEINT, which the comparison layer reads as float64 and the
      // driver's type-sensitive hash then diverges on value-identical rows
      s"""s$k AS (SELECT r.n, r.rank // d.deg AS share
         |        FROM r${k - 1} r JOIN deg d USING (n)),
         |agg$k AS MATERIALIZED (
         |  SELECT n, CAST(SUM(x) AS BIGINT) AS x FROM (
         |    SELECT e.dst AS n, s.share AS x FROM e JOIN s$k s ON e.src = s.n
         |    UNION ALL
         |    SELECT NULL AS n, r.rank AS x
         |    FROM r${k - 1} r LEFT JOIN deg d USING (n) WHERE d.n IS NULL
         |  ) GROUP BY n),
         |dang$k AS (SELECT CAST(coalesce(
         |  (SELECT x FROM agg$k WHERE n IS NULL), 0) AS BIGINT) AS dt),
         |r$k AS MATERIALIZED (
         |  SELECT nodes.n,
         |         CAST((15 * ${Scale}::BIGINT) // (100 * meta.nn)
         |         + (85 * dang$k.dt) // (100 * meta.nn)
         |         + (85 * coalesce(inb.x, 0)) // 100 AS BIGINT) AS rank
         |  FROM nodes CROSS JOIN meta CROSS JOIN dang$k
         |  LEFT JOIN (SELECT n, x FROM agg$k WHERE n IS NOT NULL) inb
         |    ON inb.n = nodes.n)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED ($edgesSql),
       |nodes AS MATERIALIZED (
       |  SELECT DISTINCT n FROM (SELECT src AS n FROM e UNION ALL SELECT dst FROM e)),
       |deg AS MATERIALIZED (SELECT src AS n, COUNT(*) AS deg FROM e GROUP BY 1),
       |meta AS MATERIALIZED (SELECT COUNT(*) AS nn FROM nodes),
       |r0 AS MATERIALIZED (
       |  SELECT n, ${Scale}::BIGINT // meta.nn AS rank FROM nodes CROSS JOIN meta),
       |$rounds""".stripMargin
  }
}
