package graft

import graft.core.{AggMethod, Archive, StorageSchema}
import graft.storage.MetricStore
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Physical-plan audits: the properties that keep these operators viable at
  * 100 TB — predicate/partition pushdown into parquet scans, column
  * pruning, codegen coverage, and no stray cartesian products — asserted on
  * the actual executed plans so a regression shows up as a test failure,
  * not a cluster incident.
  */
class PlanAuditSpec extends AnyFunSuite with BeforeAndAfterAll {
  implicit lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"
  var root: java.nio.file.Path = _
  override def beforeAll(): Unit = { root = java.nio.file.Files.createTempDirectory("graft-plan") }
  override def afterAll(): Unit = {
    import scala.reflect.io.Directory
    new Directory(new java.io.File(root.toString)).deleteRecursively()
    ()
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("readLevel pushes pday partition pruning and ts row-group filters into the scan") {
    val sch = StorageSchema("pa", ".*".r, 1.0, AggMethod.Last, Seq(Archive(10, 360)), 600, 8)
    val store = new MetricStore(s"$root/pa", sch)
    val now = 1700003600L
    store.writeBatch(Seq(("m", now - 100, 1.0, 1L)).toDF("metric", "ts", "value", "arrival"), now)
    val plan = planOf(store.readLevel(0, now - 200, now))
    assert(plan.contains("PartitionFilters") && plan.contains("pday"),
      s"pday pruning missing:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(ts"),
      s"ts pushdown missing:\n$plan")
  }

  test("text queries prune the documents scan to the referenced columns") {
    val plan = planOf(PipelineQueries.textTokens(spark, sfDir))
    // ReadSchema must not include source/lang/n_chars — only doc_id + text
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"), readSchema)
    assert(!readSchema.contains("n_chars") && !readSchema.contains("source"), readSchema)
  }

  /** Codegen explain with AQE off for the inspection — under AQE the stages
    * (and their WholeStageCodegen wrappers) only exist after execution.
    */
  private def codegenOf(build: => org.apache.spark.sql.DataFrame): String = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try build.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("ts rollups stay inside whole-stage codegen with a partial aggregate") {
    val cg = codegenOf(Queries.tsRollupAvg(spark, sfDir))
    assert(cg.contains("WholeStageCodegen") && !cg.contains("Found 0 WholeStageCodegen"), cg.take(500))
    // map-side combine before the exchange: partial_ aggregate functions
    val plan = planOf(Queries.tsRollupAvg(spark, sfDir))
    assert(plan.contains("partial_"), s"no partial aggregation:\n$plan")
  }

  test("events time-window queries push the range onto the raw ts scan (PushedFilters)") {
    // the clamp must be expressed on the ON-DISK ts type before
    // normalization: a predicate on the derived ns/sec column stays above
    // the projection and the scan reads the full history
    for (df <- Seq(Queries.tsHotView(spark, sfDir),
                   Queries.tsCacheMerge(spark, sfDir))) {
      val plan = planOf(df)
      assert(plan.contains("PushedFilters") &&
        (plan.contains("GreaterThanOrEqual(ts") || plan.contains("LessThan(ts")),
        s"ts window must reach the parquet scan:\n${plan.take(3000)}")
    }
  }

  test("q1 pricing scan pushes the shipdate filter down") {
    val plan = planOf(Queries.q1Pricing(spark, sfDir))
    assert(plan.contains("PushedFilters") && plan.contains("LessThanOrEqual(l_shipdate"),
      s"shipdate pushdown missing:\n$plan")
  }

  test("q5 region joins contain no cartesian product and broadcast the true dims") {
    val plan = planOf(Queries.q5Region(spark, sfDir))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan) // nation/region hints
  }

  test("fnv1a shard expression is codegen'd (no UDF barrier)") {
    val plan = planOf(Queries.fnv1aShard(spark, sfDir))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
    val cg = codegenOf(Queries.fnv1aShard(spark, sfDir))
    assert(cg.contains("WholeStageCodegen") && !cg.contains("Found 0 WholeStageCodegen"), cg.take(500))
  }

  test("IVF ANN broadcasts only the centroid table, never the corpus") {
    val plan = planOf(ExtQueries.annIvf(spark, sfDir))
    assert(!plan.contains("CartesianProduct"), plan)
    // the K-centroid side rides broadcast joins; the corpus side must not
    // appear under a BroadcastExchange (it would OOM the driver at scale)
    val broadcasts = plan.linesIterator.count(_.contains("BroadcastExchange"))
    assert(broadcasts >= 1, s"expected broadcast centroid fanout:\n$plan")
    assert(plan.contains("partial_min"),
      s"cell argmax must partial-aggregate (min over (-cos, cid) structs) map-side:\n$plan")
  }

  test("HLL registers partial-aggregate before the exchange (mergeable sketch)") {
    val plan = planOf(ExtQueries.hllDistinct(spark, sfDir))
    assert(plan.contains("partial_max"), s"register max must be partial:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("stratified sample is a narrow codegen'd filter (no shuffle, no UDF)") {
    val df = graft.operators.Sampling.stratified(
      Queries.table(spark, sfDir, "documents"),
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("lang"), Seq("en" -> 0.25), 0.8)
    val plan = planOf(df)
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"), plan)
  }

  test("LSH near-dup candidate join is an equi-join on (tbl, bucket), not a theta join") {
    val plan = planOf(PipelineQueries.embedCosineNearDup(spark, sfDir))
    // the candidate generator must hash-join on the LSH cell; the only
    // non-equi condition allowed is the a<b tie-break inside the join
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"near-dup fell back to a nested-loop scan:\n$plan")
  }

  test("connected-components round is zero-shuffle: broadcast join + in-place agg") {
    import org.apache.spark.sql.functions._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val edges = graft.operators.Dedup.ccEdges(pairs)
    edges.count() // materialize the pre-partitioned cache
    val labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint()
    val round = graft.operators.Dedup.ccRound(edges, labels)
    round.collect() // executedPlan under AQE is only final after execution
    val executed = round.queryExecution.executedPlan
    assert(executed.toString.contains("BroadcastHashJoin"),
      s"label join must broadcast:\n$executed")
    // tree walk, stopping at the cached scan: the one-time repartition in
    // the edge table's BUILD lineage is legitimate; anything the round
    // itself shuffles is not (round-11 ADVICE: string-prefix splitting at
    // the first InMemoryRelation missed branches printed after it)
    val shuffles = graft.plans.PlanCensus.consumerHashShuffles(executed)
    assert(shuffles == 0,
      s"a propagation round must not re-shuffle the pre-partitioned edges:\n$executed")
  }

  test("LSH banding candidate stages are 2 exchanges flat, join-free") {
    import org.apache.spark.sql.functions.col
    // round 13: both banding candidate stages are ONE capped-collect
    // aggregation + pair explode — the executed plan must carry exactly
    // two hash exchanges end-to-end (the aggregation's and the final pair
    // distinct's), no cache, no sort-merge join. (Queries.spread's
    // round-robin input spread is not a hash exchange and not under audit.)
    def candidateShape(df: org.apache.spark.sql.DataFrame, what: String,
                       maxShuffles: Int): Unit = {
      df.collect() // AQE: executedPlan final only after execution
      val exec = df.queryExecution.executedPlan
      val shuffles = graft.plans.PlanCensus.consumerHashShuffles(exec)
      assert(shuffles <= maxShuffles,
        s"$what candidate stage grew extra exchanges: $shuffles\n${exec.toString.take(2000)}")
      assert(graft.plans.PlanCensus.censusOf(exec).sortMergeJoins == 0,
        s"$what candidate stage must be join-free:\n${exec.toString.take(2000)}")
    }
    val docs = Queries.spread(Queries.table(spark, sfDir, "documents"))
    // minhash signatures are kernel-fused (no per-doc aggregate), so the
    // whole query is the bucket agg + the pair distinct
    candidateShape(graft.operators.Dedup.minhashLshPairs(
      docs, 3, PipelineQueries.MinhashBands, PipelineQueries.MinhashRows,
      PipelineQueries.MinhashBucketCap), "minhash", maxShuffles = 2)
    // simhash pays one more: its signature is itself a per-doc aggregation
    // over exploded tokens (lane-packed bit votes)
    candidateShape(graft.operators.Dedup.simhashNearDupPairs(
      docs, 3, PipelineQueries.SimhashBucketCap), "simhash", maxShuffles = 3)
    // vacuity: a CACHED leaky shape (cache without the pre-partitioning),
    // so the guard exercises the same InMemoryTableScan pruning the real
    // audits rely on — the walker must still count the consumers' own
    // exchanges downstream of the cached scan
    val naive = docs
      .select(col("doc_id"), (col("doc_id") % 5).as("k"), (col("doc_id") % 7).as("j"))
      .cache()
    try {
      val g1 = naive.groupBy("k").agg(org.apache.spark.sql.functions.count("*").as("ck"))
      val g2 = naive.groupBy("j").agg(org.apache.spark.sql.functions.count("*").as("cj"))
      val leaky = g1.join(g2, g1("ck") === g2("cj"))
      leaky.collect()
      val executed = leaky.queryExecution.executedPlan
      assert(graft.plans.PlanCensus.hasInMemoryScan(executed),
        s"vacuity guard lost its cached scan:\n${executed.toString.take(2000)}")
      val leakyN = graft.plans.PlanCensus.consumerHashShuffles(executed)
      assert(leakyN > 1,
        s"walker failed to count exchanges downstream of a cached scan: $leakyN")
    } finally naive.unpersist()
  }

  test("shingle generation runs the codegen'd kernels, not interpreted HOF lambdas") {
    // (the per-doc BAND transform() stays a lambda — 4 elements per doc;
    // it's the per-shingle path that must be a kernel)
    // minhash: the whole signature is ONE per-doc kernel (round 13 — no
    // shingle explode at all); the memoized pair frame hides the build
    // plan, so pin the builder directly
    val mhPlan = graft.operators.Dedup.minhashLshPairs(
      Queries.spread(Queries.table(spark, sfDir, "documents")),
      3, PipelineQueries.MinhashBands, PipelineQueries.MinhashRows,
      PipelineQueries.MinhashBucketCap).queryExecution.executedPlan.toString
    assert(mhPlan.contains("minhash_signature"),
      s"minhash signature kernel missing from plan:\n${mhPlan.take(2000)}")
    // jaccard still explodes shingles (the per-shingle buckets need the
    // rows): per-shingle work must be the word_shingles kernel
    val jPlan = planOf(PipelineQueries.dedupNgramJaccard(spark, sfDir))
    assert(jPlan.contains("word_shingles"),
      s"shingle kernel missing from plan:\n${jPlan.take(2000)}")
  }

  test("ann_lsh joins are all broadcast-side bounded (corpus never shuffles for scoring)") {
    val plan = planOf(PipelineQueries.annLsh(spark, sfDir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"scoring re-join must broadcast the query-bounded candidate set:\n$plan")
  }

  test("text quality runs codegen'd kernels, no interpreted filter lambdas") {
    val plan = planOf(PipelineQueries.textQuality(spark, sfDir))
    assert(plan.contains("text_stats") && plan.contains("punct_count"),
      s"quality kernels missing:\n${plan.take(2000)}")
    assert(!plan.contains("filter(lambda"), s"interpreted filter lambda:\n${plan.take(2000)}")
  }

  test("repetition stats is a kernel projection: no shuffle except the output sort") {
    val plan = planOf(PipelineQueries.textRepetition(spark, sfDir))
    assert(plan.contains("repetition_stats"), s"kernel missing:\n${plan.take(2000)}")
    // the only exchange allowed is the orderBy's range partitioning — the
    // signal itself must never shuffle gram occurrences
    val hashShuffles = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(hashShuffles == 0, s"repetition stats must not shuffle grams:\n$plan")
  }

  test("decontamination broadcasts the benchmark shingle set over the corpus scan") {
    val plan = planOf(PipelineQueries.textDecontaminate(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), s"bench probe must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("quantization audit is a narrow kernel scan (sort exchange only)") {
    val plan = planOf(PipelineQueries.embedQuantize(spark, sfDir))
    assert(plan.contains("vec_quant_stats"), s"kernel missing:\n${plan.take(2000)}")
    val hashShuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashShuffles == 0, s"quantization must not shuffle the corpus:\n$plan")
  }

  test("rebalance broadcasts the per-group thresholds; the corpus side stays a filter") {
    val df = graft.operators.Sampling.rebalanceUniform(
      Queries.table(spark, sfDir, "documents"),
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("lang"))
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), s"threshold join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus must never shuffle for mixture control:\n$plan")
  }

  test("temperature rebalance keeps the corpus side shuffle-free too") {
    val plan = planOf(ScaleQueries.sampleTemperature(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), s"threshold join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus must never shuffle for mixture control:\n$plan")
  }

  test("embed_dim_stats partial-aggregates the exploded rows before the exchange") {
    // the shuffle must carry O(dim · parallelism) rows, never O(n · dim):
    // partial_ sum/count on the map side is the load-bearing property
    val plan = planOf(ScaleQueries.embedDimStats(spark, sfDir))
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"dim stats must map-side combine the exploded rows:\n$plan")
  }

  test("histogram quantiles never window over raw rows, only over binned counts") {
    val plan = planOf(ScaleQueries.quantileHistogram(spark, sfDir))
    // both corpus passes are aggregates (partial'd); the only Window sits
    // above the per-(group, bin) table, AFTER a HashAggregate — a Window
    // directly over the scan would be the per-group global sort this
    // operator exists to avoid
    assert(plan.contains("partial_"), s"bin counts must partial-aggregate:\n$plan")
    val lines = plan.linesIterator.toSeq
    val winIdx = lines.indexWhere(_.contains("Window"))
    assert(winIdx >= 0, s"expected the cumulative-bin window:\n$plan")
    assert(lines.drop(winIdx).exists(_.contains("HashAggregate")),
      s"the window must consume aggregated bins, not raw rows:\n$plan")
  }

  test("pagerank round: one exchange in the fused contrib, zipper next-ranks") {
    // the round-10 fused shape: inbound shares and the dangling mass ride
    // ONE union -> groupBy(n) shuffle; the next-ranks join must zipper the
    // cached nodeDeg with the checkpointed aggregate (both hash(n)). The
    // probe sees the frames pre-checkpoint, where the plan is visible.
    // AQE and broadcast thresholds are disabled for the pin: at toy scale
    // both planners legitimately broadcast the tiny sides, which would
    // hide exactly the structural shuffles this test exists to count —
    // REPARTITION_BY_COL exchanges belong to the cached edge build and
    // are excluded; ENSURE_REQUIREMENTS exchanges are the round's own.
    val conf = spark.conf
    val saved = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val edges = (1L to 200L).map(i => (i, i % 23 + 1)).toDF("src", "dst")
      // walk the TREE, not the explain string: toString prints each cached
      // relation's build plan (nodeDeg's own exchange shows up twice), but
      // collect() does not descend into InMemoryRelation cache builders,
      // so it counts exactly the round's OWN operators
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
      import org.apache.spark.sql.execution.joins.CartesianProductExec
      val plans = scala.collection.mutable.ArrayBuffer
        .empty[(SparkPlan, SparkPlan, String, String)]
      // broadcastShareMaxNodes = 0: pin the AT-SCALE shape (past the gate
      // nothing is hinted — the rank table is graph-sized there)
      graft.operators.Graph.pagerank(edges, 2, roundProbe = (contrib, next) =>
        plans += ((contrib.queryExecution.executedPlan,
          next.queryExecution.executedPlan, planOf(contrib), planOf(next))),
        broadcastShareMaxNodes = 0L)
      assert(plans.size == 2)
      def shuffles(p: SparkPlan): Int = p.collect { case e: ShuffleExchangeExec => e }.size
      def bcasts(p: SparkPlan): Int = p.collect { case e: BroadcastExchangeExec => e }.size
      def carts(p: SparkPlan): Int = p.collect { case e: CartesianProductExec => e }.size
      for (((contrib, next, cs, ns), k) <- plans.zipWithIndex) {
        assert(carts(contrib) == 0 && carts(next) == 0, s"no cartesian allowed:\n$cs")
        assert(bcasts(contrib) == 0 && bcasts(next) == 0,
          s"round ${k + 1}: nothing in a round may statically broadcast:\n$cs")
        assert(shuffles(contrib) == 1,
          s"round ${k + 1}: fused contrib must be ONE exchange, got ${shuffles(contrib)}:\n$cs")
        assert(shuffles(next) == 0,
          s"round ${k + 1}: next-ranks must zipper, got ${shuffles(next)}:\n$ns")
      }
      // default gate (r14): BELOW the node cap the round hints the SHARES
      // side into the join build — never the graph-sized edge table, whose
      // per-round broadcast rebuild is exactly what the checkpoint's
      // unknown stats otherwise produce. The broadcast subtree must read
      // the share projection (rank DIV deg), not the edge cache.
      val hinted = scala.collection.mutable.ArrayBuffer.empty[(SparkPlan, String)]
      graft.operators.Graph.pagerank(edges, 1, roundProbe = (contrib, _) =>
        hinted += ((contrib.queryExecution.executedPlan, planOf(contrib))))
      val (hp, hs) = hinted.head
      val bsubs = hp.collect { case e: BroadcastExchangeExec => e }
      assert(bsubs.size == 1,
        s"gated round: expected exactly the shares broadcast, got ${bsubs.size}:\n$hs")
      assert(bsubs.head.toString.contains("div"),
        s"the broadcast build must be the share projection (rank DIV deg), " +
          s"not the edge cache:\n$hs")
      assert(shuffles(hp) == 1, s"gated round must stay ONE exchange:\n$hs")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("snapshot diff is ONE full-outer shuffle join over pruned snapshots") {
    val plan = planOf(ScaleQueries.snapshotDiff(spark, sfDir))
    assert(plan.contains("FullOuter"), s"expected a full-outer join:\n$plan")
    // o_orderdate/o_comment etc. must be pruned from the scan
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("o_comment") && !readSchema.contains("o_orderdate"),
      readSchema)
  }

  test("ts_topk_series plans a distributed TakeOrdered and broadcasts the k survivors") {
    val plan = planOf(AnalyticsQueries.tsTopkSeries(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k selection must be TakeOrdered, not a global rank window:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the k-row rank table must broadcast onto the slot table:\n$plan")
  }

  test("text_entropy's float accumulation windows over the bounded histogram, not tokens") {
    val plan = planOf(ScaleQueries.textEntropy(spark, sfDir))
    val lines = plan.linesIterator.toSeq
    val winIdx = lines.indexWhere(_.contains("Window"))
    assert(winIdx >= 0 && lines.drop(winIdx).exists(_.contains("HashAggregate")),
      s"the running sum must consume the counts-of-counts aggregate:\n$plan")
  }

  test("inverted postings partial-aggregate tf before any exchange") {
    val plan = planOf(ScaleQueries.invertedPostings(spark, sfDir))
    assert(plan.contains("partial_count") || plan.contains("partial_"),
      s"per-(token, doc) tf must map-side combine:\n$plan")
  }

  test("rollup/cube levels derive from base groups: no Expand over raw rows") {
    // Spark's native rollup()/cube() replicate every scan row once per
    // grouping set through an Expand operator; the rewrite must never
    assert(!planOf(AnalyticsQueries.olapRollup(spark, sfDir)).contains("Expand"))
    assert(!planOf(AnalyticsQueries.olapCube(spark, sfDir)).contains("Expand"))
  }

  test("scd2 intervals plan a single exchange for both window passes") {
    val plan = planOf(ScaleQueries.scd2Intervals(spark, sfDir))
    val dataExchanges = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(dataExchanges == 1,
      s"both windows share partitioning — expected exactly 1 hash exchange, got $dataExchanges:\n$plan")
  }

  // (the r8 "frame-path argmin reuses the corpus partitioning" pin is
  // retired with the k-row fan itself: the assignment no longer has a
  // groupBy to keep exchange-free — see the k > 100 audit below)

  test("kmeans centroid sums use the vec_sum_scaled kernel, never a row explode") {
    // the Lloyd iteration must shuffle k ARRAY rows (ObjectHashAggregate
    // over vec_sum_scaled with a partial_ stage), not k·dim exploded rows:
    // a Generate(posexplode) in the plan means dim hash-agg probes per
    // vector crept back in
    val rnd = new scala.util.Random(3)
    val emb = (0L until 64L).map(i => (i, Seq.fill(8)(rnd.nextDouble())))
      .toDF("vec_id", "v")
    import org.apache.spark.sql.functions.{col, lit}
    val plan = planOf(graft.operators.Clustering.kmeans(emb, "vec_id", "v", 4, 1)._1)
    // the returned frame is a checkpoint; audit the iteration plan instead
    val iterPlan = planOf(
      emb.select(col("vec_id").as("__id"), col("v").as("__v"))
        .groupBy(lit(0).as("__cl"))
        .agg(graft.functions.VecAgg.vecSumScaled(col("__v"))))
    assert(iterPlan.contains("ObjectHashAggregate") &&
      iterPlan.contains("partial_vec_sum_scaled"),
      s"kernel aggregate with a map-side partial stage expected:\n$iterPlan")
    assert(!iterPlan.contains("Generate"), s"no explode on the sums path:\n$iterPlan")
    assert(plan.nonEmpty) // kmeans itself ran through the kernel path
  }

  test("frame-path kmeans assignment is a zero-exchange argmin loop — no n-by-k row fan (k > 100)") {
    // 130 distinct ids, k = 120 — past LiteralAssignMax, the production
    // frame path. frameAssignForAudit builds the per-iteration assignment
    // with the SAME builder kmeansFrame loops over. r9: the assignment is
    // a mapPartitions argmin over the broadcast centroid matrix; the old
    // crossJoin+groupBy fan materialized n*k rows per iteration (1.2e9 at
    // the 100x corpus — dedup_semantic at 20 minutes), so the pin now is
    // its ABSENCE: no join of any kind, no exchange, no re-aggregation in
    // the per-iteration plan.
    val rnd = new scala.util.Random(7)
    val emb = (0L until 130L).map(i => (i, Seq.fill(6)(rnd.nextDouble())))
      .toDF("vec_id", "v")
    val (e, assign) =
      graft.operators.Clustering.frameAssignForAudit(emb, "vec_id", "v", 120)
    e.count()        // materialize the corpus cache
    assign.collect() // executedPlan under AQE is only final after execution
    val plan = assign.queryExecution.executedPlan.toString
    e.unpersist()
    // audit the operators above the cached corpus scan (the
    // InMemoryRelation subtree prints the cache's BUILD lineage)
    val iterOnly = plan.split("InMemoryRelation")(0)
    assert(iterOnly.contains("MapPartitions"),
      s"assignment must be the argmin mapPartitions loop:\n$plan")
    for (bad <- Seq("BroadcastNestedLoopJoin", "Join", "Exchange hashpartitioning",
                    "HashAggregate"))
      assert(!iterOnly.contains(bad),
        s"per-iteration assignment must not contain $bad (the n*k fan is back):\n$plan")
  }

  test("kmeans Lloyd round: ONE exchange per iteration, k-row centroids, corpus never broadcast") {
    // round-11 verdict #5: embed_kmeans / dedup_semantic's per-iteration
    // frames are checkpoint-erased, so nothing pinned the LIVE loop the way
    // pagerank's roundProbe pin does. The probe sees each iteration's
    // centroid/sums plan pre-checkpoint/pre-collect, where the plan is
    // visible. Pinned on BOTH Lloyd paths:
    //  - frame path (k > LiteralAssignMax, the 100x production path) via the
    //    judged entry kmeansAdaptive: per-iteration = mapPartitions argmin
    //    over the cached canonical corpus -> partial vec_sum_scaled -> ONE
    //    shuffle -> final aggregate. Centroids never exceed k rows.
    //  - literal path (small k) via kmeansImpl: same single-exchange shape.
    // AQE/auto-broadcast off as in the pagerank pin: a toy-scale planner
    // would legitimately broadcast and hide the structural exchanges.
    val conf = spark.conf
    val saved = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
      import org.apache.spark.sql.execution.joins.CartesianProductExec
      def shuffles(p: SparkPlan): Int = p.collect { case e: ShuffleExchangeExec => e }.size
      def bcasts(p: SparkPlan): Int = p.collect { case e: BroadcastExchangeExec => e }.size
      def carts(p: SparkPlan): Int = p.collect { case e: CartesianProductExec => e }.size
      // vacuity guard for the counters themselves: a frame with a known
      // join-over-two-groupBys shape must count > 1 exchange
      val twoShuffle = spark.range(100).toDF("a").groupBy("a").count()
        .join(spark.range(100).toDF("a").groupBy("a").sum("a"), "a")
        .queryExecution.executedPlan
      assert(shuffles(twoShuffle) >= 2, s"shuffle counter is broken:\n$twoShuffle")

      val rnd = new scala.util.Random(11)
      def runAndPin(tag: String, iters: Int)(
          run: (org.apache.spark.sql.DataFrame => Unit) => Unit): Unit = {
        val probed = scala.collection.mutable.ArrayBuffer.empty[(SparkPlan, String)]
        run(df => {
          df.count() // executedPlan is only final after execution
          probed += ((df.queryExecution.executedPlan, planOf(df)))
          // centroids/sums never exceed k rows — the aggregate is BY __cl
          assert(df.count() <= 130, s"$tag: per-iteration frame exceeded k rows")
        })
        assert(probed.size == iters, s"$tag: probe fired ${probed.size} != $iters times — pin is vacuous")
        for (((p, s), i) <- probed.zipWithIndex) {
          assert(carts(p) == 0, s"$tag iter ${i + 1}: cartesian product:\n$s")
          assert(bcasts(p) == 0,
            s"$tag iter ${i + 1}: nothing in a Lloyd round may broadcast (corpus side must stream):\n$s")
          assert(shuffles(p) == 1,
            s"$tag iter ${i + 1}: a Lloyd round is exactly ONE exchange (the k-row sums groupBy), got ${shuffles(p)}:\n$s")
          assert(s.contains("partial_vec_sum_scaled"),
            s"$tag iter ${i + 1}: centroid sums must map-side combine through the kernel:\n$s")
        }
      }
      // frame path through the JUDGED entry (adaptive k = ceil(sqrt(10500)) =
      // 103 > LiteralAssignMax): 10500 distinct vectors, weighted canonical run
      val big = (0L until 10500L).map(i => (i, Seq.fill(4)(rnd.nextDouble())))
        .toDF("vec_id", "v")
      runAndPin("frame path (kmeansAdaptive)", iters = 2)(probe =>
        graft.operators.Clustering.kmeansAdaptive(big, "vec_id", "v", 2,
          roundProbe = probe))
      // literal path (k = 5 << LiteralAssignMax)
      val small = (0L until 200L).map(i => (i, Seq.fill(4)(rnd.nextDouble())))
        .toDF("vec_id", "v")
      runAndPin("literal path (kmeansImpl)", iters = 2)(probe =>
        graft.operators.Clustering.kmeansImpl(small, "vec_id", "v", 5, 2,
          useFrame = false, roundProbe = probe))
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("admin paths never collect row data to the driver (grep gate)") {
    // the admin path (catalog registration / recovery rebuild / delete /
    // rehash) must stay fully in-plan: at the reference's 3M-metric estate
    // a metric-name collect is ~100s of MB of driver heap. Bounded k-row
    // collects live in serving (capped) and clustering (k centroids), not
    // here.
    for (f <- Seq("storage/Catalog.scala", "ops/Admin.scala")) {
      val src = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"src/main/scala/graft/$f")),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(!src.contains(".collect()"),
        s"$f must not collect row data to the driver")
    }
  }

  test("target sumSeries partial-aggregates before the exchange (series fan-in map-side)") {
    val plan = planOf(TargetQueries.tsTargetAgg(spark, sfDir))
    assert(plan.contains("partial_sum"),
      s"cross-series sum must partial-aggregate per task:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("target divideSeries broadcasts the bounded divisor, never a sort-merge join") {
    val plan = planOf(TargetQueries.tsTargetRatio(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      s"divisor join must be broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"series data must not shuffle for the divide:\n$plan")
  }

  test("target highestAverage reduces to a broadcast left-semi of k winners") {
    val base = TargetQueries.targetBase(spark, sfDir)
    val df = graft.serving.TargetEval.eval(
      graft.serving.TargetLang.parse("highestAverage(app.*.u*,2)"),
      glob => graft.serving.TargetEval.globFilter(base, glob))
    val plan = planOf(df)
    assert(plan.contains("LeftSemi") && plan.contains("BroadcastExchange"),
      s"winner selection must be a broadcast semi-join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"series data must not shuffle to join winners:\n$plan")
  }

  test("target named filters evaluate as one pass — no join, one metric exchange for filter+window") {
    // the ts_target_select shape: averageAbove's per-series statistic is a
    // metric-partitioned window over ONE pass of the rollup (no second
    // compute of the upstream, no winner broadcast — unbounded at estate
    // scale), and movingSum's per-series window rides the SAME metric
    // partitioning: one hashpartitioning(metric) exchange serves both.
    val plan = planOf(TargetQueries.tsTargetSelect(spark, sfDir))
    assert(!plan.contains("Join") && !plan.contains("BroadcastExchange") &&
      !plan.contains("CartesianProduct"),
      s"threshold filter must be a window, never a join or broadcast:\n$plan")
    // single-key metric partitioning only: the base rollup's own
    // hashpartitioning(metric, ts) exchange is a different (and expected)
    // shuffle
    val metricExchanges =
      "hashpartitioning\\(metric#\\d+, \\d+\\)".r.findAllIn(plan).size
    assert(metricExchanges == 1,
      s"filter stat + movingSum must share ONE metric exchange, saw $metricExchanges:\n$plan")
    // and the stat did not silently degrade to a whole-frame window
    assert(plan.contains("windowspecdefinition(metric"),
      s"per-series statistic must partition its window by metric:\n$plan")
  }

  test("target wildcard-strip aggregation partial-aggregates; offsetToZero adds no join") {
    val plan = planOf(TargetQueries.tsTargetWild(spark, sfDir))
    assert(plan.contains("partial_sum"),
      s"stripped-name sum must partial-aggregate per task:\n$plan")
    // offsetToZero is a whole-partition window, not a min-table join
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin") &&
      !plan.contains("CartesianProduct"),
      s"per-series min must be a window, never a join:\n$plan")
  }

  test("target percentileOfSeries shares one ts exchange across both rank windows") {
    // isolate the percentile step from the base rollup's own exchange:
    // the sort-based rank (row_number in value order + non-null count,
    // both over the ts partitioning) must plan ONE hash exchange shared
    // by the two windows — never a second shuffle, a join, or the
    // collect_list array shape that died at the million-series mark
    val base = (0 until 100).map(i => (s"m.${i % 5}", (i / 5) * 10L, i.toDouble))
      .toDF("metric", "ts", "value")
    val df = graft.serving.TargetEval.eval(
      graft.serving.TargetLang.parse("percentileOfSeries(m.*,95)"),
      glob => graft.serving.TargetEval.globFilter(base, glob))
    val plan = planOf(df)
    val dataExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(dataExchanges == 1,
      s"rank percentile is ONE groupBy(ts) — expected exactly 1 hash exchange, got $dataExchanges:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"), plan)
  }

  test("corpus_overlap assembles its bounded aggregate frames by broadcast, never SMJ") {
    // the per-source estimates, pair-union estimates, and exact-intersection
    // counts are all ≤ sources² rows; without the broadcast hints Spark's
    // unknown-stats default planned 4 sort-merge joins here (first PlanDump
    // census finding)
    val plan = planOf(PipelineQueries.corpusOverlap(spark, sfDir))
    assert(!plan.contains("SortMergeJoin"),
      s"overlap assembly must broadcast its bounded frames:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("seriesByTag predicates evaluate in the scan stage — no pre-filter exchange") {
    // a tag filter is string predicates over the metric column: it must
    // run against the scanned frame directly, with the first exchange in
    // the plan being the downstream aggregation, never a repartition to
    // evaluate the filter
    // parquet-backed so the filter survives to the physical plan (a local
    // table folds the predicates away at optimization time)
    val pq = s"$root/tagscan.parquet"
    (0 until 100).map(i => (s"cpu;dc=d${i % 4};host=h$i", (i / 4) * 10L, i.toDouble))
      .toDF("metric", "ts", "value").write.mode("overwrite").parquet(pq)
    val base = spark.read.parquet(pq)
    val df = graft.serving.TargetEval.eval(
      graft.serving.TargetLang.parse("groupByTags(seriesByTag('name=cpu','dc=d1'),'sum','dc')"),
      glob => graft.serving.TargetEval.globFilter(base, glob))
    val plan = planOf(df)
    val filterLine = plan.linesIterator.indexWhere(_.contains("Filter"))
    val exchangeLine = plan.linesIterator.indexWhere(_.contains("Exchange"))
    assert(filterLine >= 0, s"tag filter missing:\n$plan")
    // executedPlan prints top-down: the groupBy exchange must sit ABOVE
    // the filter (i.e., appear earlier), meaning the filter runs pre-shuffle
    assert(exchangeLine >= 0 && exchangeLine < filterLine,
      s"tag filter must evaluate below the aggregation exchange:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
  }
}
