package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines over
  * `documents(doc_id, text, ...)`. Scale posture:
  *  - exact dedup = one hash-groupBy shuffle on a 32-byte digest (never on
  *    the raw text);
  *  - near-dup methods (minhash-LSH, simhash, n-gram Jaccard) all follow the
  *    candidate-generation pattern: explode to (signature-part, doc) rows,
  *    collect each equal-signature bucket with a CAPPED imperative aggregate
  *    ([[graft.functions.BucketAgg]]), explode only the surviving buckets'
  *    pairs, verify. Pair blowup is bounded by the bucket caps, not O(n^2),
  *    and the caps bound per-group aggregation state at any corpus size;
  *    all hashing is md5-based so the DuckDB oracles can reproduce it
  *    bit-for-bit.
  */
object Dedup {

  /** Portable deterministic 32-bit hash: first 8 hex chars of md5 as a long
    * (same expression exists in DuckDB: ('0x'||substr(md5(x),1,8))::bigint).
    */
  def h32(c: Column): Column = conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Seeded variant for minhash families. */
  def h32(seed: Int, c: Column): Column = h32(concat(lit(s"s$seed:"), c))

  /** Exact dedup: group by content digest, keep the smallest doc_id as
    * canonical, count members. One shuffle on the digest.
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), md5(col("text")).as("digest"))
      .groupBy(col("digest"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_dups"))

  /** One representative row per duplicate group (min id — the same
    * canonical exact() reports): the shared preamble of every near-dup
    * path, collapsing exact-duplicate clusters before the quadratic-ish
    * candidate joins. `key` is the duplicate-group key (a content digest
    * for text, the vector itself for embeddings); `rest` columns carry
    * through from the winning row.
    */
  def canonicalize(df: DataFrame, idCol: String, key: Column,
                   rest: Seq[String]): DataFrame =
    df.groupBy(key.as("__k"))
      .agg(min_by(struct(col(idCol) +: rest.map(col): _*), col(idCol)).as("__c"))
      .select(col(s"__c.$idCol") +: rest.map(c => col(s"__c.$c")): _*)

  /** Word w-shingles of the lowercased text, distinct per doc.
    * Output: (doc_id, shingle). One codegen'd pass per doc
    * (graft.functions.TextKernels.shingleSet) — the transform()/slice()
    * composition it replaces ran interpreted per shingle; a doc shorter
    * than w tokens yields no rows (empty array explodes to nothing).
    */
  def shingles(docs: DataFrame, w: Int): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.functions.TextKernels.wordShingles(
        TextAnalysis.tokens(col("text")), w)).as("shingle"))

  /** The minhash family: hash k of a shingle is the k-th 8-hex-char window
    * of md5("s<k/4>:"+shingle) — one md5 digest yields four 32-bit hashes,
    * so an H-hash family costs ceil(H/4) digests per shingle instead of H.
    */
  def minhashFamily(shingle: Column, numHashes: Int): Seq[Column] = {
    val digests = (0 to (numHashes - 1) / 4)
      .map(d => md5(concat(lit(s"s$d:"), shingle)))
    (0 until numHashes).map { k =>
      conv(substring(digests(k / 4), (k % 4) * 8 + 1, 8), 16, 10).cast("long")
    }
  }

  /** DuckDB equivalent of minhashFamily(k) (for oracle generation). */
  def minhashFamilySql(shingle: String, k: Int): String =
    s"('0x'||substr(md5('s${k / 4}:' || $shingle), ${(k % 4) * 8 + 1}, 8))::BIGINT"

  /** MinHash signatures: for each of `numHashes` hash functions, the min
    * hash over the doc's shingle set. Output: (doc_id, sig array<long>).
    * ONE codegen'd kernel call per document — no shingle explode, no
    * groupBy shuffle (round 13: the old explode + minhashWindows +
    * agg(min...) shape pushed 263M shingle rows through the hash aggregate
    * at the 100x corpus; the per-row explode/agg machinery, not the md5
    * work, was most of the stage). Bit-identical to min-per-hash over
    * [[minhashFamily]], which remains as the composable/oracle-documented
    * definition; a doc shorter than w tokens yields an empty signature and
    * is dropped, exactly as the explode shape emitted no row for it.
    */
  def minhashSignatures(docs: DataFrame, w: Int, numHashes: Int): DataFrame = {
    // the short-doc filter runs on the CHEAP token count BELOW the kernel
    // projection — a filter above it on size(sig) collapses into the
    // projection and evaluates the whole md5 signature twice per row
    // (measured: +60% on the signature stage at the 100x corpus)
    val toks = TextAnalysis.tokens(col("text"))
    docs
      .where(size(toks) >= w)
      .select(col("doc_id"),
        graft.functions.HashKernels.minhashSignature(toks, w, numHashes).as("sig"))
  }

  /** MinHash + LSH candidate pairs: band the signature into `bands` bands of
    * `rowsPerBand` values; docs sharing any full band become a candidate pair.
    * Output: distinct (a, b) with a < b. Join happens only within equal band
    * buckets — the standard sub-quadratic near-dup path at 100 TB.
    */
  /** Banded minhash signatures: (doc_id, band, band_key) — the LSH collision
    * key rows shared by the batch near-dup join and the streaming
    * incremental probe.
    */
  def bandedSignatures(docs: DataFrame, w: Int, bands: Int,
                       rowsPerBand: Int): DataFrame =
    minhashSignatures(docs, w, bands * rowsPerBand)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")

  def minhashLshPairs(docs: DataFrame, w: Int, bands: Int, rowsPerBand: Int,
                      bucketCap: Int = 100): DataFrame = {
    // ONE aggregation for the whole candidate stage (round 13): collect
    // each (band, band_key) bucket's member ids with a CAPPED imperative
    // aggregate, then explode each surviving bucket into its unordered
    // pairs. Replaces the round-11 cached-repartition shape (bucket-count
    // aggregate + cap semi-join + sort-merge self-join over a 20M-row
    // cache): measured at the 100x corpus 16.0-17.5 s vs 24.1-31.5 s
    // end-to-end, bit-identical pair set (symdiff 0 over 18.59M pairs).
    // Exactly two exchanges end-to-end — the aggregation's and the final
    // distinct's — with no cache to own and no SMJ sorts.
    //
    // bucket-size cap: a band bucket holding k docs emits k^2/2 pairs; on
    // boilerplate-heavy corpora one mega-bucket reintroduces the quadratic
    // blowup LSH exists to avoid. cappedCollectLong evaluates such buckets
    // to null with BOUNDED buffer state (a billion-member bucket costs one
    // overflow flag, never a collected list) — their members are
    // (near-)identical boilerplate better handled by exact dedup, and any
    // pair inside one still collides in its other bands unless the docs
    // agree on nothing else.
    import graft.functions.BucketAgg
    bandedSignatures(docs, w, bands, rowsPerBand)
      .groupBy(col("band"), col("band_key"))
      .agg(BucketAgg.cappedCollectLong(col("doc_id"), bucketCap).as("members"))
      .where(col("members").isNotNull)
      .select(explode(BucketAgg.pairsOf(col("members"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
  }

  /** n-gram Jaccard similarity for candidate pairs that share at least one
    * shingle: |A ∩ B| / |A ∪ B| over distinct shingles. `minJaccard` filters
    * the output. The shared-shingle equi-join is the candidate generator;
    * exact Jaccard verifies.
    */
  def ngramJaccardPairs(docs: DataFrame, w: Int, minJaccard: Double,
                        dfCap: Int = 100): DataFrame = {
    import graft.functions.BucketAgg
    // canonicalize exact duplicates first: k copies of one text would turn
    // every shared-shingle key into a k-times-hotter join key and emit
    // C(k,2) jaccard=1 pairs per copy group — information exact dedup
    // already carries. At 10x duplication this is the difference between
    // linear and quadratic.
    val canon = canonicalize(docs.select(col("doc_id"), col("text")),
      "doc_id", md5(col("text")), Seq("text"))
    // hash-join key is the 32-bit shingle hash: 8-byte shuffle keys, and
    // collisions affect intersections and sizes identically (standard
    // hashed-shingle Jaccard). The per-shingle DISTINCT-member collect
    // replaces the round-11 cached shape (repartition + dropDuplicates +
    // df aggregate + cap semi-join + sort-merge self-join): one
    // aggregation builds each shingle's distinct-doc bucket directly —
    // the distinct mode absorbs within-doc 32-bit hash collisions, the
    // cap bounds per-group state (an over-cap boilerplate shingle costs
    // one overflow flag), and exploding each bucket's pairs then counting
    // per (a, b) is the same intersection count the self-join computed,
    // without sorting the 200M-row shingle table twice.
    //
    // document-frequency cap: a shingle present in k docs contributes k^2
    // candidate rows — common phrases ("all rights reserved") become
    // unbounded-skew mega-keys at corpus scale. Shingles with df > dfCap
    // are boilerplate, not signal: drop them from the shingle sets
    // entirely (Jaccard is then over the informative shingles).
    //
    // cache lifetime is caller-owned (Verify/Bench/TimeOne clearCache):
    // buckets feed BOTH the per-doc sizes and the intersection counts.
    val buckets = shingles(canon, w)
      .select(col("doc_id"), h32(col("shingle")).as("shingle"))
      .groupBy(col("shingle"))
      .agg(BucketAgg.cappedCollectLongDistinct(col("doc_id"), dfCap).as("members"))
      .where(col("members").isNotNull)
      .cache()
    // per-doc capped-set sizes: one row per doc — cached so the a- and
    // b-side joins below don't re-derive it from the bucket cache twice
    val sizes = buckets.select(explode(col("members")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n")).cache()
    val inter = buckets
      .where(size(col("members")) >= 2)
      .select(explode(BucketAgg.pairsOf(col("members"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), "b")
      .withColumn("jaccard",
        round(col("n_inter").cast("double") /
          (col("na") + col("nb") - col("n_inter")).cast("double"), 6))
      .where(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Substring-level duplicate pairs via winnowed char-gram fingerprints
    * (graft.functions.WinnowKernel — the MOSS local-sampling scheme): pairs
    * (a < b) of canonical documents sharing >= `minShared` winnowed
    * fingerprints, with the shared count. Finds duplicated SPANS that
    * whole-document shingle measures dilute away (a long page embedding a
    * copied block); any span of length >= k + w - 1 codepoints shared by
    * two documents guarantees a shared fingerprint.
    *
    * Same bounded-state candidate shape as [[ngramJaccardPairs]]: one
    * kernel call per document (no per-position rows), explode the ~2/(w+1)
    * density fingerprint set, ONE capped distinct-bucket aggregation per
    * fingerprint (an over-`dfCap` boilerplate fingerprint costs one
    * overflow flag and is dropped — df-capped like shingles), pair-explode
    * the surviving buckets and count shared fingerprints per pair. Nothing
    * is all-pairs; the blowup is bounded by dfCap^2 per fingerprint. The
    * dual-channel ~62-bit hash makes accidental cross-document fingerprint
    * collisions negligible at corpus scale, so `n_shared` is signal.
    */
  def winnowSubstringPairs(docs: DataFrame, k: Int, w: Int,
                           dfCap: Int, minShared: Int): DataFrame = {
    import graft.functions.{BucketAgg, WinnowKernel}
    // exact-duplicate canonicalization first, as in every near-dup kernel:
    // verbatim copies would only re-derive what exact dedup carries
    val canon = canonicalize(docs.select(col("doc_id"), col("text")),
      "doc_id", md5(col("text")), Seq("text"))
    val fps = canon.select(col("doc_id"),
      explode(WinnowKernel.winnowFingerprints(col("text"), k, w)).as("fp"))
    val buckets = fps.groupBy(col("fp"))
      .agg(BucketAgg.cappedCollectLongDistinct(col("doc_id"), dfCap).as("members"))
      .where(col("members").isNotNull && size(col("members")) >= 2)
    buckets.select(explode(BucketAgg.pairsOf(col("members"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Connected components over an undirected near-dup pair graph — the step
    * that turns pairwise matches into dedup CLUSTERS (one canonical doc per
    * component). Min-label propagation: every node starts as its own label;
    * each round a node takes the min label among itself and its neighbors;
    * converged labels = component minima.
    *
    * Each round is one self-contained join+groupBy over the edge list —
    * the standard scalable formulation (no driver-side union-find, no
    * collected graph). Rounds needed = graph diameter; near-dup components
    * are band-clique-shaped (diameter ~2), so a small fixed `iters` both
    * converges and keeps the SQL oracle expressible as the same unrolled
    * rounds. ConvergedSpec asserts fixpoint on the test corpus.
    */
  /** Symmetrized edge table WITH self-loops, pre-partitioned by src and
    * cached — the fixed side of every propagation round. Self-loops make
    * min(own label, neighbor min) collapse to one join + one groupBy per
    * round; pre-partitioning by src means the per-round groupBy needs NO
    * exchange (the cached scan's hash-partitioning satisfies the
    * aggregation), so a round is zero-shuffle — one broadcast of the
    * bounded label table + an in-place aggregation. Measured 4x on the
    * whole propagation vs re-shuffling each round (AQE re-plans every
    * materialized stage).
    */
  private[graft] def ccEdges(pairs: DataFrame): DataFrame = {
    val sym = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
    sym
      .unionByName(sym.select(col("src")).distinct()
        .select(col("src"), col("src").as("dst")))
      .repartition(col("src"))
      .cache()
  }

  /** One min-label round: labels broadcast (one row per pair-graph node,
    * bounded by near-dup density), edges never leave their partitions.
    */
  private[graft] def ccRound(edges: DataFrame, labels: DataFrame): DataFrame =
    edges.join(broadcast(labels.withColumnRenamed("node", "dst")), "dst")
      .groupBy(col("src").as("node"))
      .agg(min(col("label")).as("label"))

  /** Partition-local union-find over the symmetrized edge stream: each
    * partition unions every edge it holds (union-by-min, so a local root is
    * the minimum node id of its partition-local component) and emits one
    * (node, root) row per node it saw. A node's src-adjacency is colocated
    * (edges arrive hash-partitioned by src), so band-clique components —
    * the common near-dup shape — collapse to a single root before any
    * global round. Driver-free and single-pass; per-task memory is
    * O(distinct nodes in the partition), the same order as the edge
    * partition itself.
    */
  private[graft] def localRoots(sym: DataFrame): DataFrame = {
    val ss = sym.sparkSession
    import ss.implicits._
    sym.as[(Long, Long)].mapPartitions { it =>
      val parent = new java.util.HashMap[Long, Long]()
      def find(x0: Long): Long = {
        var x = x0
        var p = parent.get(x)
        while (p != x) { x = p; p = parent.get(x) }
        // path compression: point the walked chain at the root
        var y = x0
        while (y != x) { val n = parent.get(y); parent.put(y, x); y = n }
        x
      }
      while (it.hasNext) {
        val e = it.next()
        parent.putIfAbsent(e._1, e._1)
        parent.putIfAbsent(e._2, e._2)
        val ra = find(e._1); val rb = find(e._2)
        if (ra != rb) {
          if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
      val keys = parent.keySet().toArray(new Array[java.lang.Long](parent.size()))
      keys.iterator.map(n => (n.longValue(), find(n.longValue())))
    }.toDF("node", "root")
  }

  /** Connected components with partition-local pre-contraction. Phase 1:
    * [[localRoots]] collapses each partition's components to their min-id
    * root. Phase 2: the CONTRACTED graph — for every node, a star from its
    * min local root to its other local roots (roots of one node are
    * provably in one component, and every original edge put its two
    * endpoints under one shared local root, so the quotient preserves
    * exactly the original components) — is labeled either by exact
    * driver-side union-find (when it fits under [[DriverFinishMaxEdges]];
    * round 12) or by the global min-label rounds. Phase 3: node label =
    * global label of its min local root.
    *
    * Bit-identical to min-label over the raw graph: the component's global
    * min node is always its own local root (union-by-min can only point it
    * at something smaller, and nothing is smaller), so it survives
    * contraction and wins the global min. What the contraction buys at
    * scale: the per-round broadcast shrinks from ALL pair-graph nodes to
    * the cross-partition roots only (typically 100x fewer), and the rounds
    * scan the contracted star edges instead of the full pair graph.
    * Measured at the 10x corpus (same box, same hour): 4.9 s vs 17.6 s
    * for the uncontracted rounds — and vs 9.3 s for single-node DuckDB on
    * the identical unrolled-rounds SQL, the one contest the engine was
    * losing at 10x in round 8 (bench/CROSSOVER_r8.md).
    */
  /** Edge lists with at most this many edges finish on the driver (exact
    * union-find) instead of going through contraction + distributed
    * min-label rounds. 20M edges collect to 320 MB of primitive longs (the
    * collect packs per-partition long arrays — no Row/tuple boxing), the
    * same order as the broadcast the stitch join pays anyway (the per-round
    * loop ALSO collects the full label table every round to broadcast it,
    * so the driver path moves strictly less data). Applied twice, tiered:
    * first to the RAW pair list (skipping contraction entirely — at the
    * 100x corpus the contraction stage was ~18-30 s shrinking an 18.6M-edge
    * graph the driver handles in ~2 s), then — for pair graphs too big to
    * collect — to the CONTRACTED cross-partition root graph; only a graph
    * huge after both reductions pays the distributed rounds.
    */
  private val DriverFinishMaxEdges = 20000000L

  /** Node cap for the driver union-find — the edge cap alone guards the
    * wrong quantity (round-12 verdict): the collected chunks are bounded by
    * edges (320 MB at 20M), but the union-find map holds NODES, up to
    * 2x the edge count on a pathological matching-shaped graph. At this cap
    * the open-addressing map (power-of-2 capacity, 0.7 load) tops out at
    * 32M slots = 512 MB, the interleaved (node,label) output array at
    * 256 MB, and the edge chunks at 320 MB — a documented <1.2 GB peak
    * (plus 2x 512 MB transiently when the convergence audit runs). The
    * guard trips MID-BUILD and spills to the next tier (contraction /
    * distributed rounds), so a hostile graph can't OOM the driver; near-dup
    * clique graphs have nodes ≪ edges, so real corpora stay far under it
    * (the 100x corpus: 18.59M edges).
    */
  private val DriverFinishMaxNodes = 16000000L

  def clusterLabels(pairs: DataFrame, iters: Int,
                    checkConverged: Boolean = false,
                    driverFinishMaxEdges: Long = DriverFinishMaxEdges): DataFrame = {
    val dbg = sys.env.contains("GRAFT_CC_DEBUG")
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      if (dbg) println(f"CCDEBUG stage=$name ${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }
    // materialize the pair list ONCE before symmetrizing: the union below
    // references `pairs` twice, and without a checkpoint BOTH branches
    // re-run the whole candidate pipeline — at the 100x corpus the
    // banding self-join + distinct is ~25-35 s, and it was being paid
    // twice (round-12 profile: the label rounds the round-11 lane blamed
    // were ~3 s of a ~70 s query; the duplicated pair generation was the
    // actual cost). A frame that is ALREADY a checkpointed long (a, b)
    // RDD — the memoized pair seam, round 13 — is used as-is instead of
    // paying a second materialization scan.
    val typedOk = pairs.schema.length == 2 &&
      pairs.schema.head.name == "a" && pairs.schema(1).name == "b" &&
      pairs.schema.forall(_.dataType == org.apache.spark.sql.types.LongType)
    val cast =
      if (typedOk) pairs
      else pairs.select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
    val p = timed("pairs")(
      if (typedOk && cast.queryExecution.analyzed.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]) cast
      else cast.localCheckpoint())
    // Tier 1 — the whole pair list fits on the driver: exact union-find
    // directly over it, no contraction, no stitch (round-12 profile: the
    // contraction stage — symmetrize + repartition + local union-find +
    // groupBy/collect_set + checkpoint — was ~26 s of the ~59 s query at
    // the 100x corpus, all spent shrinking a graph that was ALREADY small
    // enough to collect: near-dup pair graphs are sparse because the
    // bucket caps bound every key's fan-out). The count is a cheap scan of
    // the checkpoint blocks.
    val np = timed("pairs_count")(p.count())
    if (np <= driverFinishMaxEdges) {
      // checkConverged on a driver tier: the union-find is exact for any
      // diameter, so the loud require() the distributed loop had would
      // never fire here — but the ORACLE (dedupClustersSql) still unrolls a
      // fixed `iters` min-label rounds, so a component with diameter >
      // iters would surface as a confusing oracle mismatch (engine exact,
      // oracle unconverged). The audit simulates the synchronous rounds on
      // the collected graph (cheap — one edge scan per round) and fails
      // loudly instead (round-12 ADVICE).
      val auditRounds = if (checkConverged) iters else 0
      timed("driver_uf")(driverUnionFind(p, DriverFinishMaxNodes, auditRounds)) match {
        case Some(labels) =>
          if (dbg) println(s"CCDEBUG pairs=$np tier=driver-raw")
          return labels
        case None =>
          if (dbg) println(s"CCDEBUG pairs=$np driver-raw node cap tripped -> contraction")
      }
    }
    // past tier 1 the inline convergence audit can only see the CONTRACTED
    // graph — a lower bound on the raw graph's synchronous round count, so
    // a fixed-round oracle (dedupClustersSql) may be unconverged even when
    // the audit passes. Say so loudly; the exact raw-graph audit is
    // graft.CcScale / syncConvergenceRounds run offline.
    if (checkConverged)
      System.err.println(
        s"[dedup] WARN clusterLabels: graph ($np edges) exceeded the tier-1 " +
          "driver caps — the inline convergence audit now covers only the " +
          "contracted graph (a LOWER bound); re-validate any fixed-round " +
          "oracle budget with the exact raw-graph audit (graft.CcScale)")
    val sym = p.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(p.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("src"))
    // one (node, min root, all roots) row per node; materialized once —
    // both the contracted edges and the final stitch read it
    val grouped = timed("contract")(localRoots(sym).groupBy(col("node"))
      .agg(min(col("root")).as("rmin"), collect_set(col("root")).as("roots"))
      .localCheckpoint())
    val cpairs = grouped
      .select(col("rmin"), explode(col("roots")).as("r"))
      .where(col("r") =!= col("rmin"))
      .select(col("rmin").as("a"), col("r").as("b")) // rmin < r by construction
      .distinct()
    // Tier 2 — the pair graph is too big but its contraction fits: the
    // contracted graph is the cross-partition root adjacency, for LSH
    // clique graphs typically 100-1000x smaller than the pair graph.
    // Union-find on the driver replaces the per-round
    // join/broadcast/checkpoint cycle (round-11 verdict #1); union-by-min
    // makes each tree root the component minimum, so the labels are
    // bit-identical to the min-label fixpoint — and exact for ANY
    // diameter, so the `iters` budget (and checkConverged) only governs
    // the distributed fallback (tier 3).
    val cn = timed("cpairs_count")(cpairs.count())
    // the tier-2 convergence audit (and tier 3's require) runs over the
    // CONTRACTED graph — a lower bound on the raw graph's round count, so
    // the raw-graph oracle can still mismatch when only these tiers run;
    // the exact raw-graph audit is tier 1's (see dedupClustersSql)
    val rootLabels = timed("rounds") {
      (if (cn <= driverFinishMaxEdges)
         driverUnionFind(cpairs, DriverFinishMaxNodes, if (checkConverged) iters else 0)
       else None) match {
        case Some(labels) =>
          if (dbg) println(s"CCDEBUG pairs=$np cpairs=$cn tier=driver-contracted")
          labels
        case None =>
          if (dbg) println(s"CCDEBUG pairs=$np cpairs=$cn tier=rounds")
          minLabelLoop(cpairs, iters, checkConverged)
      }
    }
    // rootLabels is bounded by the cross-partition roots (tiny next to the
    // node count) — broadcast the stitch join; a root with no contracted
    // edges is its own converged label
    grouped
      .join(broadcast(rootLabels.withColumnRenamed("node", "rmin")), Seq("rmin"), "left")
      .select(col("node"), coalesce(col("label"), col("rmin")).as("label"))
  }

  /** Exact driver-side union-find over a collected edge list: returns one
    * (node, label = component min) row per node appearing in `pairs`, or
    * None when the graph's NODE count trips `maxNodes` mid-build — the
    * caller then falls back to the next tier (the edge cap alone bounds the
    * collected chunks but not the node map; round-12 verdict #3).
    * Union-by-min + full path compression — the root of every tree is the
    * smallest member, i.e. exactly the min-label fixpoint, with no round
    * budget to converge within.
    *
    * `auditRounds > 0` additionally simulates SYNCHRONOUS min-label rounds
    * over the same edges and requires a fixpoint within that many rounds —
    * the condition under which a fixed-round oracle formulation (the
    * dedup_clusters DuckDB CTE) matches the exact labels. One edge scan per
    * round; near-dup graphs converge in 2-3.
    *
    * Driver heap, at the caps (20M edges / 16M nodes): edge chunks 320 MB +
    * node map ≤512 MB + interleaved output array ≤256 MB, with the chunks
    * RELEASED before the output array is built so the two never coexist at
    * full size; the audit transiently adds two label maps (≤1 GB total).
    */
  private[graft] def driverUnionFind(pairs: DataFrame, maxNodes: Long,
                                     auditRounds: Int = 0): Option[DataFrame] = {
    val ss = pairs.sparkSession
    import ss.implicits._
    val dbg = sys.env.contains("GRAFT_CC_DEBUG")
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      if (dbg) println(f"CCDEBUG uf_stage=$name ${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }
    // collect as per-partition PRIMITIVE long arrays (a,b interleaved):
    // 20M edges land as 320 MB of longs instead of ~1 GB of boxed tuples
    var chunks: Array[Array[Long]] = timed("collect")(pairs.select(col("a"), col("b"))
      .queryExecution.toRdd.mapPartitions { it =>
        val buf = new scala.collection.mutable.ArrayBuilder.ofLong
        while (it.hasNext) { val r = it.next(); buf += r.getLong(0); buf += r.getLong(1) }
        Iterator.single(buf.result())
      }.collect())
    // the map holds NODES (bounded by 2x edges, typically far fewer), not
    // edges — edge scans stay on the primitive arrays; LongLongMap because
    // java.util.HashMap boxing dominated this stage (12.7 s -> primitive)
    val parent = new graft.core.LongLongMap()
    // find/union use `update` (repoint-existing, never grows), so the final
    // label sweep can compress paths while foreachEntry iterates the slots
    def find(x0: Long): Long = {
      var x = x0
      var pp = parent(x)
      while (pp != x) { x = pp; pp = parent(x) }
      var y = x0
      while (y != x) { val n = parent(y); parent(y) = x; y = n }
      x
    }
    val capTripped = timed("union") {
      var tripped = false
      var ci = 0
      while (ci < chunks.length && !tripped) {
        val chunk = chunks(ci)
        var i = 0
        while (i < chunk.length && !tripped) {
          val a = chunk(i); val b = chunk(i + 1)
          parent.putIfAbsent(a, a)
          parent.putIfAbsent(b, b)
          if (parent.size > maxNodes) tripped = true
          else {
            val ra = find(a); val rb = find(b)
            if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
          }
          i += 2
        }
        ci += 1
      }
      tripped
    }
    if (capTripped) return None
    if (auditRounds > 0) {
      val r = timed("audit")(syncConvergenceRounds(chunks, parent))
      if (dbg) println(s"CCDEBUG sync_convergence rounds=$r budget=$auditRounds")
      require(r <= auditRounds,
        s"clusterLabels: synchronous min-label needs $r rounds to converge, " +
          s"budget is $auditRounds — a fixed-round oracle would not match the " +
          "exact labels; raise iters")
    }
    // interleaved primitive (node, label) pairs; the edge chunks are dead
    // past this point — drop them before allocating the output so peak heap
    // is map + output, not map + output + edges (round-12 ADVICE)
    val nNodes = parent.size
    val out = timed("output") {
      chunks = null
      val arr = new Array[Long](2 * nNodes)
      var oi = 0
      parent.foreachEntry { (k, _) => arr(oi) = k; arr(oi + 1) = find(k); oi += 2 }
      arr
    }
    // distribute via ONE broadcast of the primitive array + index-range
    // tasks (vs parallelize of a boxed tuple array, which costs ~40 B/row
    // on the driver before slicing; vs a closure capture, which would
    // serialize the full array per task): every downstream scan — the
    // caller's orderBy does TWO (range-bound sampling + the sort itself) —
    // reads the compact broadcast; the ContextCleaner reclaims it when the
    // returned frame is unreferenced
    val slices = math.max(1, math.min(ss.sparkContext.defaultParallelism, nNodes / 65536))
    val b = ss.sparkContext.broadcast(out)
    val rows = ss.sparkContext.parallelize(0 until slices, slices).flatMap { s =>
      val arr = b.value
      val n = arr.length / 2
      Iterator.range((n.toLong * s / slices).toInt, (n.toLong * (s + 1) / slices).toInt)
        .map(i => (arr(2 * i), arr(2 * i + 1)))
    }
    Some(ss.createDataset(rows).toDF("node", "label"))
  }

  /** Rounds the fixed-round SQL oracle needs before its labels equal the
    * union-find fixpoint, computed EXACTLY in one O(V+E) pass: node v's
    * label after k synchronous min-label rounds is the min over v's k-ball,
    * which last changes at k = dist(v, component min) — so the convergence
    * round count is the max BFS depth from all component minima at once.
    * (The direct double-buffered simulation is O(E x rounds): at the 100x
    * corpus — 18.6M edges, 15 rounds measured — that is ~2 B single-thread
    * map operations, slower than the union-find it audits.)
    */
  private def syncConvergenceRounds(chunks: Array[Array[Long]],
                                    parent: graft.core.LongLongMap): Int = {
    // read-only root walk (paths are already partially compressed by the
    // union phase; no mutation keeps this safe to call anywhere)
    def rootOf(x0: Long): Long = {
      var x = x0
      var p = parent(x)
      while (p != x) { x = p; p = parent(x) }
      x
    }
    // dense ids in slot order, so arrays replace maps for the BFS
    val v = parent.size
    val dense = new graft.core.LongLongMap(v + v / 2)
    val nodeOf = new Array[Long](v)
    var nd = 0L
    parent.foreachEntry { (k, _) => dense.put(k, nd); nodeOf(nd.toInt) = k; nd += 1 }
    // CSR adjacency over the undirected edges (two directed entries each).
    // Endpoints are remapped to dense ints ONCE (a transient 4 B/endpoint
    // array) so the degree and fill passes run on primitive ints — the
    // hash probes were the audit's dominant cost when both passes looked
    // every endpoint up again.
    var e2 = 0L
    for (chunk <- chunks) e2 += chunk.length
    require(e2 <= Int.MaxValue, s"convergence audit: $e2 directed edges exceed CSR bounds")
    val endp = new Array[Int](e2.toInt)
    val offs = new Array[Int](v + 1)
    var w = 0
    for (chunk <- chunks) {
      var i = 0
      while (i < chunk.length) {
        val d = dense(chunk(i)).toInt
        endp(w) = d
        offs(d + 1) += 1
        w += 1
        i += 1
      }
    }
    var i = 0
    while (i < v) { offs(i + 1) += offs(i); i += 1 }
    val targets = new Array[Int](e2.toInt)
    val cursor = java.util.Arrays.copyOf(offs, v)
    i = 0
    while (i < endp.length) {
      val da = endp(i); val db = endp(i + 1)
      targets(cursor(da)) = db; cursor(da) += 1
      targets(cursor(db)) = da; cursor(db) += 1
      i += 2
    }
    // multi-source BFS from every component minimum (= union-find root)
    val queue = new Array[Int](v)
    val seen = new Array[Boolean](v)
    var tail = 0
    i = 0
    while (i < v) {
      if (rootOf(nodeOf(i)) == nodeOf(i)) { queue(tail) = i; tail += 1; seen(i) = true }
      i += 1
    }
    var head = 0
    var depth = 0
    var levelEnd = tail
    while (head < tail) {
      if (head == levelEnd) { depth += 1; levelEnd = tail }
      val u = queue(head); head += 1
      var t = offs(u)
      while (t < offs(u + 1)) {
        val w = targets(t)
        if (!seen(w)) { seen(w) = true; queue(tail) = w; tail += 1 }
        t += 1
      }
    }
    depth
  }

  /** The global min-label rounds (adaptive, diameter-budgeted) — phase 2 of
    * [[clusterLabels]], kept as the standard scalable formulation over
    * whatever pair graph it is given.
    */
  private[graft] def minLabelLoop(pairs: DataFrame, iters: Int,
                                  checkConverged: Boolean = false): DataFrame = {
    val edges = ccEdges(pairs)
    // nodes from the CACHED edge table (self-loops guarantee every node
    // appears as src) — deriving from the uncached upstream would run the
    // whole candidate-pair pipeline a second time. Each round is eagerly
    // localCheckpoint'ed: the next round's broadcast (= collect) would
    // otherwise re-execute the whole join lineage accumulated so far (and
    // Catalyst re-analysis of the stacked plan goes super-linear).
    val init = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint()
    // Adaptive rounds: `iters` is the DIAMETER BUDGET, not a fixed count —
    // the loop stops at the first round that changes nothing, and that
    // unchanged round IS the convergence proof (stability under a
    // neighbor-min pass makes labels constant per component and equal to
    // the component minimum, so the output is bit-identical to `iters`
    // unrolled rounds whenever both converge — the oracle's fixed-round
    // formulation included). Near-dup components are band-clique-shaped
    // (diameter ~2): 3 rounds run where the fixed version always paid the
    // full budget plus a separate probe. The per-round change probe is a
    // limit-1 count over the two bounded, checkpointed label frames —
    // noise next to the edge-table round it can save.
    var out = init
    var converged = false
    var rounds = 0
    while (!converged && rounds < iters) {
      val t0 = System.nanoTime()
      val next = ccRound(edges, out).localCheckpoint()
      val t1 = System.nanoTime()
      converged = next.as("nx").join(out.as("cur"), "node")
        .where(col("nx.label") =!= col("cur.label")).limit(1).count() == 0
      val t2 = System.nanoTime()
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(f"CCDEBUG round=$rounds ccRound=${(t1-t0)/1e9}%.2f cmp=${(t2-t1)/1e9}%.2f converged=$converged")
      out = next
      rounds += 1
    }
    if (checkConverged && !converged) {
      // the budget's final round still moved labels: one probe round
      // decides (a diameter-exactly-`iters` graph is converged NOW); a
      // chain-shaped component whose diameter exceeds the budget fails
      // loudly here instead of silently splitting
      val changed = ccRound(edges, out).as("nx").join(out.as("cur"), "node")
        .where(col("nx.label") =!= col("cur.label")).count()
      require(changed == 0,
        s"clusterLabels: $changed labels still changing after $rounds rounds " +
          "— a component's diameter exceeds the round budget; raise iters")
    }
    out
  }

  /** SimHash width: 60 bits (not 64 — bit 63 would flip the long's sign and
    * make arithmetic-shift band extraction engine-dependent, and a 60-bit
    * recompose sum stays safely inside BIGINT on both engines). 4 bands of
    * 15 bits -> 32768 buckets per band: at corpus scale the 256-bucket
    * 8-bit banding saturates (every bucket holds n/256 docs and the
    * candidate join re-quadratizes — 9.5M candidate rows at just 5k docs).
    */
  val SimhashBits = 60
  val SimhashBands = 4
  val SimhashBandBits: Int = SimhashBits / SimhashBands // 15
  val SimhashBandMask: Int = (1 << SimhashBandBits) - 1

  /** 60-bit SimHash over unigram tokens: bit j of the result is 1 iff the
    * sum over distinct tokens of (+1 if bit j of the token hash else -1) is
    * positive. The token hash takes 60 of md5's 128 bits: bits 0..31 from
    * hex chars 1-8, bits 32..59 from chars 9-16 — one digest per token.
    * Output: (doc_id, simhash long). One groupBy(doc_id) shuffle.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(array_distinct(TextAnalysis.tokens(col("text")))).as("token"))
    // one 60-bit token hash as a single long: bits 0..31 from hlo, 32..59
    // from the LOW 28 bits of hhi (the mask keeps the product inside a
    // signed long — hhi itself is a full 32-bit value)
    val h = tok.withColumn("__dg", md5(col("token")))
      .select(col("doc_id"),
        (conv(substring(col("__dg"), 1, 8), 16, 10).cast("long") +
          conv(substring(col("__dg"), 9, 8), 16, 10).cast("long")
            .bitwiseAND(lit(0xFFFFFFFL)) * lit(1L << 32))
          .as("h60"))
    // LANE-PACKED bit counting: bit j's vote sum is 2*S_j - N for
    // S_j = count of tokens with bit j set. Summing (h60 >> f) & laneMask
    // accumulates S_f, S_{f+15}, S_{f+30}, S_{f+45} in four 15-bit lanes of
    // ONE long — 15 sum aggregates + a count instead of 60 conditional
    // sums (4x smaller agg codegen and buffers). A lane saturates at 32767
    // distinct tokens per doc; the recompose guards that bound explicitly.
    val laneMask = (1L) | (1L << 15) | (1L << 30) | (1L << 45)
    val laneSums = (0 until SimhashBandBits).map { f =>
      sum(shiftright(col("h60"), f).bitwiseAND(laneMask)).as(s"l$f")
    }
    val agged = h.groupBy(col("doc_id"))
      .agg(laneSums.head, laneSums.tail :+ count(lit(1)).as("n"): _*)
    // bit j set iff vote sum 2*S_j - N > 0, via the compact kernel: the
    // composed 60-term when() chain generated a 13.8 KB projection method —
    // past the JVM's 8000-byte JIT limit, so the per-doc recompose silently
    // ran in the bytecode interpreter (CodegenAuditSpec catch, round 11)
    val recomposed = graft.functions.HashKernels.simhashRecompose(
      array((0 until SimhashBandBits).map(f => col(s"l$f")): _*), col("n"))
    agged.select(col("doc_id"),
      when(col("n") > 0x7fff, raise_error(concat(lit(
        "simhash: doc exceeds 32767 distinct tokens (lane overflow): "), col("doc_id"))))
        .otherwise(recomposed).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist, using 15-bit
    * band blocking (4 bands; any pair within distance 3 must agree on at
    * least one band by pigeonhole when maxDist < 4). Avoids the O(n^2)
    * cross join, and the 2^15 bucket space keeps cell occupancy sub-linear
    * far past the point where 8-bit bands re-quadratize.
    */
  def simhashNearDupPairs(docs: DataFrame, maxDist: Int,
                          bucketCap: Int = 1000): DataFrame = {
    require(maxDist < SimhashBands,
      s"$SimhashBands-band blocking guarantees recall only for maxDist <= ${SimhashBands - 1}")
    // same one-aggregation candidate shape as minhashLshPairs (round 13):
    // collect each band bucket's (doc_id, simhash) members with the capped
    // imperative aggregate, then explode hamming-filtered pairs straight
    // off the bucket — the filter fused into the explode means
    // over-distance candidates never become rows. Replaces the
    // cached-repartition + cap join + self-join shape.
    //
    // mega-bucket guard (same rationale as minhashLshPairs' bucketCap): a
    // band bucket of k docs emits k^2/2 candidates; boilerplate-heavy
    // corpora concentrate near-identical simhashes into one bucket and
    // re-quadratize the join. Over-cap buckets evaluate to null with
    // BOUNDED buffer state; pairs inside a dropped bucket still collide
    // in their other 3 bands unless they disagree there too.
    import graft.functions.BucketAgg
    simhash(docs).select(col("doc_id"), col("simhash"),
        posexplode(array((0 until SimhashBands).map(b =>
          shiftright(col("simhash"), b * SimhashBandBits).bitwiseAND(SimhashBandMask)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
      .groupBy(col("band"), col("band_key"))
      .agg(BucketAgg.cappedCollectLong2(col("doc_id"), col("simhash"), bucketCap)
        .as("members"))
      .where(col("members").isNotNull)
      .select(explode(BucketAgg.simhashPairsOf(col("members"), maxDist)).as("p"))
      // int, matching the bit_count() type of the shape this replaced
      .select(col("p.a").as("a"), col("p.b").as("b"),
        col("p.hamming").cast("int").as("hamming"))
      .distinct()
  }

  /** Chunk-granularity exact substring dedup (the scalable stand-in for
    * suffix-array substring dedup, Lee et al. 2021): cut each document
    * into non-overlapping `c`-token chunks, hash each chunk (md5 — 128-bit,
    * collision-safe at corpus scale, portable to the oracle), and mark
    * every occurrence that is not the globally FIRST occurrence of its
    * chunk (ordered by doc_id, then chunk index) as duplicated. Returns
    * per-doc (n_chunks, dup_chunks, dup_frac) — the curation signal used
    * to drop or trim boilerplate-heavy documents.
    *
    * Cost at scale: one shuffle on the chunk digest (window for
    * first-occurrence), one groupBy(doc_id); chunks are non-overlapping so
    * the exploded row count equals the corpus token count / c.
    */
  def chunkDupStats(docs: DataFrame, c: Int): DataFrame = {
    val toks = filter(split(lower(trim(col("text"))), "\\s+"), t => length(t) > 0)
    val chunks = docs
      .select(col("doc_id"), toks.as("__t"))
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), ceil(size(col("__t")) / lit(c.toDouble)).cast("int") - 1),
          i => md5(concat_ws(" ", slice(col("__t"), i * c + 1, lit(c))))))
        .as(Seq("chunk_idx", "k")))
    val firstW = Window.partitionBy(col("k")).orderBy(col("doc_id"), col("chunk_idx"))
    chunks
      .withColumn("__rn", row_number().over(firstW))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum((col("__rn") > 1).cast("long")).as("dup_chunks"))
      .withColumn("dup_frac",
        round(col("dup_chunks").cast("double") / col("n_chunks"), 6))
  }
}
