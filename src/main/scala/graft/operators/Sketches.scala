package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketches. Spark's approx_count_distinct is the
  * production choice when the answer only has to be close; this HLL is
  * hash-portable (md5-derived, same bits in DuckDB SQL) so the oracle gate
  * can hash-compare the ESTIMATE itself — and it doubles as the mergeable
  * sketch pattern: the register table is the sketch state, groupBy(max) is
  * the merge, so partial sketches from shards/days combine associatively
  * exactly like the reference's per-file rollups.
  *
  * Layout (classic HLL, Flajolet et al. 2007): a 32-bit hash splits into a
  * P-bit register index (low bits) and a (32-P)-bit suffix w; the register
  * keeps max(rank) where rank = leading-zeros-of-w + 1 = (32-P+1) -
  * bitlength(w). Bitlength via length(bin(w)) — exact integer ops on both
  * engines, no float log2 whose last-ulp could diverge cross-engine.
  */
object Sketches {

  val P = 8
  val M: Int = 1 << P            // 256 registers
  val SuffixBits: Int = 32 - P   // 24
  val MaxRank: Int = SuffixBits + 1

  /** alpha_m bias constant (m >= 128). Emitted as a literal into both the
    * Spark plan and the oracle SQL so the doubles agree bit-for-bit.
    */
  val Alpha: Double = 0.7213 / (1 + 1.079 / M)

  /** Register table: one row per (groups..., reg) with the max rank seen.
    * This is the mergeable sketch state — union register tables and
    * groupBy(max) to merge.
    */
  def hllRegisters(df: DataFrame, groups: Seq[String], value: Column): DataFrame =
    hllRegistersFromHash(df, groups, Dedup.h32(value))

  /** Register table from a PRECOMPUTED h32 hash column — for callers that
    * already carry the value's md5 digest in a shared narrow scan
    * (corpus_overlap derives the sketch hash from the same digest its exact
    * lane groups on, so the document text is scanned and hashed once).
    */
  def hllRegistersFromHash(df: DataFrame, groups: Seq[String], h: Column): DataFrame =
    df.select(groups.map(col) :+ h.as("__h"): _*)
      .select(groups.map(col) ++ Seq(
        col("__h").bitwiseAND(lit((M - 1).toLong)).as("reg"),
        shiftright(col("__h"), P).as("__w")): _*)
      .withColumn("rank",
        when(col("__w") === 0, lit(MaxRank))
          .otherwise(lit(MaxRank) - length(bin(col("__w")))))
      .groupBy(groups.map(col) :+ col("reg"): _*)
      .agg(max(col("rank")).as("m_rank"))

  /** 2^(MaxRank - rank) as exact integer via a rank CASE — the scaled
    * harmonic-sum term (scaling by 2^MaxRank keeps the register sum in
    * exact long arithmetic, so it is order-independent; a float pow(2,-r)
    * could differ in the last ulp between engines).
    */
  private def termScaled(rank: Column): Column =
    (1 to MaxRank).foldLeft(lit(null).cast("long")) { (acc, r) =>
      when(rank === r, lit(1L << (MaxRank - r))).otherwise(acc)
    }

  def termScaledSql(rank: String): String =
    s"CASE $rank " +
      (1 to MaxRank).map(r => s"WHEN $r THEN ${1L << (MaxRank - r)}").mkString(" ") +
      " END"

  /** Estimate per group from a register table. Raw HLL estimate
    * alpha*m^2/sum(2^-rank) with the paper's small-range correction
    * E <= 2.5m && V>0 -> m*ln(m/V) (V = never-touched registers).
    * Output: (groups..., est double).
    */
  def hllEstimate(regs: DataFrame, groups: Seq[String], out: String): DataFrame = {
    val scale = 1L << MaxRank
    regs.groupBy(groups.map(col): _*)
      .agg(sum(termScaled(col("m_rank"))).as("__s"), count(lit(1)).as("__n"))
      .withColumn("__raw",
        lit(Alpha * M.toDouble * M.toDouble * scale.toDouble) /
          (col("__s") + (lit(M.toLong) - col("__n")) * lit(scale)).cast("double"))
      .withColumn("__v", lit(M.toLong) - col("__n"))
      .withColumn(out,
        round(when(col("__raw") <= 2.5 * M && col("__v") > 0,
          lit(M.toDouble) * log(lit(M).cast("double") / col("__v")))
          .otherwise(col("__raw")), 4))
      .select(groups.map(col) :+ col(out): _*)
  }

  // ---- count-min sketch ------------------------------------------------

  /** CMS geometry: d independent hash rows × w buckets. Like the HLL
    * register table, the sketch state is a plain DataFrame mergeable by
    * groupBy-SUM — shards/days combine associatively.
    */
  val CmsDepth = 4
  val CmsWidth = 256

  private def cmsBucket(r: Int, value: Column): Column =
    pmod(Dedup.h32(concat(lit(s"cms$r:"), value)), lit(CmsWidth.toLong))

  def cmsBucketSql(r: Int, valueSql: String): String =
    s"('0x'||substr(md5('cms$r:' || $valueSql),1,8))::BIGINT % $CmsWidth"

  /** Sketch state: one row per (groups..., row, bucket) with the collision
    * count. Map-side the fanout is a d-element posexplode; the only shuffle
    * is the groupBy on (groups, row, bucket) — uniform keys by construction.
    */
  def cmsSketch(df: DataFrame, groups: Seq[String], value: Column): DataFrame =
    df.select(groups.map(col) :+ value.as("__x"): _*)
      .select(groups.map(col) :+
        posexplode(array((0 until CmsDepth).map(r => cmsBucket(r, col("__x"))): _*))
          .as(Seq("row", "bucket")): _*)
      .groupBy(groups.map(col) ++ Seq(col("row"), col("bucket")): _*)
      .agg(count(lit(1)).as("c"))

  /** Weighted sketch state: each input row carries `weight` occurrences of
    * `value` — the pre-aggregated form. Bit-identical to [[cmsSketch]] over
    * the expanded rows (the bucket count is a sum either way), but a caller
    * that already holds per-value counts hashes each DISTINCT value d times
    * instead of every occurrence d times — at corpus scale that turns the
    * sketch's md5 work from O(events) into O(distinct values).
    */
  def cmsSketchWeighted(df: DataFrame, groups: Seq[String], value: Column,
                        weight: Column): DataFrame =
    df.select(groups.map(col) ++ Seq(value.as("__x"), weight.as("__wt")): _*)
      .select(groups.map(col) ++ Seq(col("__wt")) :+
        posexplode(array((0 until CmsDepth).map(r => cmsBucket(r, col("__x"))): _*))
          .as(Seq("row", "bucket")): _*)
      .groupBy(groups.map(col) ++ Seq(col("row"), col("bucket")): _*)
      .agg(sum(col("__wt")).as("c"))

  /** Point estimates for `items` (a frame of groups + `item`): the CMS
    * upper bound min over rows of the item's bucket count. The probe is an
    * equi-join against the sketch — items never touch the raw data. LEFT
    * join: a probed bucket absent from the state has an implicit count of
    * 0 (an inner join would drop it and inflate the min to whatever the
    * item's colliding buckets hold — or lose never-ingested items
    * entirely).
    */
  def cmsEstimate(sketch: DataFrame, items: DataFrame, groups: Seq[String],
                  item: Column, out: String): DataFrame =
    items.select(groups.map(col) :+ item.as("__i"): _*)
      .select(groups.map(col) ++ Seq(col("__i")) :+
        posexplode(array((0 until CmsDepth).map(r => cmsBucket(r, col("__i"))): _*))
          .as(Seq("row", "bucket")): _*)
      .join(sketch, groups ++ Seq("row", "bucket"), "left")
      .groupBy(groups.map(col) :+ col("__i"): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as(out))
      .withColumnRenamed("__i", "item")

  /** The full DuckDB mirror of hllRegisters+hllEstimate as a SQL fragment:
    * estimates distinct `valueSql` per `groupCol` over `src`.
    */
  def hllEstimateSql(src: String, groupCol: String, valueSql: String, out: String): String = {
    val scale = 1L << MaxRank
    s"""(WITH hh AS (SELECT $groupCol, ('0x'||substr(md5($valueSql),1,8))::BIGINT AS h FROM $src),
       |rw AS (SELECT $groupCol, h & ${M - 1} AS reg, h >> $P AS w FROM hh),
       |rk AS (SELECT $groupCol, reg,
       |              CASE WHEN w = 0 THEN $MaxRank ELSE $MaxRank - length(bin(w)) END AS rank
       |       FROM rw),
       |regs AS (SELECT $groupCol, reg, MAX(rank) AS m_rank FROM rk GROUP BY 1, 2),
       |acc AS (SELECT $groupCol, SUM(${termScaledSql("m_rank")}) AS s, COUNT(*) AS n
       |        FROM regs GROUP BY 1),
       |est AS (SELECT $groupCol,
       |               (CAST($Alpha AS DOUBLE) * $M.0 * $M.0 * $scale.0) / CAST(s + ($M - n) * $scale AS DOUBLE) AS raw,
       |               $M - n AS v
       |        FROM acc)
       |SELECT $groupCol,
       |       round(CASE WHEN raw <= ${2.5 * M} AND v > 0 THEN $M.0 * ln($M.0 / v)
       |                  ELSE raw END, 4) AS $out
       |FROM est)""".stripMargin
  }

  /** Bloom filter for join pruning: build a bit array over the build side's
    * keys, broadcast it as a literal, and pre-filter the probe side BEFORE
    * its shuffle — the classic runtime-filter pattern (false positives only
    * re-admit rows the exact join drops later; never false negatives, so
    * results are identical to the unpruned join).
    *
    * The build is one explode + groupBy(word) with map-side partial bit_or,
    * so the shuffle is at most `BloomWords` rows regardless of build-side
    * size, and the collected state is a bounded Array[Long] — the same
    * driver-bounded discipline as the k-means centroids. This literal form
    * tops out around a few-thousand-word filter (plan size); beyond that
    * the same bits table joins broadcast on the word index instead.
    */
  val BloomWords = 4096 // 2^18 bits
  val BloomHashes = 3

  private val BitMasks: Array[Long] = Array.tabulate(64)(i => 1L << i)

  /** Probe positions use NATIVE xxhash64 (one codegen'd hash per probe),
    * not the md5-derived h32 the oracle-portable operators use: bloom
    * decisions never cross the engine boundary — false-positive sets can
    * differ freely because the exact join refines them away — so there is
    * nothing to keep portable, and md5 here would triple-hash every probe
    * row for no property. (Measured: the md5 form made the probe scan the
    * dominant cost of bloom_prune_join at the 10x scale run.)
    */
  private def bloomPos(r: Int, value: Column): Column =
    pmod(xxhash64(lit(r), value), lit((BloomWords * 64).toLong))

  def bloomBuild(df: DataFrame, value: Column): Array[Long] = {
    val rows = df.select(value.as("__x")).where(col("__x").isNotNull)
      .select(explode(array((0 until BloomHashes).map(r => bloomPos(r, col("__x"))): _*))
        .as("__p"))
      .select(shiftright(col("__p"), 6).cast("int").as("w"),
        element_at(lit(BitMasks), col("__p").bitwiseAND(lit(63L)).cast("int") + 1).as("m"))
      .groupBy("w").agg(expr("bit_or(m)").as("bits"))
      .collect()
    val arr = new Array[Long](BloomWords)
    rows.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership test against a built filter — pure codegen'd arithmetic
    * (md5 + mask probes against two array literals), usable directly in a
    * `where` before a join's exchange.
    */
  def bloomMightContain(bits: Array[Long], value: Column): Column =
    (0 until BloomHashes).map { r =>
      val p = bloomPos(r, value)
      val word = element_at(lit(bits), shiftright(p, 6).cast("int") + 1)
      val mask = element_at(lit(BitMasks), p.bitwiseAND(lit(63L)).cast("int") + 1)
      word.bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)

  /** Merge two filters (bitwise OR) — shards/days combine associatively. */
  def bloomMerge(a: Array[Long], b: Array[Long]): Array[Long] =
    a.zip(b).map { case (x, y) => x | y }
}
