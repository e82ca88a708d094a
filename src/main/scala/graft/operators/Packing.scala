package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents are conceptually
  * concatenated (per group, in id order) into one token stream that is cut
  * into fixed `budget`-token chunks — the standard concat-and-chunk batch
  * layout. Each document maps to the chunk range it occupies:
  * `start_pack`/`end_pack` (a document may straddle a boundary) and its
  * offset inside the first chunk, all pure integer math off one running
  * token total.
  *
  * Scale posture: ONE window shuffle, partitioned by the group column —
  * groups (languages/domains/shards) pack independently and in parallel,
  * which is how a 100 TB corpus packs without a global sort; within a
  * group the order is the stable doc_id. Zero-token documents occupy no
  * stream interval and are excluded.
  */
object Packing {

  /** Per-document chunk assignment over the group-ordered token stream.
    * `nTokens` must be a non-negative integer column; cumulative totals
    * stay under 2^53 (exact in the double division below) for any
    * realistic corpus shard.
    */
  def packChunks(docs: DataFrame, groupCol: Column, nTokens: Column,
                 budget: Long): DataFrame = {
    require(budget > 0, "pack budget must be positive")
    // partition by the PROJECTED group column — groupCol itself resolves
    // against `docs` and no longer exists after the rename below
    val w = Window.partitionBy(col("grp")).orderBy(col("doc_id"))
    docs
      .select(col("doc_id"), groupCol.as("grp"), nTokens.as("n_tokens"))
      .where(col("n_tokens") > 0)
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("__prev", col("__cum") - col("n_tokens"))
      .select(col("doc_id"), col("grp"), col("n_tokens"),
        // doc occupies stream interval [__prev, __cum): first and last
        // budget-sized chunk touched, and the offset inside the first
        (col("__prev") / lit(budget)).cast("long").as("start_pack"),
        ((col("__cum") - 1) / lit(budget)).cast("long").as("end_pack"),
        pmod(col("__prev"), lit(budget)).as("pack_offset"))
  }
}
