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

  /** Sliding-window chunking with overlap — the RAG/embedding-prep layout
    * (chunk c tokens, stride s <= c, so consecutive chunks share c−s tokens
    * of context), versus [[packChunks]]' disjoint pretraining packing and
    * `Dedup.chunkDupStats`' disjoint dedup chunks. Chunk count per doc is
    * closed-form integer math (1 + ceil((n−c)/s) for n > c), so the explode
    * is exactly chunk-count-sized — no windows, no shuffle beyond the
    * output sort; chunk hashes are (doc, index)-deterministic.
    */
  def slidingChunks(docs: DataFrame, textCol: Column, c: Int, stride: Int)
      : DataFrame = {
    require(stride > 0 && stride <= c, s"need 0 < stride <= chunk: $stride/$c")
    val toks = filter(split(lower(trim(textCol)), "\\s+"), t => length(t) > 0)
    docs
      .withColumn("__t", toks)
      .withColumn("__n", size(col("__t")))
      .where(col("__n") > 0)
      .withColumn("chunk_idx", explode(sequence(lit(0),
        when(col("__n") <= c, lit(0))
          .otherwise(expr(s"(__n - $c + $stride - 1) DIV $stride")))))
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
        least(lit(c), col("__n") - col("chunk_idx") * stride).cast("int").as("n_in_chunk"),
        md5(concat_ws(" ", slice(col("__t"), (col("chunk_idx") * stride + 1).cast("int"), lit(c))))
          .as("chunk_md5"))
  }

  /** DuckDB mirror of [[slidingChunks]] over the documents table. */
  def slidingChunksSql(c: Int, stride: Int): String =
    s"""(WITH toks AS (SELECT doc_id,
       |    list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS t
       |  FROM documents),
       |nn AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
       |idx AS (SELECT doc_id, t, n,
       |          unnest(generate_series(0,
       |            CASE WHEN n <= $c THEN 0 ELSE (n - $c + $stride - 1) // $stride END)) AS chunk_idx
       |        FROM nn)
       |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
       |       CAST(LEAST($c, n - chunk_idx * $stride) AS INT) AS n_in_chunk,
       |       md5(array_to_string(t[chunk_idx*$stride+1 : chunk_idx*$stride+$c], ' ')) AS chunk_md5
       |FROM idx)""".stripMargin
}
