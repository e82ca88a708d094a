package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with a held-out evaluation/benchmark set, the standard guard
  * against test-set leakage when assembling a training corpus.
  *
  * Scale posture: the benchmark side is the eval suite — small by
  * construction (thousands of documents, so at most a few hundred MB of
  * hashed 8-byte shingles) — and broadcasts; the 100 TB corpus side stays a
  * narrow scan (codegen'd shingle kernel + hash) feeding ONE
  * groupBy(doc_id). The broadcast LEFT join means no shuffle keys every
  * gram occurrence of the corpus; set `broadcastBench = false` only if the
  * benchmark genuinely outgrows executor memory, which flips the hit probe
  * to a shuffle join without changing semantics.
  */
object Contamination {

  /** Per-document contamination counts against `bench`: for every corpus
    * document (with at least `w` tokens), the number of its distinct hashed
    * `w`-shingles, how many of those also occur anywhere in the benchmark,
    * and the hit fraction. Documents sharing nothing still appear (n_hits
    * 0) so a decontamination threshold can be applied downstream without a
    * second pass over the corpus.
    */
  def ngramHits(corpus: DataFrame, bench: DataFrame, w: Int,
                broadcastBench: Boolean = true): DataFrame = {
    val benchSh = Dedup.shingles(bench, w)
      .select(Dedup.h32(col("shingle")).as("shingle")).distinct()
      .withColumn("__hit", lit(1))
    val probe = if (broadcastBench) broadcast(benchSh) else benchSh
    Dedup.shingles(corpus, w)
      .select(col("doc_id"), Dedup.h32(col("shingle")).as("shingle"))
      .distinct()
      .join(probe, Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0))).as("n_hits"))
      .withColumn("hit_frac",
        round(col("n_hits").cast("double") / col("n_shingles").cast("double"), 6))
  }
}
