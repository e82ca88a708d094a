package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Deterministic train/val split membership for a document id: hash the
    * id (seeded, so the split is independent of every other hash lane in
    * the pipeline) into [0,100) and take the top `valPct` percent as the
    * validation side. A pure column expression — split membership never
    * needs a join or a stored assignment table, on any engine.
    */
  def isVal(id: Column, valPct: Int): Column =
    pmod(Dedup.h32(concat(lit("split:"), id.cast("string"))), lit(100L)) >=
      lit(100L - valPct)

  /** Cross-split near-duplicate leakage: documents assigned to the
    * validation split that have a minhash-LSH near-duplicate in the
    * training split — the standard eval-integrity guard (a val doc whose
    * near-copy was trained on measures memorization, not generalization).
    *
    * Returns one row per leaked val doc: `(val_doc_id, n_train_dups,
    * example_train_doc)`, where the example is the smallest offending
    * train doc id.
    *
    * Scale posture: candidate pairs come from the banded/bucket-capped
    * LSH join (never all-pairs); split labels are recomputed from the
    * pair's OWN id columns via [[isVal]] — zero label joins, so the only
    * shuffle beyond pair generation is the final bounded groupBy over
    * leaked pairs.
    */
  def splitLeakage(docs: DataFrame, w: Int, bands: Int, rowsPerBand: Int,
                   bucketCap: Int, valPct: Int): DataFrame = {
    val pairs = Dedup.minhashLshPairs(docs, w, bands, rowsPerBand, bucketCap)
    val va = isVal(col("a"), valPct)
    val vb = isVal(col("b"), valPct)
    pairs.where(va =!= vb)
      .select(
        when(va, col("a")).otherwise(col("b")).as("val_doc_id"),
        when(va, col("b")).otherwise(col("a")).as("train_doc_id"))
      .groupBy(col("val_doc_id"))
      .agg(count(lit(1)).as("n_train_dups"),
        min(col("train_doc_id")).as("example_train_doc"))
  }
}
