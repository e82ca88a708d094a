package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL document-corpus source — the interchange format LLM data dumps
  * actually arrive in (one JSON object per line, schema drift and broken
  * lines included). The contract mirrors the engine's other ingest edges
  * (line-protocol parse, framed batches): NEVER fail the job on a bad
  * record, capture it for audit instead.
  *
  * Scale notes: the schema is EXPLICIT — schema inference would scan the
  * whole corpus once before the real read (2x the I/O at 100 TB) and can
  * flip types between dumps; `.json()` with a given schema is a single
  * streaming pass, splittable per file, with Jackson parsing inside
  * whole-stage codegen's FileScan. `multiLine` stays false: multiline JSON
  * is NOT splittable (one record can span a file), JSONL is.
  */
object JsonlCorpus {

  val Corrupt = "_corrupt_record"

  /** documents-table schema (doc_id, text, lang, source, n_chars) plus the
    * corrupt-record capture column.
    */
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField(Corrupt, StringType)))

  /** Raw permissive read: well-formed rows parse into columns, malformed
    * lines land whole in `_corrupt_record` with NULL data columns.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(Schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .json(path)

  /** The clean corpus: parsed rows with a doc_id, corrupt column dropped.
    * `n_chars` is recomputed when absent so downstream length filters
    * never see schema-drift NULLs.
    */
  def clean(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .where(col(Corrupt).isNull && col("doc_id").isNotNull)
      .withColumn("n_chars",
        coalesce(col("n_chars"), length(col("text")).cast("long")))
      .drop(Corrupt)

  /** The reject side, for dead-letter audit: one row per unparseable or
    * id-less line, always with the offending payload. Malformed lines carry
    * the raw text from the corrupt column; lines that PARSED but lack a
    * doc_id have a NULL corrupt column, so their payload is reconstructed
    * from the parsed fields (to_json omits the NULL ones) — without this the
    * id-less audit row would be contentless.
    */
  def rejects(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .where(col(Corrupt).isNotNull || col("doc_id").isNull)
      .select(coalesce(col(Corrupt),
        to_json(struct(Schema.fieldNames.filterNot(_ == Corrupt).map(col): _*)))
        .as("raw_line"))
}
