package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data curation: redact email addresses and
  * IPv4 literals, reporting per-document redaction counts. Pure codegen'd
  * regexp projections — no shuffle, no UDF — so at 100 TB this runs at
  * scan speed and pushes column pruning to the parquet reader.
  *
  * Patterns deliberately stay inside the regex subset with identical
  * semantics in Java's engine (Spark) and RE2 (DuckDB): character
  * classes, bounded repetition, ASCII word boundaries — no backrefs, no
  * lookaround.
  */
object Scrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** (scrubbed text, email count, ip count). Emails are replaced first so
    * an address's host part is never re-matched as a dotted quad.
    */
  def scrub(text: Column): (Column, Column, Column) = {
    val nEmail = regexp_count(text, lit(EmailRe))
    val deEmailed = regexp_replace(text, EmailRe, "<EMAIL>")
    val nIp = regexp_count(deEmailed, lit(Ipv4Re))
    val clean = regexp_replace(deEmailed, Ipv4Re, "<IP>")
    (clean, nEmail, nIp)
  }

  /** Scrub `textCol` into `scrubbed` + `n_email` + `n_ip` columns. */
  def scrubDocs(docs: DataFrame, textCol: String): DataFrame = {
    val (clean, ne, ni) = scrub(col(textCol))
    docs.withColumn("scrubbed", clean)
      .withColumn("n_email", ne)
      .withColumn("n_ip", ni)
  }
}
