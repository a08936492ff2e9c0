package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction — the scrub pass every training-data
  * pipeline runs before text leaves the ingest tier (the reference has
  * no text hygiene at all; its `pkg/embedding/processor.go` tokenizes
  * whatever it is given). Map-only shape: `regexp_replace` /
  * `regexp_extract_all` are codegen'd Catalyst expressions, so the
  * scrub runs inside whole-stage codegen with no shuffle, no UDF, and
  * scales linearly to a 100 TB corpus.
  *
  * Patterns are deliberately restricted to the syntax Java regex and
  * RE2 (DuckDB) interpret identically — no backreferences, no
  * lookaround — so the DuckDB oracle replays the scrub verbatim.
  * Replacement order is fixed (email, phone, ipv4) and counts are
  * taken BEFORE any replacement.
  */
object Redact {
  /** user@host.tld — the local part stops at whitespace/@, the domain
    * requires a dotted TLD of 2+ letters. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** +CC-NNN-NNN-NNNN international-ish form (strict on purpose:
    * loose phone regexes differ between engines on greediness). */
  val PhoneRe = "\\+\\d{1,3}-\\d{3}-\\d{3}-\\d{4}"
  /** dotted quad, word-bounded against longer digit/word runs. A
    * 5-part run like 1.2.3.4.5 still matches its first quad ("." is a
    * non-word char, so \b holds there) — preventing that needs
    * lookaround, which RE2 lacks; pinned in RedactSpec as the
    * documented behavior of both engines. */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  private def countOf(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  /** Adds n_email / n_phone / n_ipv4 counts and `clean_text` with all
    * three categories replaced by typed placeholders. */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_email", countOf(t, EmailRe))
      .withColumn("n_phone", countOf(t, PhoneRe))
      .withColumn("n_ipv4", countOf(t, Ipv4Re))
      .withColumn("clean_text",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"),
          Ipv4Re, "<IP>"))
  }
}
