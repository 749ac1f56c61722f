package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data curation: detect and mask emails,
  * IPv4 addresses, and phone numbers in free text. Everything is a
  * codegen'd `regexp_replace` / `regexp_count` projection — no UDFs, no
  * shuffle — so the operator runs at scan speed and the filters stay
  * inside whole-stage codegen at any corpus size.
  *
  * Patterns are intentionally restricted to syntax shared by java.util
  * .regex (Spark) and RE2 (DuckDB oracle): character classes, bounded
  * repetition, `\b`, `\d` — no backrefs or lookaround, which RE2 lacks.
  */
object Redact {

  /** (pattern, replacement tag) in application order. Emails first:
    * an address like `user@10.0.0.1` must become `<EMAIL>`, not a
    * half-redacted IP.
    */
  val patterns: Seq[(String, String)] = Seq(
    "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}" -> "<EMAIL>",
    "\\+\\d{2} \\d{3}-\\d{4}" -> "<PHONE>",
    "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b" -> "<IP>")

  /** Text with every PII match replaced by its tag. */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (c, (re, tag)) =>
      regexp_replace(c, re, tag)
    }

  /** Per-kind match counts BEFORE redaction (email/phone/ip), on the
    * original text — counted in the same order-independent way the
    * replacement applies (counts are per original pattern, so an email
    * containing an IP-shaped host counts once as email and once as ip;
    * the redacted text is still email-first).
    */
  def counts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> regexp_count(text, lit(patterns(0)._1)),
    "n_phones" -> regexp_count(text, lit(patterns(1)._1)),
    "n_ips" -> regexp_count(text, lit(patterns(2)._1)))
}
