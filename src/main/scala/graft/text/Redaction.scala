package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection / redaction for training-data pipelines.
  *
  * LLM corpora must strip personally-identifying strings (emails, phone
  * numbers) before training. Both operations here are narrow, codegen'd
  * regexp transforms — no shuffle, no UDF — so they compose with any scan
  * and push no work to the driver. Patterns are deliberately restricted to
  * the regex subset that evaluates identically under Java regex (Spark)
  * and RE2 (DuckDB, Go): character classes, bounded repetition, literals —
  * no backreferences, no lookaround — so redaction output is verifiable
  * cross-engine byte-for-byte.
  *
  * Reference scope: the reference app masks nothing (it forwards raw
  * customer events, `ecommerce_streaming.py:96-109`); this is part of the
  * LLM-pipeline extension surface (SURVEY.md §2.13).
  */
object Redaction {

  /** Email pattern: local part (alnum, dot, hash — hash covers synthetic
    * TPC-H names like Customer#000000001), at-sign, dotted domain. */
  val EmailPattern = "[a-zA-Z0-9.#]+@[a-zA-Z0-9]+[a-zA-Z0-9.]*[a-zA-Z0-9]"

  /** Phone pattern, TPC-H shape: CC-NNN-NNN-NNNN. */
  val PhonePattern = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPattern))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhonePattern))

  /** Replace every email and phone with typed placeholder tokens.
    * Emails first: the phone pattern cannot match inside an email local
    * part (no dashes there), so the order is semantically irrelevant but
    * fixed for determinism. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "[EMAIL]"),
      PhonePattern, "[PHONE]")
}
