package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-curation operators a production training-data pipeline runs before
  * anything is tokenized: benchmark decontamination, PII/secret redaction,
  * and license detection. All pure relational/column expressions with exact
  * DuckDB oracles; the pattern fixtures in CurationSpec plant real matches
  * (the synthetic corpus is clean, which the oracles also prove).
  */
object Curation {

  // --- decontamination ---------------------------------------------------

  /** Flag training documents that share ≥1 word shingle with an eval/
    * benchmark set: the standard n-gram-overlap decontamination (an eval
    * question leaking into pretraining data inflates the benchmark).
    * `evalDocs` is benchmark-sized (thousands), so its distinct shingle set
    * broadcasts; the train side streams through a broadcast semi-join —
    * no shuffle of the corpus at any scale. Returns (doc_id, n_hits) for
    * flagged TRAIN docs.
    *
    * `evalSharesIds`: set ONLY when the eval set is a subset of the train
    * table itself (same doc_id namespace) — then eval members are exempted
    * from flagging by id. For an EXTERNAL benchmark (the production case)
    * leave it false: its ids mean nothing in the corpus namespace, and a
    * train doc that happens to carry an eval doc's number must still be
    * screened. */
  def decontaminate(train: DataFrame, evalDocs: DataFrame,
                    evalSharesIds: Boolean = false): DataFrame = {
    val evalShingles = Dedup.shinglesFor(evalDocs).select(col("shingle")).distinct()
    val base = Dedup.shinglesFor(train)
    val screened =
      if (evalSharesIds)
        base.join(broadcast(evalDocs.select(col("doc_id"))), Seq("doc_id"), "left_anti")
      else base
    screened
      .join(broadcast(evalShingles), Seq("shingle"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
  }

  /** Operator query: every 97th document plays the benchmark set — a subset
    * of the corpus itself, so eval members are id-exempted. */
  def decontaminateDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    decontaminate(docs, docs.filter(col("doc_id") % 97 === 0), evalSharesIds = true)
  }

  // --- PII / secret redaction -------------------------------------------

  /** The redaction patterns, in application order. Kept simple and
    * auditable: emails, IPv4 literals, and long hex strings (API keys,
    * tokens — 20+ hex chars rarely occur in natural text or code except as
    * secrets/hashes, and hashes are safe to drop from training data too). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val HexSecretRe = "\\b[0-9a-fA-F]{20,}\\b"

  /** Replace every match with a typed placeholder; count what was redacted.
    * Narrow column expressions — codegen'd, zero shuffle. */
  def redact(df: DataFrame, text: Column): DataFrame = {
    val r1 = regexp_replace(text, EmailRe, "<EMAIL>")
    val r2 = regexp_replace(r1, Ipv4Re, "<IP>")
    val r3 = regexp_replace(r2, HexSecretRe, "<SECRET>")
    df.withColumn("n_emails", size(regexp_extract_all(text, lit(EmailRe), lit(0))))
      .withColumn("n_ips", size(regexp_extract_all(text, lit(Ipv4Re), lit(0))))
      .withColumn("n_secrets", size(regexp_extract_all(text, lit(HexSecretRe), lit(0))))
      .withColumn("redacted", r3)
  }

  def redactDocs(spark: SparkSession, dir: String): DataFrame =
    redact(Tables.documents(spark, dir).select(col("doc_id"), col("text")), col("text"))
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_secrets"),
              sha2(col("redacted"), 256).as("redacted_sha"))

  // --- license detection -------------------------------------------------

  /** SPDX identifiers a code-corpus filter typically admits. */
  val Permissive: Seq[String] = Seq("MIT", "Apache-2.0", "BSD-2-Clause", "BSD-3-Clause", "ISC")
  val Copyleft: Seq[String] = Seq("GPL-2.0-only", "GPL-3.0-only", "AGPL-3.0-only", "LGPL-2.1-only")

  /** Extract the SPDX-License-Identifier marker (the machine-readable form
    * modern code carries) and classify permissive / copyleft / unknown —
    * the admit/reject signal for code training corpora. */
  def licenseOf(text: Column): Column =
    regexp_extract(text, "SPDX-License-Identifier: ([A-Za-z0-9.+-]+)", 1)

  def licenseClass(license: Column): Column =
    when(license.isin(Permissive: _*), "permissive")
      .when(license.isin(Copyleft: _*), "copyleft")
      .when(license === "", "unknown")
      .otherwise(lit("other"))

  def licenseDocs(spark: SparkSession, dir: String): DataFrame = {
    val withLic = Tables.documents(spark, dir)
      .select(col("doc_id"), licenseOf(col("text")).as("license"))
    withLic.select(col("doc_id"), col("license"),
                   licenseClass(col("license")).as("license_class"))
  }
}
