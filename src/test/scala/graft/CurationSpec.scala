package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Curation

/** Curation behavior on planted fixtures (the synthetic corpus is clean, so
  * the oracle rows alone would only prove parity-on-zero-matches).
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("decontamination: overlap with the eval set flagged, eval members excluded") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // contains eval shingles
      (2L, "completely unrelated words about database engines"),
      (3L, "quick brown fox appears here too")
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "the quick brown fox ran away")).toDF("doc_id", "text")
    val out = Curation.decontaminate(train, eval)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.contains(1L) && out.contains(3L), s"overlapping docs must be flagged: $out")
    assert(!out.contains(2L), "clean doc flagged")
    assert(!out.contains(100L), "eval member must not flag itself")
  }

  test("redaction: emails, IPs and hex secrets become placeholders, counted") {
    val docs = Seq(
      (1L, "contact alice@example.com or bob@corp.io at 10.0.0.1"),
      (2L, "token deadbeefcafe1234567890abcdef in config"),
      (3L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val out = Curation.redact(docs, col("text"))
      .select("doc_id", "n_emails", "n_ips", "n_secrets", "redacted")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(out(1L)._1 == 2 && out(1L)._2 == 1 && out(1L)._3 == 0)
    assert(out(1L)._4 == "contact <EMAIL> or <EMAIL> at <IP>")
    assert(out(2L)._3 == 1 && out(2L)._4 == "token <SECRET> in config")
    assert(out(3L) == ((0, 0, 0, "nothing sensitive here")))
    // idempotent: redacting already-redacted text changes nothing
    val once = Curation.redact(docs, col("text")).select(col("doc_id"), col("redacted").as("text"))
    val twice = Curation.redact(once, col("text")).select("doc_id", "redacted")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(twice == out.map { case (k, v) => k -> v._4 })
  }

  test("license: SPDX markers classify permissive/copyleft/other/unknown") {
    val docs = Seq(
      (1L, "// SPDX-License-Identifier: MIT\ncode"),
      (2L, "/* SPDX-License-Identifier: GPL-3.0-only */"),
      (3L, "# SPDX-License-Identifier: WTFPL"),
      (4L, "no marker at all")
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        Curation.licenseClass(Curation.licenseOf(col("text"))).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "permissive", 2L -> "copyleft", 3L -> "other", 4L -> "unknown"))
  }
}
