package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (delta) ingest primitives — the batch counterpart of the
  * streaming path, and what a 10^12-file deployment actually runs day to day:
  * nobody re-extracts an unchanged exabyte corpus.
  *
  * Change detection is content-hash based (the same sha256 column the
  * pipeline's per-row invariant already materializes): a file is CHANGED when
  * its (key, sha) pair is absent from the previous run's stage0 checkpoint —
  * that covers both brand-new keys and same-key content drift; a previous
  * row is STALE when its (key, sha) is absent from the current corpus —
  * modified or deleted. The expensive per-byte stages (tokenizing content,
  * extraction, the candidate join) then run on the changed files ONLY, and
  * the unchanged files' checkpointed per-file intermediates are composed back
  * in with an anti-join against the stale keys — a shuffle of compact key
  * columns, never of content. On Iceberg the stale/changed sets come from
  * snapshot diff metadata; the composition is identical.
  *
  * The corpus-GLOBAL stages (IDF, majority vote) are recomputed over the
  * composed compact intermediates, so a delta run's output is EXACTLY a full
  * run's output on the new corpus (golden-tested in DeltaSpec) — not an
  * approximation with a frozen IDF (the streaming path documents that other
  * contract).
  */
object Delta {

  /** The file identity key (input_hint: repo, path, commit). */
  val FileKey: Seq[String] = Seq("repo", "path", "commit")

  /** Rows of `cur` that are new or content-changed vs `prev` — (key, sha)
    * anti-join. Both frames must carry `sha` alongside the key columns. */
  def changed(cur: DataFrame, prev: DataFrame,
              keys: Seq[String] = FileKey, sha: String = "sha256"): DataFrame =
    cur.join(prev.select((keys :+ sha).map(col): _*), keys :+ sha, "left_anti")

  /** Keys of `prev` rows that did not survive into `cur` unchanged (modified
    * or deleted) — small when the delta is small, so the survivors anti-join
    * below broadcasts it. */
  def stale(prev: DataFrame, cur: DataFrame,
            keys: Seq[String] = FileKey, sha: String = "sha256"): DataFrame =
    prev.select((keys :+ sha).map(col): _*)
      .join(cur.select((keys :+ sha).map(col): _*), keys :+ sha, "left_anti")
      .select(keys.map(col): _*)

  /** Rows of a previous per-file stage checkpoint that survive into the new
    * corpus: everything except the stale keys. Valid ONLY for file-local
    * stages (extraction, candidates) — corpus-global stages must recompute. */
  def survivors(prevStage: DataFrame, staleKeys: DataFrame,
                keys: Seq[String] = FileKey): DataFrame =
    prevStage.join(staleKeys, keys, "left_anti")

  // --- operator queries (driver contract): change detection over the
  // `documents` testdata, with a deterministic in-query "v2" corpus (every
  // 101st doc deleted, every 7th modified, every 50th cloned as a new id) —
  // the oracle builds the identical v2 in SQL and runs the same anti-joins.
  // The +100000 clone-id offset assumes doc_id < 100000, which the testdata
  // contract guarantees (documents is 500 rows at every sf) — these two
  // queries are parity fixtures for the primitives above, not the production
  // entry point (that is Pipeline.runDelta, which never invents ids).

  private def docsV1(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.Tables.documents(spark, dir).select(col("doc_id"), col("text"))

  private def docsV2(prev: DataFrame): DataFrame =
    prev.filter(col("doc_id") % 101 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" changed")))
          .otherwise(col("text")).as("text"))
      .unionByName(prev.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))

  private def withSha(df: DataFrame): DataFrame =
    df.withColumn("sha256", sha2(col("text"), 256))

  /** New-or-modified docs of the v2 corpus (what a delta run re-extracts);
    * is_new = 1 for brand-new ids, 0 for content drift on an existing id. */
  def changedDocs(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val prev = docsV1(spark, dir)
    changed(withSha(docsV2(prev)), withSha(prev), keys = Seq("doc_id"))
      .select(col("doc_id"),
        when(col("doc_id") >= 100000L, lit(1)).otherwise(lit(0)).as("is_new"))
  }

  /** Previous docs that did not survive unchanged (modified or deleted) —
    * the rows whose per-file intermediates a delta run drops. */
  def staleDocs(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val prev = docsV1(spark, dir)
    stale(withSha(prev), withSha(docsV2(prev)), keys = Seq("doc_id")).select(col("doc_id"))
  }
}
