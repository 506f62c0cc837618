package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage seam (SURVEY.md §7.3-§7.4).
  *
  * The north rule targets Iceberg tables; this sandbox ships no Iceberg
  * runtime jar, so the interface is kept Iceberg-shaped (partition spec,
  * atomic overwrite, existence/snapshot check) and implemented over a
  * Hive-style partitioned parquet layout. On a real cluster swap in an
  * `IcebergTableIO` backed by `df.writeTo(table).overwritePartitions()` /
  * `spark.read.format("iceberg")` — this file is the only place that changes.
  */
trait TableIO {
  def read(spark: SparkSession, table: String): DataFrame
  /** Atomic overwrite of a table (all-or-nothing, crash-safe). */
  def write(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Unit
  /** Append without replacing existing data (lineage/metrics sinks). */
  def append(df: DataFrame, table: String): Unit
  def exists(spark: SparkSession, table: String): Boolean
  def drop(spark: SparkSession, table: String): Unit
  /** Child table names under a prefix (snapshot/partition discovery — the
    * Iceberg equivalent is the snapshot/partition metadata listing). */
  def list(spark: SparkSession, prefix: String): Seq[String]
}

/** Parquet implementation. Commit protocol (single writer per table):
  * write the new contents to `<table>._tmp`, then a TWO-PHASE swap —
  * `<table>` → `<table>._old`, `._tmp` → `<table>`, delete `._old` last —
  * so every crash point leaves at least one complete copy on disk, and
  * [[recover]] (run before every read/exists/write) finishes or rolls back
  * an interrupted swap: a committed `._tmp` rolls FORWARD, otherwise the
  * `._old` copy rolls back. The previously committed table is therefore
  * never destroyed before its replacement is fully in place (the Iceberg
  * equivalent is a snapshot commit; the old delete-then-rename form had a
  * crash window that lost the only complete copy). */
class ParquetTableIO(val root: String) extends TableIO {
  private def p(table: String) = s"$root/$table"
  private def dstPath(table: String) = new Path(p(table))
  private def tmpPath(table: String) = new Path(p(table) + "._tmp")
  private def oldPath(table: String) = new Path(p(table) + "._old")

  private def fs(spark: SparkSession) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Test seam: crash-injection tests override this to throw at a named
    * point inside [[commitStaged]]. Production: no-op. */
  protected def crashPoint(name: String): Unit = ()

  /** `FileSystem.rename` that reports "source gone" as false instead of the
    * FileNotFoundException some implementations (ChecksumFileSystem's copy
    * fallback) throw — a concurrent recover() winning the same rename is a
    * benign outcome the callers check for explicitly. */
  private def renameQuiet(f: FileSystem, from: Path, to: Path): Boolean =
    try f.rename(from, to)
    catch { case _: java.io.FileNotFoundException => false }

  /** Finish (or roll back) a swap interrupted by a crash, so readers always
    * see a complete table. Invariant of the commit order (tmp is fully
    * written BEFORE any rename): if `dst` is missing but `._old` exists,
    * the `._tmp` from that commit is complete — roll forward; a torn
    * `._tmp` can only coexist with an intact `dst` (crash mid-write) and is
    * simply ignored until the next write replaces it. */
  private def recover(f: FileSystem, table: String): Unit = {
    val dst = dstPath(table); val tmp = tmpPath(table); val old = oldPath(table)
    if (f.exists(dst)) {
      // commit either completed (stale ._old) or never started (stale ._tmp)
      if (f.exists(old)) f.delete(old, true)
    } else if (f.exists(old)) {
      if (f.exists(tmp)) { // crash between the two renames: roll forward
        // a concurrent recover may win the same rename — losing is fine
        if (!renameQuiet(f, tmp, dst) && !(f.exists(dst) && !f.exists(tmp)))
          throw new java.io.IOException(s"recovery rename failed: $tmp -> $dst")
        f.delete(old, true)
      } else { // defensive: no committed tmp — roll back to the old copy
        if (!renameQuiet(f, old, dst) && !f.exists(dst))
          throw new java.io.IOException(s"recovery rename failed: $old -> $dst")
      }
    }
  }

  override def read(spark: SparkSession, table: String): DataFrame = {
    recover(fs(spark), table)
    spark.read.parquet(p(table))
  }

  /** Delete any stale `._tmp` and return its path: a multi-job writer
    * (e.g. per-partition compaction) assembles the new table contents here,
    * then [[commitStaged]] publishes them atomically. */
  def stagePath(spark: SparkSession, table: String): Path = {
    val f = fs(spark)
    recover(f, table)
    val tmp = tmpPath(table)
    if (f.exists(tmp)) f.delete(tmp, true)
    tmp
  }

  /** Two-phase swap of a fully-written `._tmp` into place. Every crash
    * point leaves a complete table recoverable by [[recover]]. */
  def commitStaged(spark: SparkSession, table: String): Unit = {
    val f = fs(spark)
    val dst = dstPath(table); val tmp = tmpPath(table); val old = oldPath(table)
    require(f.exists(tmp), s"commitStaged: nothing staged at $tmp")
    if (f.exists(old)) f.delete(old, true)
    crashPoint("before-swap")
    if (f.exists(dst) && !f.rename(dst, old))
      throw new java.io.IOException(s"atomic rename failed: $dst -> $old")
    crashPoint("mid-swap")
    // tolerate a concurrent reader's recover() having rolled this very
    // commit forward between the two renames (its rename wins, ours fails,
    // but the staged contents ARE the table now — not an error)
    if (!renameQuiet(f, tmp, dst) && !(f.exists(dst) && !f.exists(tmp)))
      throw new java.io.IOException(s"atomic rename failed: $tmp -> $dst")
    crashPoint("after-swap")
    f.delete(old, true)
  }

  override def write(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val tmp = stagePath(spark, table)
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(tmp.toString)
    commitStaged(spark, table)
  }

  override def append(df: DataFrame, table: String): Unit = {
    recover(fs(df.sparkSession), table)
    df.write.mode("append").parquet(p(table))
  }

  override def exists(spark: SparkSession, table: String): Boolean = {
    recover(fs(spark), table)
    fs(spark).exists(dstPath(table))
  }

  override def drop(spark: SparkSession, table: String): Unit = {
    val f = fs(spark)
    f.delete(dstPath(table), true)
    f.delete(tmpPath(table), true)
    f.delete(oldPath(table), true)
  }

  override def list(spark: SparkSession, prefix: String): Seq[String] = {
    val f = fs(spark)
    val dir = new Path(p(prefix))
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filterNot(n => n.endsWith("._tmp") || n.endsWith("._old") ||
                      n.startsWith("_") || n.startsWith("."))
      .sorted
  }
}
