package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction — the operations tool every long-running table
  * eventually needs: streaming micro-batch sinks, per-batch appends
  * (`TableIO.append` lineage/stats tables) and high-churn delta runs all
  * accumulate many small files, and at cluster scale small files tax the
  * NameNode/manifest layer, the scan planner (one task per tiny split) and
  * the shuffle that follows the scan.
  *
  * `compact` rewrites a table into ~`targetBytes`-sized files, preserving
  * rows exactly (count + content — asserted in CompactionSpec) and
  * committing through the SAME atomic tmp+rename the TableIO seam uses —
  * readers never observe a partially-compacted table, and a crashed
  * compaction leaves the original untouched. The file count is derived
  * from the table's CURRENT on-disk bytes (not row estimates), and
  * `maxRecordsPerFile` is deliberately NOT used — the split count is the
  * explicit contract. On Iceberg this whole class is
  * `rewrite_data_files` (the compaction maintenance procedure); keeping the
  * call-site shape identical makes that the usual one-file swap. */
object Compaction {

  /** Bytes currently on disk under `table` (data files only). */
  def tableBytes(spark: SparkSession, io: ParquetTableIO, table: String): Long = {
    val path = new Path(s"${io.root}/$table")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_")) total += f.getLen
    }
    total
  }

  /** Data-file count under `table` (excludes _SUCCESS/_metadata). */
  def fileCount(spark: SparkSession, io: ParquetTableIO, table: String): Long = {
    val path = new Path(s"${io.root}/$table")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_") && f.getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }

  /** Rewrite `table` into ceil(bytes/targetBytes) files (≥1), atomically.
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, io: ParquetTableIO, table: String,
              targetBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val before = fileCount(spark, io, table)
    val bytes = tableBytes(spark, io, table)
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    // coalesce, not repartition: compaction must not pay a shuffle — it only
    // narrows the write parallelism (the read stays parallel per source file)
    val df = io.read(spark, table).coalesce(nFiles)
    io.write(df, table)
    (before, fileCount(spark, io, table))
  }
}
