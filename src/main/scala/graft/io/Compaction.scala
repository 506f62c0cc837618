package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the operations tool every long-running table
  * eventually needs: streaming micro-batch sinks, per-batch appends
  * (`TableIO.append` lineage/stats tables) and high-churn delta runs all
  * accumulate many small files, and at cluster scale small files tax the
  * NameNode/manifest layer, the scan planner (one task per tiny split) and
  * the shuffle that follows the scan.
  *
  * `compact` rewrites a table into ~`targetBytes`-sized files, preserving
  * rows exactly (count + content — asserted in CompactionSpec) and
  * committing through the SAME two-phase-rename commit the TableIO seam
  * uses — readers never observe a partially-compacted table, and a crashed
  * compaction leaves a complete copy of the original recoverable at every
  * crash point (crash-injection-tested in CompactionSpec). A Hive-partitioned
  * layout (`k=v` directories — e.g. the `pred=`-partitioned triple sink) is
  * detected from disk and compacted PER PARTITION, so directory-level
  * partition pruning survives compaction (plan-asserted). The file count is
  * derived from each partition's CURRENT on-disk bytes (not row estimates),
  * and `maxRecordsPerFile` is deliberately NOT used — the split count is the
  * explicit contract. On Iceberg this whole class is `rewrite_data_files`
  * (the compaction maintenance procedure, which likewise rewrites file
  * groups within each partition); keeping the call-site shape identical
  * makes that the usual one-file swap. */
object Compaction {

  private def fsOf(spark: SparkSession, io: ParquetTableIO): FileSystem =
    new Path(io.root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def bytesUnder(fs: FileSystem, path: Path): Long = {
    val it = fs.listFiles(path, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_")) total += f.getLen
    }
    total
  }

  /** Bytes currently on disk under `table` (data files only). */
  def tableBytes(spark: SparkSession, io: ParquetTableIO, table: String): Long =
    bytesUnder(fsOf(spark, io), new Path(s"${io.root}/$table"))

  /** Data-file count under `table` (excludes _SUCCESS/_metadata). */
  def fileCount(spark: SparkSession, io: ParquetTableIO, table: String): Long = {
    val fs = fsOf(spark, io)
    val it = fs.listFiles(new Path(s"${io.root}/$table"), true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_") && f.getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }

  /** Partition column chain derived from the on-disk Hive layout (`k=v`
    * directories), outermost first; empty for an unpartitioned table. */
  def partitionColumns(spark: SparkSession, io: ParquetTableIO, table: String): Seq[String] = {
    val fs = fsOf(spark, io)
    val cols = Seq.newBuilder[String]
    var dir = new Path(s"${io.root}/$table")
    var done = false
    while (!done) {
      val kv = fs.listStatus(dir).filter(s => s.isDirectory && s.getPath.getName.contains("="))
      if (kv.isEmpty) done = true
      else {
        cols += kv.head.getPath.getName.takeWhile(_ != '=')
        dir = kv.head.getPath
      }
    }
    cols.result()
  }

  /** Relative paths of the leaf partition directories (depth = number of
    * partition columns); `Seq("")` for an unpartitioned table. */
  private def leafDirs(fs: FileSystem, root: Path, depth: Int): Seq[String] = {
    def walk(dir: Path, d: Int, rel: String): Seq[String] =
      if (d == 0) Seq(rel)
      else fs.listStatus(dir)
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .toSeq.sortBy(_.getPath.getName)
        .flatMap(s => walk(s.getPath, d - 1,
          if (rel.isEmpty) s.getPath.getName else s"$rel/${s.getPath.getName}"))
    walk(root, depth, "")
  }

  /** Rewrite `table` into ceil(bytes/targetBytes) files per partition (≥1),
    * atomically, preserving any Hive partition layout found on disk.
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, io: ParquetTableIO, table: String,
              targetBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = fsOf(spark, io)
    val before = fileCount(spark, io, table)
    val tableRoot = new Path(s"${io.root}/$table")
    val parts = partitionColumns(spark, io, table)
    val stage = io.stagePath(spark, table)
    // one rewrite job per leaf partition dir: the relative `k=v/...` path is
    // copied verbatim into the staged layout, so the committed table keeps
    // the exact partition directory structure (and its pruning). coalesce,
    // not repartition: compaction must not pay a shuffle — it only narrows
    // the write parallelism (the read stays parallel per source file). The
    // per-partition jobs run serially here; on a cluster they are
    // embarrassingly parallel (Iceberg's rewrite_data_files file groups).
    leafDirs(fs, tableRoot, parts.length).foreach { rel =>
      val src = if (rel.isEmpty) tableRoot else new Path(tableRoot, rel)
      val bytes = bytesUnder(fs, src)
      val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      val dstDir = if (rel.isEmpty) stage.toString else s"$stage/$rel"
      spark.read.parquet(src.toString).coalesce(nFiles)
        .write.mode("overwrite").parquet(dstDir)
    }
    io.commitStaged(spark, table)
    (before, fileCount(spark, io, table))
  }
}
