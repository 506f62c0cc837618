package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The TableIO seam implemented over [[SnapshotTable]] — the proof that the
  * seam's "one-file swap to Iceberg" claim holds: every pipeline that
  * checkpoints through TableIO (KG pipeline, curation funnel, delta modes,
  * StagedRun) runs unchanged on snapshot-committed tables
  * (SnapshotTableIOSpec runs the staged-resume machinery over this).
  *
  * Semantics mapping:
  *  - `write`  → [[SnapshotTable.writeOverwrite]] — an atomic snapshot
  *    commit (the two-phase-rename dance of [[ParquetTableIO]] becomes a
  *    single manifest publish; old snapshots stay readable until expired);
  *  - `write(partitionBy=cols)` → the rows are RANGE-CLUSTERED by those
  *    columns before the commit, so the per-file min/max stats make
  *    [[SnapshotTable.readRange]] skip files the way Hive directory
  *    pruning skips partitions — Iceberg's hidden-partitioning story: the
  *    layout detail disappears from the path, the pruning survives;
  *  - `append` → metadata-only append commit;
  *  - `drop`/`exists`/`list` → table-directory granularity, as before.
  */
class SnapshotTableIO(val root: String) extends TableIO {
  /** Files-per-write for partitionBy clustering; small default keeps
    * sandbox tables multi-file so pruning is observable. */
  var clusterFiles: Int = 8

  private def t(table: String) = new SnapshotTable(root, table)

  override def read(spark: SparkSession, table: String): DataFrame =
    t(table).read(spark)

  override def write(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Unit = {
    val shaped =
      if (partitionBy.nonEmpty) df.repartitionByRange(clusterFiles, partitionBy.map(col): _*)
      else df
    t(table).writeOverwrite(shaped)
    ()
  }

  override def append(df: DataFrame, table: String): Unit = {
    val tab = t(table)
    if (tab.exists(df.sparkSession)) tab.append(df) else tab.writeOverwrite(df)
    ()
  }

  override def exists(spark: SparkSession, table: String): Boolean =
    t(table).exists(spark)

  override def drop(spark: SparkSession, table: String): Unit =
    t(table).drop(spark)

  override def list(spark: SparkSession, prefix: String): Seq[String] = {
    val dir = new Path(s"$root/$prefix")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory && fs.exists(new Path(s.getPath, "meta")))
      .map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
      .sorted
  }
}
