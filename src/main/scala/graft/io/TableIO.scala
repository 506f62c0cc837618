package graft.io

import org.apache.hadoop.fs.Path
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

/** Parquet implementation. Atomicity: write to `<table>._tmp`, then a single
  * filesystem rename — a crashed writer leaves only a torn `._tmp` that the
  * next run overwrites; readers never observe partial data (the Iceberg
  * equivalent is a snapshot commit). */
final class ParquetTableIO(val root: String) extends TableIO {
  private def p(table: String) = s"$root/$table"

  private def fs(spark: SparkSession) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(p(table))

  override def write(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val tmp = new Path(p(table) + "._tmp")
    val dst = new Path(p(table))
    val f = fs(spark)
    if (f.exists(tmp)) f.delete(tmp, true)
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(tmp.toString)
    if (f.exists(dst)) f.delete(dst, true)
    if (!f.rename(tmp, dst))
      throw new java.io.IOException(s"atomic rename failed: $tmp -> $dst")
  }

  override def append(df: DataFrame, table: String): Unit =
    df.write.mode("append").parquet(p(table))

  override def exists(spark: SparkSession, table: String): Boolean =
    fs(spark).exists(new Path(p(table)))

  override def drop(spark: SparkSession, table: String): Unit = {
    val f = fs(spark)
    f.delete(new Path(p(table)), true)
    f.delete(new Path(p(table) + "._tmp"), true)
  }

  override def list(spark: SparkSession, prefix: String): Seq[String] = {
    val f = fs(spark)
    val dir = new Path(p(prefix))
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filterNot(n => n.endsWith("._tmp") || n.startsWith("_") || n.startsWith("."))
      .sorted
  }
}
