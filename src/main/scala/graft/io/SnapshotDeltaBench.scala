package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what snapshot commits buy the delta modes — the r4 finding this
  * quantifies: on plain parquet, a low-churn delta run pays a FULL REWRITE
  * of every composed checkpoint table (prev ∖ stale ∪ changed → overwrite),
  * which is why CurationDeltaBench crossed over at small corpora (1.37× a
  * full run at 20k docs). With the snapshot format the same composition is
  * an equality-delete of the stale keys plus an append of the churned rows:
  * only churn-sized data is written, the manifest re-lists everything else.
  *
  * The bench isolates exactly the compose step over a representative
  * per-doc checkpoint table (doc_id, sha, 4 band signatures — the
  * c3_minhash_sigs shape) and reports, for parquet-overwrite vs
  * snapshot-commit composition:
  *   - wall seconds and bytes written per compose;
  *   - read wall after K churn days (merge-on-read cost accrual);
  *   - read wall after `rewrite_data_files` compaction.
  *
  * Usage: `SPARK_GRAFT_CPUS=N SPARK_GRAFT_SNAP_ROWS=M SPARK_GRAFT_SNAP_DAYS=K
  *         runMain graft.io.SnapshotDeltaBench <workDir>`
  */
object SnapshotDeltaBench {

  /** Deterministic per-doc checkpoint rows (the compact c3-style shape). */
  def rows(spark: SparkSession, n: Long, day: Int): DataFrame =
    spark.range(0, n).select(
      col("id").as("doc_id"),
      md5(concat(col("id").cast("string"), lit(s"-$day"))).as("sha"),
      (col("id") * 2654435761L % 1048576).as("sig0"),
      (col("id") * 2246822519L % 1048576).as("sig1"),
      (col("id") * 3266489917L % 1048576).as("sig2"),
      (col("id") * 668265263L % 1048576).as("sig3"))

  /** ~2% churn on `day`: ~1% modified in place, ~0.5% deleted, 0.5% new.
    * `maxId` = ids present before today, so modified rows are replaced
    * (their old version goes stale) wherever they live. */
  def churn(spark: SparkSession, n: Long, day: Int): (DataFrame, DataFrame) = {
    val maxId = n + (day - 1) * n / 200
    val changed = rows(spark, n + day * n / 200, day)
      .filter(col("doc_id") % 100 === (day % 50) ||  // ~1% modified
              col("doc_id") >= maxId)                // 0.5% new
    val stale = spark.range(0, maxId).select(col("id").as("doc_id"))
      .filter(col("doc_id") % 100 === (day % 50) ||            // modified: replace
              col("doc_id") % 200 === (day % 50) + 57)         // ~0.5% deleted
    (changed, stale)
  }

  private def dirBytes(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else {
      val it = fs.listFiles(p, true); var t = 0L
      while (it.hasNext) { val f = it.next(); t += f.getLen }
      t
    }
  }

  def main(args: Array[String]): Unit = {
    val work = if (args.nonEmpty) args(0) else "target/snapshot_delta_bench"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val n = sys.env.getOrElse("SPARK_GRAFT_SNAP_ROWS", "1000000").toLong
    val days = sys.env.getOrElse("SPARK_GRAFT_SNAP_DAYS", "5").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      def timed[A](f: => A): (Double, A) = {
        val t0 = System.nanoTime(); val a = f
        ((System.nanoTime() - t0) / 1e9, a)
      }
      val pqIo = new ParquetTableIO(s"$work/pq")
      val snap = new SnapshotTable(s"$work/snap", "ckpt")

      // day 0: identical bases
      pqIo.write(rows(spark, n, 0), "ckpt")
      snap.writeOverwrite(rows(spark, n, 0))

      var pqComposeSec, snComposeSec = 0.0
      var snBytes0 = dirBytes(spark, s"$work/snap")
      var pqWritten, snWritten = 0L
      for (day <- 1 to days) {
        val (changed, stale) = churn(spark, n, day)
        // parquet compose: prev ∖ stale ∪ changed → full overwrite
        val (ps, _) = timed {
          val prev = pqIo.read(spark, "ckpt")
          val composed = prev.join(stale, Seq("doc_id"), "left_anti")
            .unionByName(changed)
          pqIo.write(composed, "ckpt")
        }
        pqComposeSec += ps
        // the overwrite rewrites the whole table: every current byte is new
        pqWritten += dirBytes(spark, s"$work/pq")
        // snapshot compose: metadata-only — delete stale keys, append churn
        val (ss, _) = timed {
          snap.deleteWhereKeys(stale, Seq("doc_id"))
          snap.append(changed)
        }
        snComposeSec += ss
        // nothing is deleted on disk: new bytes = directory growth
        val sb = dirBytes(spark, s"$work/snap"); snWritten += sb - snBytes0; snBytes0 = sb
      }

      // read costs: parquet plain scan vs merge-on-read after K days
      val (pqReadSec, pqRows) = timed(pqIo.read(spark, "ckpt").count())
      val (snReadSec, snRows) = timed(snap.read(spark).count())
      require(pqRows == snRows, s"compose divergence: parquet $pqRows vs snapshot $snRows")
      // value equality, not just counts
      val diff = pqIo.read(spark, "ckpt").exceptAll(snap.read(spark)).count() +
                 snap.read(spark).exceptAll(pqIo.read(spark, "ckpt")).count()
      require(diff == 0, s"compose divergence: $diff differing rows")

      val (rwSec, _) = timed(snap.rewriteDataFiles(spark))
      val (snReadSec2, _) = timed(snap.read(spark).count())

      // z-order vs linear clustering: same rows, rewritten two ways; a
      // range scan on the NON-PREFIX dimension (sig0) measures what the
      // Morton curve buys — the linear (doc_id, sig0) sort gives sig0 no
      // locality, so its scan opens every file
      val zt = new SnapshotTable(s"$work/zorder", "ckpt")
      val lt = new SnapshotTable(s"$work/linear", "ckpt")
      val base = snap.read(spark)
      zt.writeOverwrite(base); lt.writeOverwrite(base)
      val target = 2L * 1024 * 1024 // small files on purpose: the PRUNE FRACTION is the measurement
      val (zRwSec, _) = timed(zt.rewriteDataFilesZOrder(spark, "doc_id", "sig0", target))
      val (lRwSec, _) = timed(lt.rewriteDataFiles(spark, target, sortBy = Seq("doc_id", "sig0")))
      val lo = Some(100000L); val hi = Some(149999L) // ~1/21 of the sig0 domain
      val (zScanSec, zPr) = timed {
        val pr = zt.readRange(spark, "sig0", lo, hi); pr.df.count(); pr
      }
      val (lScanSec, lPr) = timed {
        val pr = lt.readRange(spark, "sig0", lo, hi); pr.df.count(); pr
      }
      require(zPr.df.count() == lPr.df.count(), "z-order scan must be row-identical")

      println(f"""{"metric":"snapshot_delta_compose","rows":$n,"days":$days,"cpus":$cpus,"churn_pct":2.0,"pq_compose_sec":$pqComposeSec%.1f,"snap_compose_sec":$snComposeSec%.1f,"pq_bytes_written":$pqWritten,"snap_bytes_written":$snWritten,"pq_read_sec":$pqReadSec%.2f,"snap_mor_read_sec":$snReadSec%.2f,"rewrite_sec":$rwSec%.1f,"snap_read_after_rewrite_sec":$snReadSec2%.2f,"rows_out":$snRows,"zorder_rewrite_sec":$zRwSec%.1f,"linear_rewrite_sec":$lRwSec%.1f,"zorder_scan_sec":$zScanSec%.2f,"linear_scan_sec":$lScanSec%.2f,"zorder_files_scanned":${zPr.filesScanned},"linear_files_scanned":${lPr.filesScanned},"files_total":${zPr.filesTotal}}""")
    } finally spark.stop()
  }
}
