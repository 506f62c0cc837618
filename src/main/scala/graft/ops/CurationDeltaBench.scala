package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.ParquetTableIO

/** Scale benchmark for the curation funnel's DELTA mode: run the full
  * funnel on a generated v1 corpus, then a delta run against a ~1.25% churned
  * v2 (0.5% modified in place, 0.25% deleted, 0.5% new), then a FULL run on v2
  * for the honest comparison — delta output must row-count-match the full
  * v2 run (the byte-exactness is golden-tested in CurationDeltaSpec; here
  * we measure wall-clock at corpus scale).
  *
  * Churn is deterministic column arithmetic over [[CurationBench.docCorpus]]
  * (same corpus on every run and cluster size):
  *   - id % 200 == 5  → text gets one extra word (modified)
  *   - id % 400 == 7  → dropped (deleted)
  *   - n..n+n/200     → appended (new docs)
  *
  * Usage: `SPARK_GRAFT_CPUS=N SPARK_GRAFT_CURATION_DOCS=M
  *         runMain graft.ops.CurationDeltaBench <workDir>`
  */
object CurationDeltaBench {

  def v2Corpus(spark: SparkSession, n: Long): DataFrame = {
    CurationBench.docCorpus(spark, n + n / 200)
      .filter(!(col("doc_id") % 400 === 7 && col("doc_id") < n))
      .withColumn("text",
        when(col("doc_id") % 200 === 5 && col("doc_id") < n,
          concat(col("text"), lit(" modifiedword")))
          .otherwise(col("text")))
  }

  def main(args: Array[String]): Unit = {
    val work = if (args.nonEmpty) args(0) else "target/curation_delta_bench"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_CURATION_DOCS", "200000").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val v1 = CurationBench.docCorpus(spark, nDocs)
      val v2 = v2Corpus(spark, nDocs)
      def timed(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      // base: full funnel on v1 (durable signatures — the composition base)
      val (baseSec, baseOut) = timed {
        new CurationPipeline(new ParquetTableIO(s"$work/v1"), "cdb-v1")
          .run(spark, v1, durableSignatures = true).count()
      }
      // delta: v2 against v1's checkpoints
      val (deltaSec, deltaOut) = timed {
        new CurationPipeline(new ParquetTableIO(s"$work/v2d"), "cdb-v2")
          .runDelta(spark, v2, new ParquetTableIO(s"$work/v1")).count()
      }
      // honest comparison: full funnel on v2
      val (fullSec, fullOut) = timed {
        new CurationPipeline(new ParquetTableIO(s"$work/v2f"), "cdb-v2")
          .run(spark, v2, durableSignatures = true).count()
      }
      require(deltaOut == fullOut,
        s"delta ($deltaOut) != full ($fullOut) survivors on v2")
      // CDC variant: the corpus lives in a snapshot table, churn arrives as
      // upsert commits, and d0's churn keys come from snapshot METADATA
      // (runDeltaFromSnapshots) instead of the two-full-scan sha diff
      val corpus = new graft.io.SnapshotTable(s"$work/corpus", "docs")
      corpus.writeOverwrite(v1) // snapshot 1 — the state the base run saw
      val staleIds = spark.range(0, nDocs).select(col("id").as("doc_id"))
        .filter(col("doc_id") % 200 === 5 || col("doc_id") % 400 === 7)
      val appendedRows = v2.filter(
        (col("doc_id") % 200 === 5 && col("doc_id") < nDocs) || col("doc_id") >= nDocs)
      corpus.deleteWhereKeys(staleIds, Seq("doc_id")) // snapshot 2
      corpus.append(appendedRows)                     // snapshot 3
      val (cdcSec, cdcOut) = timed {
        new CurationPipeline(new ParquetTableIO(s"$work/v2cdc"), "cdb-cdc")
          .runDeltaFromSnapshots(spark, corpus, 1L, new ParquetTableIO(s"$work/v1"))
          .count()
      }
      require(cdcOut == fullOut,
        s"CDC delta ($cdcOut) != full ($fullOut) survivors on v2")
      println(f"""{"metric":"curation_delta","docs":$nDocs,"cpus":$cpus,"base_v1_sec":$baseSec%.1f,"delta_sec":$deltaSec%.1f,"cdc_delta_sec":$cdcSec%.1f,"full_v2_sec":$fullSec%.1f,"survivors":$deltaOut,"delta_over_full":${deltaSec / fullSec}%.2f,"cdc_over_full":${cdcSec / fullSec}%.2f}""")
    } finally spark.stop()
  }
}
