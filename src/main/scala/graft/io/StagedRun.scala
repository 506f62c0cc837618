package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpointed-stage mechanics shared by the KG pipeline and the
  * training-data curation pipeline: every stage materializes through the
  * [[TableIO]] seam with an atomic commit, then appends per-partition
  * lineage rows AFTER the data commit — so `resume` skips any stage whose
  * lineage says committed by THE SAME run_id, and a crash between data-write
  * and lineage-append re-runs that stage idempotently (north_rule:
  * "resumable from checkpoint with per-partition lineage + metrics").
  */
trait StagedRun {
  def io: TableIO
  def runId: String
  def resume: Boolean

  val LineageTable = "_lineage"

  /** A stage is resumable only when the lineage row was committed by THE SAME
    * run_id — a checkpoint dir written by a different run (e.g. a different
    * corpus size) must never be silently reused for this one. */
  private def committed(spark: SparkSession, stage: String): Boolean =
    resume && io.exists(spark, LineageTable) && io.exists(spark, stage) && {
      io.read(spark, LineageTable)
        .filter(col("stage") === stage && col("status") === "committed" &&
                col("run_id") === runId)
        .limit(1).count() > 0
    }

  /** Run (or resume) one stage: materialize df → checkpoint, lineage last. */
  def stage(spark: SparkSession, name: String, df: => DataFrame,
            partitionBy: Seq[String] = Nil): DataFrame = {
    if (committed(spark, name)) {
      io.read(spark, name)
    } else {
      val t0 = System.nanoTime()
      io.write(df, name, partitionBy)
      val out = io.read(spark, name)
      val wallMs = (System.nanoTime() - t0) / 1000000L
      val lineage = out.groupBy(spark_partition_id().as("partition_id"))
        .agg(count(lit(1)).as("rows_out"))
        .select(lit(runId).as("run_id"), lit(name).as("stage"),
                col("partition_id"), col("rows_out"),
                lit("committed").as("status"), lit(wallMs).as("wall_ms"))
      io.append(lineage, LineageTable)
      val lineageMs = (System.nanoTime() - t0) / 1000000L - wallMs
      if (sys.env.contains("SPARK_GRAFT_STAGE_TIMING"))
        println(s"[stage] $name write=${wallMs}ms lineage=${lineageMs}ms")
      out
    }
  }
}
