package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import graft.io.ParquetTableIO
import graft.kg.{Candidates, Canonicalize, Extract, Scoring}

/** Structured Streaming front-end (SURVEY.md §2.9: the reference is batch-only,
  * so this is an additive capability, not a port requirement).
  *
  * The batch operators compose directly because extraction is STATELESS
  * (per-line contexts are computed in-row — no window, no shuffle), and the
  * candidate join is stream-static with a broadcast dictionary. The
  * aggregating stages (IDF, cosine, majority vote) run per micro-batch via
  * foreachBatch with two streaming-specific guarantees:
  *
  *  - **exactly-once output**: Structured Streaming replays a failed
  *    micro-batch (at-least-once), so every write is keyed by batchId and
  *    committed through the TableIO atomic tmp+rename seam; a replayed batch
  *    whose triples already committed is skipped entirely.
  *  - **global IDF snapshot**: each batch first commits its additive IDF
  *    contribution (per-term df + context count), then scores against the
  *    accumulated stats of ALL batches so far — so a batch's scores match
  *    the batch pipeline run over every file seen up to and including it
  *    exactly (asserted in StreamingSpec), instead of drifting on
  *    micro-batch-local document statistics.
  */
object StreamingPipeline {

  /** The fixed input_hint schema (nothing inferred on a stream). */
  val SrcSchema: StructType = StructType(Seq(
    StructField("repo", StringType), StructField("path", StringType),
    StructField("commit", StringType), StructField("lang", StringType),
    StructField("content", StringType)))

  /** Incremental KG construction: watch `srcDir` for arriving src_files
    * parquet, annotate each micro-batch, commit triples to
    * `outDir/batch=<id>` (atomic, replay-idempotent). Per-mention top-1
    * scores are also committed under `outDir/_scores/batch=<id>` (an
    * underscore path — invisible to a plain parquet read of outDir) so the
    * stream≡batch score equality is externally checkable. */
  def start(spark: SparkSession, srcDir: String, kb: DataFrame, kbCtx: DataFrame,
            outDir: String, checkpointDir: String): StreamingQuery = {
    val dict = Candidates.dictionary(kb)
    val outIo = new ParquetTableIO(outDir)
    val statsIo = new ParquetTableIO(s"$checkpointDir/idf_stats")
    val stream = spark.readStream.schema(SrcSchema).parquet(srcDir)
    stream.writeStream
      .option("checkpointLocation", s"$checkpointDir/query")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, dict, kbCtx, outIo, statsIo)
      }
      .start()
  }

  /** One micro-batch, replay-idempotent (public so the exactly-once contract
    * is directly testable: calling it twice with the same batchId is a
    * no-op the second time). */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                   dict: DataFrame, kbCtx: DataFrame,
                   outIo: ParquetTableIO, statsIo: ParquetTableIO): Unit = {
    val triplesTable = s"batch=$batchId"
    // replayed batch whose output already committed → skip (idempotence)
    if (!outIo.exists(spark, triplesTable)) {
      val perLine = Extract.perLine(batch)
      val contexts = Extract.contexts(perLine)
      // 1. commit this batch's additive IDF contribution FIRST, so the
      //    snapshot below always includes the current batch (overwrite is
      //    deterministic, so a replay after a crash rewrites identical
      //    stats rather than double-counting)
      statsIo.write(Scoring.termDf(contexts), s"df/batch=$batchId")
      statsIo.write(contexts.agg(count(lit(1)).as("n")), s"n/batch=$batchId")
      // 2. global IDF snapshot over every batch seen so far
      val idf = Scoring.idfFromStats(
        statsIo.read(spark, "df").select(col("term"), col("df")),
        statsIo.read(spark, "n").agg(sum(col("n")).as("n")))
      val mentions = Extract.mentionsFromLines(perLine)
      val cands = Candidates.candidates(mentions, dict, broadcastDict = true)
      val top1 = Scoring.top1(Scoring.score(mentions, cands, kbCtx,
        Some(contexts), idfOverride = Some(idf)))
      outIo.write(top1, s"_scores/batch=$batchId")
      // triples commit LAST: its existence marks the batch done
      outIo.write(Canonicalize.triples(Canonicalize.canonicalMentions(mentions, top1)),
                  triplesTable)
    }
  }

  /** Natively streaming link stream (no aggregation): mention extraction +
    * stream-static candidate join, append mode — the shape that scales to a
    * continuous firehose where per-batch voting is done downstream. */
  def linkStream(spark: SparkSession, srcDir: String, kb: DataFrame): DataFrame = {
    val dict = Candidates.dictionary(kb)
    val stream = spark.readStream.schema(SrcSchema).parquet(srcDir)
    Extract.mentionsFromLines(Extract.perLine(stream))
      .join(broadcast(dict), col("norm") === col("norm_key"), "inner")
      .select(col("mention_id"), col("repo"), col("path"), col("commit"),
              col("line"), col("kind"), col("surface"), col("entity_id"), col("prior"))
  }

  /** Watermarked tumbling-window aggregation over an event stream (the
    * classic Structured Streaming shape, exercised on the events table).
    * `watermark = false` gives the identical batch aggregation for parity. */
  def eventWindowCounts(events: DataFrame, watermark: Boolean = true): DataFrame = {
    // the testdata writes ts as TIMESTAMP_NTZ; event-time watermarks need TIMESTAMP
    val e = events.withColumn("ts", col("ts").cast("timestamp"))
    (if (watermark) e.withWatermark("ts", "10 minutes") else e)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
              col("n"), col("total_value"))
  }
}
