package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import graft.kg.{Candidates, Canonicalize, Extract, Scoring}

/** Structured Streaming front-end (SURVEY.md §2.9: the reference is batch-only,
  * so this is an additive capability, not a port requirement).
  *
  * The batch operators compose directly because extraction is STATELESS
  * (per-line contexts are computed in-row — no window, no shuffle), and the
  * candidate join is stream-static with a broadcast dictionary. The
  * aggregating stages (IDF, cosine, majority vote) run per micro-batch via
  * foreachBatch — each arriving chunk of the corpus is annotated with
  * batch semantics and its triples appended; IDF is micro-batch-local,
  * which is the standard streaming approximation (document statistics
  * converge as batches grow; a production deployment would broadcast a
  * periodically refreshed global IDF snapshot).
  */
object StreamingPipeline {

  /** The fixed input_hint schema (nothing inferred on a stream). */
  val SrcSchema: StructType = StructType(Seq(
    StructField("repo", StringType), StructField("path", StringType),
    StructField("commit", StringType), StructField("lang", StringType),
    StructField("content", StringType)))

  /** Incremental KG construction: watch `srcDir` for arriving src_files
    * parquet, annotate each micro-batch, append triples to `outDir`. */
  def start(spark: SparkSession, srcDir: String, kb: DataFrame, kbCtx: DataFrame,
            outDir: String, checkpointDir: String): StreamingQuery = {
    val dict = Candidates.dictionary(kb)
    val stream = spark.readStream.schema(SrcSchema).parquet(srcDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val perLine = Extract.perLine(batch)
        val mentions = Extract.mentionsFromLines(perLine)
        val cands = Candidates.candidates(mentions, dict, broadcastDict = true)
        val top1 = Scoring.top1(
          Scoring.score(mentions, cands, kbCtx, Some(Extract.contexts(perLine))))
        Canonicalize.triples(Canonicalize.canonicalMentions(mentions, top1))
          .write.mode("append").parquet(outDir)
      }
      .start()
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
