package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media (image/audio/video) as opaque `binary`
  * columns with typed metadata.
  *
  * The real decode/feature-extract step needs native media libraries that do
  * not exist in this container — it is STUBBED as a deterministic fake
  * ([[fakeDecode]]) with the Spark-side plumbing kept real: binary column
  * construction, per-row metadata schema, batched partition-level processing
  * shape, and pushdown-friendly projections. Swapping in a real decoder means
  * replacing ONLY the marked expressions (or, for a Python pipeline, an
  * equivalent `mapInPandas` batch UDF with the same schema).
  */
object Multimodal {

  /** Binary "media" column + metadata. `encode(text)` stands in for real
    * media bytes; everything downstream treats it as opaque binary. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame = {
    val b = encode(col("text"), "UTF-8")
    Tables.documents(spark, dir).select(
      col("doc_id"),
      length(b).as("byte_len"),
      lower(substring(hex(b), 1, 32)).as("head_hex"),
      // ---- STUB: deterministic fake decode (no media libs in container) ----
      (lit(1) + length(b) % 640).as("fake_width"),
      (lit(1) + (length(b) * 7) % 480).as("fake_height"),
      lit(3).as("channels"),
      round((length(b) % 256).cast("double") / 255.0, 6).as("fake_mean_pixel"))
  }

  /** Resize plumbing: target-box scaling arithmetic on the (stubbed) decoded
    * dimensions — pure column expressions, so a real decoder swap keeps this
    * untouched. Aspect-preserving fit into maxW×maxH using integer math
    * (floor), like a thumbnailer. */
  def resizeMeta(media: DataFrame, maxW: Int = 64, maxH: Int = 64): DataFrame =
    media.select(col("doc_id"), col("fake_width").as("w"), col("fake_height").as("h"))
      .select(col("doc_id"), col("w"), col("h"),
        least(expr(s"(${maxW}0000 div w)"), expr(s"(${maxH}0000 div h)")).as("scale_e4"))
      .select(col("doc_id"), col("w"), col("h"),
        greatest(lit(1L), expr("(w * scale_e4) div 10000")).cast("int").as("out_w"),
        greatest(lit(1L), expr("(h * scale_e4) div 10000")).cast("int").as("out_h"))

  /** Frame-sampling plumbing for video-like payloads: derive a deterministic
    * frame count from the byte length (STUB — a real demuxer reads the
    * container), then emit every k-th frame offset as one row per sampled
    * frame — the generator shape (1 media row → N frame rows) a real
    * frame-sampler produces. */
  def frameSample(media: DataFrame, everyK: Int = 10): DataFrame =
    media.select(col("doc_id"),
        // ---- STUB: fake frame count from byte length (no demuxer in container)
        (lit(1) + col("byte_len") % 100).cast("int").as("n_frames"))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))).as("frame_idx"))

  /** Batched decode shape (the mapInPandas equivalent): processes whole
    * partitions of binary payloads at once. The per-batch body is the stub;
    * the batching, schema and distribution are the real plumbing.
    *
    * Cost note (measured): the typed object boundary pays ~1.5 s of ONE-TIME
    * serializer codegen + classloading on its first execution in a JVM;
    * steady-state runs are ~0.3 s on the 500-row table (run2/run3 timings).
    * The bench, which times first executions, charges that fixed cost here —
    * per-row throughput is unaffected, and at production scale a real decoder
    * dwarfs it. Kept as-is: removing the boundary would remove exactly the
    * seam a real decoder plugs into. */
  def fakeDecode(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), encode(col("head_hex"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // STUB: a real implementation would hand `batch` (an iterator of
        // payloads) to a native decoder; the deterministic fake derives
        // "features" from the byte lengths.
        batch.map { case (id, bytes) =>
          (id, bytes.length, bytes.take(4).map(_.toInt & 0xff).sum.toDouble / 1020.0)
        }
      }
      .toDF("doc_id", "payload_len", "fake_feature")
  }
}
