package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** The streaming INGEST half of the curation story, composed from the
  * tested streaming operators: a daily-crawl stream is gated and thinned
  * BEFORE it ever lands in the corpus, so the nightly batch funnel (the
  * corpus-global authority — near-dup CC, span dedup, split/pack) works on
  * pre-cleaned input.
  *
  *   stream → c1 quality gate (in-row, stateless)
  *          → exact dedup within the watermark horizon (bounded state)
  *          → near-dup drop vs the published batch signature index
  *            (stream-static anti joins, stateless)
  *
  * Every stage mirrors its batch counterpart's semantics: the quality gate
  * applies the same integer-ppm thresholds as the batch funnel's c1
  * (`TextAnalysis.qualityFor` — identical arithmetic, so a doc gated here
  * would have been gated there); exact dedup is content-sha keyed
  * ([[StreamingDedup]]); the near-dup filter uses band signatures identical
  * to the batch table's by construction ([[StreamingNearDedup]]).
  *
  * State/scale: the ONLY stateful operator is the watermark-bounded
  * dropDuplicatesWithinWatermark — quality and near-dup are per-row
  * expressions + stream-static joins, so state never grows with corpus
  * size, only with the dedup horizon. */
object StreamingIngestFunnel {

  /** `stream`: (doc_id, text, ts, ...); `index`: the batch-published
    * (band, sig) table. Emits survivors with their quality stats, sha256
    * and band signatures (everything the nightly batch consolidation needs
    * to append them to the corpus + index without recomputation). */
  def apply(stream: DataFrame, index: DataFrame,
            horizon: String = "10 minutes",
            minTokens: Long = 5L, minQualityPpm: Long = 400000L,
            minAlphaPpm: Long = 500000L): DataFrame = {
    // the stats are APPENDED per row (withQualityStats), so the gate is a
    // plain filter and the payload rides through — no self-join; alpha_ppm
    // is the symbol-soup catch, exactly as in the batch c1 gate
    // (quality_ppm alone scores stopword-free garbage at 500k)
    val gated = TextAnalysis.withQualityStats(stream)
      .filter(col("n_tokens") >= minTokens &&
              col("quality_ppm") >= minQualityPpm &&
              col("alpha_ppm") >= minAlphaPpm)
    val deduped = StreamingDedup.dedupByContent(gated, horizon = horizon)
    StreamingNearDedup.dropAgainstIndex(deduped, index)
  }
}
