package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for a training-data pipeline over `documents`:
  * language ID (marker-token heuristic), quality scoring, token counting
  * (whitespace + BPE-ish regex) and document fingerprinting. Pure column
  * expressions; exact DuckDB oracles.
  */
object TextAnalysis {

  private val L1 = Seq("spark", "data", "query")
  private val L2 = Seq("join", "merge", "sort")
  private val L3 = Seq("window", "stream", "batch")
  private val Stop = Seq("the", "a", "and", "of", "to")

  /** Language ID: argmax of per-language marker hits, deterministic ties.
    * Marker counting happens INSIDE the row (`size(filter(tokens, isin))`
    * per language) — the same move that made [[qualityFor]] shuffle-free:
    * the previous form exploded every token corpus-wide and aggregated back
    * per doc_id, a corpus-sized exchange for a per-row classification that
    * sits at the funnel's c1 gate position. Zero exchanges, plan-asserted;
    * identical DuckDB oracle (same counts, same integer arithmetic). */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val toks = DocOps.tokens(col("text"))
    def hits(markers: Seq[String]): Column =
      size(filter(toks, t => t.isin(markers: _*))).cast("long")
    Tables.documents(spark, dir)
      .select(col("doc_id"), hits(L1).as("s1"), hits(L2).as("s2"), hits(L3).as("s3"))
      .withColumn("langid",
        when(col("s1") === 0 && col("s2") === 0 && col("s3") === 0, "und")
          .when(col("s1") >= col("s2") && col("s1") >= col("s3"), "l1")
          .when(col("s2") >= col("s3"), "l2")
          .otherwise("l3"))
  }

  /** Quality scoring: token stats, stopword ratio, alpha ratio, composite.
    * Ratios are emitted as exact integer parts-per-million (truncated integer
    * division) — a float ratio rounded to N decimals can land on a rounding
    * boundary and differ between engines; integer arithmetic cannot. */
  def quality(spark: SparkSession, dir: String): DataFrame =
    qualityFor(Tables.documents(spark, dir))

  def qualityFor(docs: DataFrame): DataFrame =
    withQualityStats(docs)
      .select(col("doc_id"), col("n_chars"), col("n_tokens"),
        col("avg_token_len_e4"), col("stopword_ppm"), col("alpha_ppm"),
        col("quality_ppm"))

  /** [[qualityFor]]'s statistics APPENDED to the input columns (payload
    * preserved) — the form a streaming gate needs: filter on the stats
    * while `text` rides through to the next stage, no self-join to
    * re-attach the payload. All per-token statistics computed INSIDE the
    * row with array higher-order functions — the historical explode +
    * corpus-wide groupBy shuffled every token of every document (the
    * funnel's c1 gate would have made that a 100 TB-scale exchange); values
    * are identical (same integer arithmetic), asserted by the unchanged
    * DuckDB oracle. */
  def withQualityStats(docs: DataFrame): DataFrame = {
    val toks = regexp_extract_all(col("text"), lit("\\S+"), lit(0))
    docs
      .withColumn("n_chars", length(col("text")))
      .withColumn("alpha_chars",
        length(regexp_replace(lower(col("text")), "[^a-z]", "")))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("sum_len",
        aggregate(transform(toks, t => length(t).cast("long")),
                  lit(0L), (a, x) => a + x))
      .withColumn("stop_hits",
        size(filter(toks, t => lower(t).isin(Stop: _*))).cast("long"))
      .withColumn("avg_token_len_e4", expr("(sum_len * 10000) div n_tokens"))
      .withColumn("stopword_ppm", expr("(stop_hits * 1000000) div n_tokens"))
      .withColumn("alpha_ppm",
        expr("(CAST(alpha_chars AS BIGINT) * 1000000) div n_chars"))
      .withColumn("quality_ppm",
        expr("(alpha_ppm + (1000000 - stopword_ppm)) div 2"))
      .drop("alpha_chars", "sum_len", "stop_hits")
  }

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).as("ws_tokens"),
      size(regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("bpe_ish_tokens"))

  /** Repetition signals (the Gopher-rules complement to [[quality]]):
    * boilerplate and templated spam repeat themselves — duplicate-line
    * fraction and duplicate-3-gram fraction in integer ppm (exact
    * cross-engine arithmetic, like quality's). Narrow per-row array
    * expressions, zero shuffle. */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val lines = filter(split(col("text"), "\n"), l => length(l) > 0)
    val grams = regexp_extract_all(col("text"), lit("\\S+"), lit(0))
    def threeGrams(ws: Column): Column = transform(
      slice(ws, lit(1), greatest(size(ws) - 2, lit(0))),
      (w, i) => concat_ws(" ", w, element_at(ws, i + 2), element_at(ws, i + 3)))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(lines).as("n_lines"),
      size(array_distinct(lines)).as("n_distinct_lines"),
      size(threeGrams(grams)).as("n_3grams"),
      size(array_distinct(threeGrams(grams))).as("n_distinct_3grams"))
    .withColumn("dup_line_ppm", expr(
      "CASE WHEN n_lines > 0 THEN (CAST(n_lines - n_distinct_lines AS BIGINT) * 1000000) div n_lines ELSE CAST(0 AS BIGINT) END"))
    .withColumn("dup_3gram_ppm", expr(
      "CASE WHEN n_3grams > 0 THEN (CAST(n_3grams - n_distinct_3grams AS BIGINT) * 1000000) div n_3grams ELSE CAST(0 AS BIGINT) END"))
  }

  /** Corpus-shape report: per-language histogram of document token counts
    * in log2 buckets — the length distribution every corpus card publishes
    * and every packing/bucketing decision reads. One narrow scan + a
    * vocabulary-bounded aggregation (floor(log2) is exact at bucket
    * boundaries — powers of two — in any IEEE engine, so the bucketing is
    * cross-engine deterministic). */
  def tokenHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"),
        floor(log2(size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))) + 1))
          .as("bucket"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"))

  /** Fingerprint: winnowing-style min-hash over 3-word shingles. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Dedup.shingles(spark, dir)
      .groupBy(col("doc_id"))
      .agg(min(md5(col("shingle"))).as("fingerprint"),
           countDistinct(col("shingle")).as("n_shingles"))

  /** Per-language token-count quantiles — the length distribution summary
    * every corpus card publishes next to [[tokenHistogram]]'s buckets.
    * Exact `percentile` (SQL-standard percentile_cont interpolation, same
    * formula in DuckDB's quantile_cont, so the oracle matches to the
    * rounding digit). Exact percentile materializes each group's values —
    * fine for a per-language rollup at any corpus size ONLY because the
    * group count is tiny and Spark's implementation aggregates counts; at
    * 10^12 rows the drop-in scale path is `percentile_approx` (mergeable
    * KLL-style sketch, same query shape, two-phase aggregation). */
  def lengthQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
          .cast("long").as("toks"))
      .groupBy(col("lang"))
      .agg(round(percentile(col("toks"), lit(0.25)), 4).as("p25"),
           round(percentile(col("toks"), lit(0.5)), 4).as("p50"),
           round(percentile(col("toks"), lit(0.75)), 4).as("p75"),
           round(percentile(col("toks"), lit(0.95)), 4).as("p95"),
           count(lit(1)).as("n_docs"))

  /** The 10^12-row scale path for [[lengthQuantiles]]: `percentile_approx`
    * (Greenwald-Khanna-style mergeable sketch — bounded memory per group,
    * two-phase aggregation, no per-group value materialization) at rank
    * accuracy 1/10000. Same query shape and columns as the exact operator.
    * No DuckDB oracle by contract: sketch internals differ across engines,
    * so exact cross-engine hashing is impossible — instead a property test
    * (GraphLmSpec) bounds each approx quantile by the exact operator's
    * neighboring quantiles, which is the guarantee the sketch actually
    * makes. The driver records the weaker rows-only check. */
  def lengthQuantilesApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
          .cast("long").as("toks"))
      .groupBy(col("lang"))
      .agg(percentile_approx(col("toks"), lit(0.25), lit(10000)).as("p25"),
           percentile_approx(col("toks"), lit(0.5), lit(10000)).as("p50"),
           percentile_approx(col("toks"), lit(0.75), lit(10000)).as("p75"),
           percentile_approx(col("toks"), lit(0.95), lit(10000)).as("p95"),
           count(lit(1)).as("n_docs"))

  /** N-gram language-model quality score (the KenLM-style perplexity filter
    * every web-scale curation stack runs): train an add-one-smoothed bigram
    * model ON the corpus itself, then score each document by its mean
    * negative log2 bigram probability — templated/predictable text scores
    * low, lexically incoherent text scores high.
    *
    * Shape, and why it holds at 100 TB:
    *  - bigrams are assembled IN-ROW (zip each token array with its own
    *    tail — no window, no per-token exchange), then exploded once;
    *  - the model is two aggregations over that stream: bigram counts and
    *    (derived from them, one more partial agg) history counts — both
    *    Zipf-bounded vocabulary tables, orders of magnitude smaller than
    *    the corpus;
    *  - scoring joins the per-doc bigram stream to the model on the bigram
    *    key — a shuffle hash join whose build side is the model table; the
    *    stopword-bigram skew on the probe side is exactly what AQE's
    *    skew-join handles (and the key could be salted like J2 if measured
    *    hot). History counts ride along via one more vocabulary-sized join;
    *  - per-doc reduction is a partial-agg sum/count.
    * The only floats are the final log2s: each engine computes the same
    * (c+1)/(cw+V) rationals from exact BIGINT counts, and the per-doc mean
    * is rounded to 6 dp (sum-order error ~1e-13 — far below the boundary). */
  def lmScore(spark: SparkSession, dir: String): DataFrame =
    lmScoreFor(Tables.documents(spark, dir))

  def lmScoreFor(docs: DataFrame): DataFrame = {
    val toks = DocOps.tokens(col("text"))
    // zip_with pads the shorter side with null and concat propagates null,
    // so the trailing (last-token, null) pair drops out in the filter.
    val bigrams = filter(
      zip_with(toks, slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
               (a, b) => concat(a, lit(" "), b)),
      g => g.isNotNull)
    val docBi = docs.select(col("doc_id"), explode(bigrams).as("bg"))
    val cb = docBi.groupBy(col("bg")).agg(count(lit(1)).as("c"))
    val cu = cb.groupBy(split(col("bg"), " ").getItem(0).as("w1"))
      .agg(sum(col("c")).as("cw"))
    val v = docs.select(explode(DocOps.tokens(col("text"))).as("term"))
      .agg(countDistinct(col("term")).as("v"))
    docBi
      .join(cb, "bg")
      .join(cu, split(col("bg"), " ").getItem(0) === col("w1"))
      .crossJoin(broadcast(v))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
           round(avg(-log2((col("c") + lit(1)).cast("double") /
                           (col("cw") + col("v")))), 6).as("avg_nll"))
  }
}
