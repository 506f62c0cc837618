package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic sampling for training-data pipelines. Every sampler keys on
  * a hash of (seed, row key), never on `rand()`: the same corpus + seed
  * always selects the same rows, on any cluster size, any partitioning, and
  * any execution order — which is what makes training sets reproducible,
  * resumable mid-pipeline, and joinable against later runs. All samplers are
  * pure column expressions (narrow, codegen'd, zero shuffle) except
  * [[uniformK]], which is a global top-k (TakeOrderedAndProject — per-
  * partition heaps, never a full sort).
  *
  * The keep decision compares a 2-hex-digit prefix of md5(seed ++ "_" ++ key)
  * against a threshold: p = threshold/256. md5 of the decimal-string key is
  * bit-identical across engines (the DuckDB oracles run the same expression),
  * and the hex-string comparison is a plain byte compare.
  */
object Sampling {

  /** Uniform [0, 256) bucket from (seed, key) — the sampling coin. */
  def hashBucket(key: Column, seed: String): Column =
    substring(md5(concat(lit(seed + "_"), key.cast("string"))), 1, 2)

  private def hex2(p256: Int): String = {
    require(p256 >= 0 && p256 <= 256, s"p256 out of range: $p256")
    // 256 = keep-all: the threshold must sort ABOVE every 2-hex-digit bucket,
    // and "100" does not ("ff" > "100" lexicographically) — use a sentinel.
    if (p256 == 256) "g" else f"$p256%02x"
  }

  /** Deterministic Bernoulli(p256/256) sample: keep a row iff its bucket
    * falls below the threshold. */
  def bernoulli(df: DataFrame, key: Column, p256: Int, seed: String): DataFrame =
    df.filter(hashBucket(key, seed) < lit(hex2(p256)))

  /** Per-stratum rates (e.g. downsample the dominant language, keep the
    * tail): `rates` maps stratum value → p256, `default256` covers the rest.
    * Chained `when`s — a broadcast-join rates table works identically when
    * the strata set is too large to inline. */
  def stratified(df: DataFrame, key: Column, stratum: Column,
                 rates: Seq[(String, Int)], default256: Int, seed: String): DataFrame = {
    val threshold = rates.foldLeft(lit(hex2(default256))) { case (acc, (v, p)) =>
      when(stratum === v, lit(hex2(p))).otherwise(acc)
    }
    df.filter(hashBucket(key, seed) < threshold)
  }

  /** Deterministic uniform k-subset without replacement: order by the hash
    * (key as tiebreak) and take k — the scale-safe equivalent of reservoir
    * sampling (global top-k, no global sort, no driver state). */
  def uniformK(df: DataFrame, key: Column, k: Int, seed: String): DataFrame =
    df.orderBy(md5(concat(lit(seed + "_"), key.cast("string"))), key).limit(k)

  /** Disjoint train/val/test split by hash range: [0, trainUpper) → train,
    * [trainUpper, valUpper) → val, rest → test. Deterministic, stable under
    * corpus growth (a row's split never changes when other rows arrive). */
  def split(df: DataFrame, key: Column, trainUpper256: Int, valUpper256: Int,
            seed: String): DataFrame = {
    require(trainUpper256 <= valUpper256 && valUpper256 <= 256, "bad split bounds")
    val b = hashBucket(key, seed)
    df.withColumn("split",
      when(b < lit(hex2(trainUpper256)), "train")
        .when(b < lit(hex2(valUpper256)), "val")
        .otherwise(lit("test")))
  }

  // --- operator queries (driver contract) over `documents` ---

  /** 25% deterministic Bernoulli sample. */
  def hashSample(spark: SparkSession, dir: String): DataFrame =
    bernoulli(Tables.documents(spark, dir), col("doc_id"), 64, "s1")
      .select(col("doc_id"), col("lang"))

  /** Language-stratified: downsample dominant `en` to 12.5%, keep the tail
    * languages at 50% — the class-rebalancing move a multilingual training
    * mix actually makes. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    stratified(Tables.documents(spark, dir), col("doc_id"), col("lang"),
      Seq("en" -> 32), default256 = 128, seed = "s1")
      .select(col("doc_id"), col("lang"))

  /** Deterministic uniform 50-subset. */
  def uniformKSample(spark: SparkSession, dir: String): DataFrame =
    uniformK(Tables.documents(spark, dir), col("doc_id"), 50, "s2")
      .select(col("doc_id"))

  /** Source-weighted mixture: src0 kept whole, src1 at 50%, every other
    * source at 12.5% — dataset mixing by target weights. */
  def weightedMix(spark: SparkSession, dir: String): DataFrame =
    stratified(Tables.documents(spark, dir), col("doc_id"), col("source"),
      Seq("src0" -> 256, "src1" -> 128), default256 = 32, seed = "s3")
      .select(col("doc_id"), col("source"))

  /** ~92/4/4 train/val/test assignment for every document. */
  def trainValTestSplit(spark: SparkSession, dir: String): DataFrame =
    split(Tables.documents(spark, dir), col("doc_id"), 236, 246, "s4")
      .select(col("doc_id"), col("split"))
}
