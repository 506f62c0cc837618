package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Sequence packing for pretraining: documents are concatenated in a
  * deterministic shuffled order and chunked into fixed token budgets; each
  * document is assigned the pack (bin) its start offset falls into — the
  * concat-and-chunk scheme pretraining tokenizers use, not optimal bin
  * packing (which is NP-hard and needless here).
  *
  * Scale shape: a GLOBAL running sum would be a no-partition window (single
  * task — this repo's plan lint rejects it). Instead rows are sharded by a
  * deterministic key hash and packed WITHIN shards — exactly how distributed
  * packers behave (each worker packs its slice), with pack ids globally
  * unique via the shard prefix. The window partitions by shard, so Spark
  * runs one sort per shard partition, all shards in parallel.
  *
  * Epoch ordering is the same trick as [[Sampling]]: order by md5(seed, key)
  * — a new seed is a new deterministic shuffle of the same corpus (epoch 2
  * packs differently than epoch 1, reproducibly).
  */
object Packing {

  /** Deterministic shuffle order for an epoch: md5(seed, key), key tiebreak. */
  def epochOrder(key: Column, seed: String): Column =
    md5(concat(lit(seed + "_"), key.cast("string")))

  /** Assign each row a (shard, pack) for a token `budget` per pack. `tokens`
    * must be a non-negative count column; `shards` bounds per-task state.
    * Output adds: shard, pos (running token offset of the row's start within
    * its shard's concat stream), pack_id (globally unique). */
  def pack(df: DataFrame, key: Column, tokens: Column, budget: Int,
           shards: Int, seed: String): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val shard = pmod(key, lit(shards.toLong)).cast("long")
    val w = Window.partitionBy(col("shard"))
      .orderBy(epochOrder(key, seed), key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shard)
      .withColumn("pos", sum(tokens).over(w) - tokens)
      .withColumn("pack_id",
        col("shard") * lit(1000000L) + floor(col("pos") / budget))
  }

  // --- operator query (driver contract): pack `documents` by whitespace
  // token count into 1024-token bins across 8 shards.

  def packDocuments(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long").as("toks"))
    pack(docs, col("doc_id"), col("toks"), budget = 1024, shards = 8, seed = "e1")
      .select(col("doc_id"), col("shard"), col("pos"), col("pack_id"))
  }
}
