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

  /** Pack indices a shard can address before its ids would collide with the
    * next shard's: 10^12 packs ≈ 10^15 tokens per shard at budget 1024 —
    * beyond any corpus, and shard ids up to ~9·10^6 still fit in a long. */
  val PacksPerShard = 1000000000000L

  /** Assign each row a (shard, pack) for a token `budget` per pack. `tokens`
    * must be a non-negative count column; `shards` bounds per-task state.
    * Output adds: shard, pos (running token offset of the row's start within
    * its shard's concat stream), pack_id.
    *
    * `groupCols`: extra window-partition columns (e.g. the train/val/test
    * split) — each group packs its own independent concat stream, so a pack
    * never straddles a group boundary. pack_id is then unique WITHIN a group
    * (the consumption unit — a tokenizer reads one group's directory); make
    * it globally unique by folding the group into `shards` if needed. */
  def pack(df: DataFrame, key: Column, tokens: Column, budget: Int,
           shards: Int, seed: String, groupCols: Seq[Column] = Nil): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    // overflow-safe form: a sign check on the product misses wrapped-POSITIVE
    // overflow (e.g. ~2e7 shards wraps past Long.MaxValue yet stays positive)
    require(shards.toLong <= Long.MaxValue / PacksPerShard,
      s"too many shards for the id space: $shards (max ${Long.MaxValue / PacksPerShard})")
    val shard = pmod(key, lit(shards.toLong)).cast("long")
    val w = Window.partitionBy(groupCols :+ col("shard"): _*)
      .orderBy(epochOrder(key, seed), key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shard)
      .withColumn("pos", sum(tokens).over(w) - tokens)
      .withColumn("pack_id",
        col("shard") * lit(PacksPerShard) + floor(col("pos") / budget))
  }

  /** Explicit chunk rows for [[pack]] output: a document whose token run
    * [pos, pos+toks) crosses pack boundaries (multiples of `budget` in its
    * shard's concat stream) straddles several packs — this emits one row per
    * (document, pack) overlap with the document-relative offset and length,
    * so a tokenizer can split the document WITHOUT re-deriving offsets:
    * chunk j of a doc covers tokens [offset_in_doc, offset_in_doc+chunk_len).
    * Invariant (property-tested + oracled): per doc, chunks tile the
    * document — offsets contiguous from 0, lens sum to toks. Zero-token
    * docs emit one empty chunk so every packed doc appears. Pure in-row
    * arithmetic over the pack assignment (no extra shuffle). */
  def chunks(packed: DataFrame, tokens: Column, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val p0 = floor(col("pos") / budget)
    val pEnd = floor((col("pos") + tokens - 1) / budget)
    val nChunks = when(tokens > 0, pEnd - p0 + 1).otherwise(1L)
    val start = greatest(col("pos"), (p0 + col("ci")) * budget)
    val end = least(col("pos") + tokens, (p0 + col("ci") + 1) * budget)
    packed
      .withColumn("ci", explode(sequence(lit(0L), nChunks - 1)))
      .withColumn("pack_id", col("pack_id") + col("ci"))
      .withColumn("offset_in_doc", start - col("pos"))
      .withColumn("chunk_len", end - start)
      .drop("ci")
  }

  // --- operator queries (driver contract): pack `documents` by whitespace
  // token count into 1024-token bins across 8 shards; chunk rows for the
  // tokenizer-facing layout.

  private def packedDocuments(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long").as("toks"))
    pack(docs, col("doc_id"), col("toks"), budget = 1024, shards = 8, seed = "e1")
  }

  def packDocuments(spark: SparkSession, dir: String): DataFrame =
    packedDocuments(spark, dir)
      .select(col("doc_id"), col("shard"), col("pos"), col("pack_id"))

  def packChunks(spark: SparkSession, dir: String): DataFrame =
    chunks(packedDocuments(spark, dir), col("toks"), budget = 1024)
      .select(col("doc_id"), col("pack_id"), col("offset_in_doc"), col("chunk_len"))
}
