package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) joins — the storage-level answer to a join that
  * would otherwise shuffle BOTH sides every run.
  *
  * A table written with `bucketBy(n, key)` is physically pre-partitioned by
  * `hash(key) % n` and records that layout in the catalog; a join of two
  * tables bucketed by the same key into the same bucket count satisfies the
  * join's distribution requirement FROM STORAGE — Catalyst plans it with no
  * Exchange on either side (plan-asserted in BucketingSpec), and with
  * `sortBy` the sort-merge join's sorts disappear too.
  *
  * Where this matters in the engine: tables that are joined on the same key
  * by EVERY downstream consumer — the KB dictionary and candidate tables
  * (joined on entity/label), published band-signature tables (joined on
  * (band, sig) by each day's delta run), per-doc decision tables (joined on
  * doc_id by every funnel stage). A daily pipeline re-reading yesterday's
  * checkpoints pays the shuffle once at WRITE time and never again at read.
  *
  * At cluster scale the same declaration is Iceberg's `bucket(n, key)`
  * partition transform (plus storage-partitioned joins) — this class is the
  * Spark-catalog form of the one-file TableIO swap documented in
  * SURVEY.md §7.3. Bucket-count discipline: both sides must agree on `n`
  * (or one side a divisor of the other with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`), and `n` should be
  * sized so one bucket of the BIG table fits an executor core's working
  * memory at design scale.
  */
object Bucketing {

  /** Catalog name for `base` under `runId`. Bucketed tables are managed
    * catalog tables, so two concurrent runs (or a bench and a test) sharing
    * a metastore would collide on a fixed name — every writer namespaces by
    * its run id instead, and retires superseded runs via [[dropStale]].
    * Lowercased up front: the catalog is case-insensitive and stores names
    * folded, so normalizing here keeps names round-trippable. */
  def runTable(base: String, runId: String): String =
    s"${base}__$runId".toLowerCase

  /** Write `df` as a managed parquet table bucketed (and sorted) by `key`
    * into `nBuckets`. Overwrites any existing table of that name. */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write.format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Write `df` bucketed under the per-run name; returns that name. Does NOT
    * drop other runs' tables (concurrent runs must not kill each other) —
    * retire them explicitly with [[dropStale]] once a run is superseded. */
  def writeBucketedRun(df: DataFrame, base: String, runId: String,
                       key: String, nBuckets: Int): String = {
    val t = runTable(base, runId)
    writeBucketed(df, t, key, nBuckets)
    t
  }

  /** Drop every `base__*` table whose run id is not in `keep` (the publish-
    * then-retire half of the per-run namespacing). */
  def dropStale(spark: SparkSession, base: String, keep: Set[String]): Seq[String] = {
    val prefix = s"${base.toLowerCase}__"
    val keepNorm = keep.map(_.toLowerCase)
    val stale = spark.catalog.listTables().collect().toSeq
      .map(_.name)
      .filter(n => n.startsWith(prefix) && !keepNorm.contains(n.stripPrefix(prefix)))
    stale.foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    stale.sorted
  }

  /** Join two same-key same-count bucketed tables: distribution comes from
    * storage, so the plan contains no shuffle on either side. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
