package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.{ParquetTableIO, TableIO}

/** The end-to-end training-data pipeline: the composition a user actually
  * runs over a raw document corpus before tokenization —
  *
  *   ingest → language/quality filter → exact dedup → [substring/span
  *   strip] → near-dup cluster collapse → benchmark decontamination →
  *   PII/secret redaction → train/val/test split → sequence packing
  *
  * Each stage is one of this library's tested operators; the pipeline only
  * composes them, checkpointing every stage through the same atomic
  * [[TableIO]] + per-partition-lineage machinery as the KG pipeline
  * ([[graft.io.StagedRun]]), so a killed curation run resumes from its last
  * committed stage and the lineage table doubles as the per-stage
  * row-count funnel report (how many documents each filter removed —
  * the number every data-curation run gets asked for).
  *
  * Scale shape: every stage is a tested-scale-safe operator — filters are
  * narrow column expressions; exact dedup is a (sha, min-id) semi-join;
  * near-dup collapse is guarded banded LSH + O(log diameter) connected
  * components; decontamination broadcasts the benchmark-sized eval shingle
  * set (the corpus never shuffles for it); packing windows within hash
  * shards. The corpus-sized tables move only through hash-partitioned
  * exchanges with AQE sizing, exactly like the KG pipeline's.
  */
final class CurationPipeline(val io: TableIO, val runId: String,
                             val resume: Boolean = false, seed: String = "cp")
    extends graft.io.StagedRun {

  /** `docs`: (doc_id, text, lang, source). Returns the packed keep set
    * (read back from the sink), one row per surviving document with its
    * split and pack assignment. */
  def run(spark: SparkSession, docs: DataFrame,
          langs: Seq[String] = Seq("en", "de", "es", "fr", "zh"),
          minQualityPpm: Long = 400000L, minAlphaPpm: Long = 500000L,
          minTokens: Long = 5L,
          evalDocs: Option[DataFrame] = None, decontamMinHits: Long = 1L,
          trainUpper256: Int = 236, valUpper256: Int = 246,
          packBudget: Int = 1024, packShards: Int = 32,
          durableSignatures: Boolean = false,
          stripSpanTokens: Int = 0, stripSpanStride: Int = 0): DataFrame = {
    // Folded into every lineage row: resume refuses (loudly) to reuse a
    // checkpoint computed under different thresholds/langs/budgets.
    stageParams = paramsHash(langs.mkString(","), minQualityPpm, minAlphaPpm,
      minTokens, evalDocs.isDefined, decontamMinHits, trainUpper256,
      valUpper256, packBudget, packShards, seed, stripSpanTokens, stripSpanStride)

    // Write amplification is the 100 TB design constraint here: the corpus
    // TEXT is checkpointed exactly TWICE (c0 ingest-normalized, c5 redacted
    // — the product). Every stage between is a DECISION: a compact doc_id
    // keep-set, checkpointed with lineage like any stage (the funnel), and
    // applied to the c0 text by semi-join. The keep-sets are id columns —
    // they broadcast at sandbox scale and co-partition cheaply on a cluster
    // (ids move, text never does).

    // c0: ingest + content hash (the identity every later stage keys on)
    val s0 = stage(spark, "c0_ingest",
      docs.select(col("doc_id"), col("text"), col("lang"), col("source"))
        .withColumn("sha256", sha2(col("text"), 256)))

    // c1: language allowlist + heuristic quality gate (integer-ppm metrics;
    // alpha_ppm is the symbol-soup catch — quality_ppm alone scores
    // stopword-free garbage at 500k). Decision carries the compact meta
    // later stages key on (sha for dedup) — never the text.
    val q = TextAnalysis.qualityFor(s0)
      .select(col("doc_id"), col("n_tokens"), col("quality_ppm"), col("alpha_ppm"))
    val s1 = stage(spark, "c1_quality",
      s0.select(col("doc_id"), col("lang"), col("sha256")).join(q, Seq("doc_id"))
        .filter(col("lang").isin(langs: _*) &&
                col("quality_ppm") >= minQualityPpm &&
                col("alpha_ppm") >= minAlphaPpm && col("n_tokens") >= minTokens)
        .select(col("doc_id"), col("sha256")))

    // c2: exact dedup — deterministic min-id representative per content hash
    val reps = s1.groupBy(col("sha256")).agg(min(col("doc_id")).as("doc_id"))
    val s2 = stage(spark, "c2_exact_dedup",
      s1.join(reps, Seq("sha256", "doc_id"), "left_semi").select(col("doc_id")))

    // c2s (optional): substring-level dedup — recurring long token spans
    // (boilerplate paragraphs, license blobs, quoted passages) across
    // otherwise-distinct documents keep only their FIRST occurrence. The
    // stage checkpoints a compact STRIP table (doc_id, span_start, span_len);
    // the text is never rewritten to storage here — every downstream text
    // consumer applies the strips in-row, so write amplification stays at
    // exactly two text copies (c0 + c5).
    val spanStrips: Option[DataFrame] =
      if (stripSpanTokens <= 0) None
      else {
        val stride = if (stripSpanStride > 0) stripSpanStride else stripSpanTokens
        Some(stage(spark, "c2s_span_strips",
          Dedup.dupSpans(
              s0.select(col("doc_id"), col("text")).join(s2, Seq("doc_id"), "left_semi"),
              stripSpanTokens, stride)
            .filter(col("keep") === 0)
            .select(col("doc_id"), col("span_start"), col("span_len"))))
      }

    // the surviving text stream for the content-based stages below: c0 text
    // filtered by the current keep-set (text stays on the scan side), with
    // the span strips (if any) applied in-row
    def surviving(keep: DataFrame): DataFrame = {
      val base = s0.select(col("doc_id"), col("text")).join(keep, Seq("doc_id"), "left_semi")
      spanStrips.map(Dedup.stripSpans(base, _)).getOrElse(base)
    }

    // c3: near-dup cluster collapse — guarded banded MinHash-LSH pairs →
    // connected components → keep only each cluster's representative
    // (pairwise dropping cannot dedup an N-way duplicate group)
    // `durableSignatures` picks how the shared minhash-signature table
    // materializes: localCheckpoint (default — executor memory+disk, fastest;
    // 90 vs 115 s at 2M docs/32 cores) or a real TableIO stage (survives
    // executor loss and resumes — the right setting on a 1000-executor
    // cluster, where losing one machine must not restart the signature scan)
    val s2text = surviving(s2)
    val sigMaterialize: DataFrame => DataFrame =
      if (durableSignatures) df => stage(spark, "c3_minhash_sigs", df)
      else _.localCheckpoint()
    // under durableSignatures every CC round ALSO checkpoints through
    // TableIO (deterministic round names) — a run killed mid-iteration
    // resumes from its last committed round instead of re-deriving the
    // pair graph (the right setting on a 1000-executor cluster, where
    // localCheckpoint blocks die with their executor)
    val ccMaterialize: (DataFrame, String) => DataFrame =
      if (durableSignatures) (df, name) => stage(spark, s"c3_$name", df)
      else (df, _) => df.localCheckpoint()
    val s3 = stage(spark, "c3_neardup_collapse",
      Dedup.clustersFor(s2text,
          Dedup.minhashPairsGuarded(s2text, materialize = sigMaterialize),
          ccMaterialize = ccMaterialize)
        .filter(col("keep") === 1).select(col("doc_id")))

    // c4: benchmark decontamination (skipped when no eval set is supplied)
    val s4 = evalDocs match {
      case Some(ev) => stage(spark, "c4_decontaminated",
        s3.join(Curation.decontaminate(surviving(s3), ev)
                  .filter(col("n_hits") >= decontamMinHits).select(col("doc_id")),
                Seq("doc_id"), "left_anti"))
      case None => s3
    }

    // c5: PII/secret redaction applied to the final keep-set — the SECOND
    // and last full-text write (the product); sha256 restated post-redaction;
    // span strips (if any) applied in-row before redaction so the product
    // text is the deduplicated text
    val s5input0 = s0.join(s4, Seq("doc_id"), "left_semi")
    val s5input = spanStrips.map(Dedup.stripSpans(s5input0, _)).getOrElse(s5input0)
    val s5 = stage(spark, "c5_redacted",
      Curation.redact(s5input, col("text"))
        .select(col("doc_id"), col("redacted").as("text"), col("lang"),
                col("source"),
                (col("n_emails") + col("n_ips") + col("n_secrets")).as("n_redactions"))
        .withColumn("sha256", sha2(col("text"), 256)))

    // c6: deterministic split + sequence packing, partitioned by split (the
    // layout a tokenizer consumes: read one split, stream packs in order).
    // Packing groups by split so a pack never straddles a split boundary —
    // a val doc must not occupy token offsets inside a train pack.
    val withSplit = Sampling.split(s5, col("doc_id"), trainUpper256, valUpper256, seed)
    val toks = size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).cast("long")
    stage(spark, "c6_packed",
      Packing.pack(withSplit.withColumn("toks", toks), col("doc_id"), col("toks"),
                   packBudget, packShards, seed, groupCols = Seq(col("split")))
        .select(col("doc_id"), col("lang"), col("source"), col("split"),
                col("toks"), col("shard"), col("pos"), col("pack_id")),
      partitionBy = Seq("split"))
  }
}

/** spark-submit entry point:
  * `graft.ops.CurationPipeline <sfDir> <ckptDir> [--resume]` — runs the full
  * curation funnel over the `documents` table, printing the per-stage funnel
  * from the lineage table. */
object CurationPipeline {
  def main(args: Array[String]): Unit = {
    val pos = args.filterNot(_.startsWith("--"))
    val sfDir = if (pos.length > 0) pos(0) else "/root/testdata/sf0.01"
    val ckpt = if (pos.length > 1) pos(1) else "target/curation_ckpt"
    val resume = args.contains("--resume")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val docs = graft.Tables.documents(spark, sfDir)
      val pipe = new CurationPipeline(new ParquetTableIO(ckpt), s"cur-$sfDir", resume)
      // a fresh (non-resume) run into an existing ckpt dir must not APPEND a
      // second set of lineage rows under the same run_id — the funnel report
      // below would double-count every stage
      if (!resume) pipe.io.drop(spark, pipe.LineageTable)
      val t0 = System.nanoTime()
      // eval set: every 97th doc stands in for a benchmark
      val out = pipe.run(spark, docs,
        evalDocs = Some(docs.filter(col("doc_id") % 97 === 0)))
      val n = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val funnel = pipe.io.read(spark, pipe.LineageTable)
        .filter(col("run_id") === pipe.runId)
        .groupBy(col("stage")).agg(sum(col("rows_out")).as("rows"))
        .orderBy(col("stage")).collect()
        .map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" ")
      println(f"[curation] docs_out=$n wall=$sec%.2fs funnel: $funnel")
    } finally spark.stop()
  }
}
