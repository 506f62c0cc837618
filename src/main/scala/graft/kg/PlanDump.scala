package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** Dev tool: dumps the formatted physical plans of the flagship stages and
  * the plan-shape-critical operator queries to PLANS.md — the "is this the
  * plan you'd want at 100 TB" evidence, regenerated per round.
  * Usage: runMain graft.kg.PlanDump */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sf = "/root/testdata/sf0.001"
    val src = CorpusGen.srcFiles(spark, 100).toDF()
    val pl = Extract.perLine(src)
    val mentions = Extract.mentionsFromLines(pl)
    val dict = Candidates.dictionary(CorpusGen.kbEntries(spark).toDF())
    val kbCtx = CorpusGen.kbContexts(spark).toDF()
    val candsB = Candidates.candidates(mentions, dict, broadcastDict = true)
    val candsS = Candidates.candidates(mentions, dict, broadcastDict = false, hotThreshold = 3L)
    val scored = Scoring.top1(Scoring.score(mentions, candsB, kbCtx, Some(Extract.contexts(pl))))

    def fmt(df: DataFrame): String =
      df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

    val sections: Seq[(String, String, String)] = Seq(
      ("Stage 1 — extraction (per-line mentions + in-row ±k contexts)",
       "Design point: ZERO exchanges — a file's lines never leave their row; " +
       "one WholeStageCodegen span covers the whole per-line projection " +
       "including the native code_tokens scan.", fmt(mentions)),
      ("Stage 2 — candidate generation, broadcast path",
       "Design point: BroadcastHashJoin on the measured-small dictionary; " +
       "no shuffle of the mention stream.", fmt(candsB)),
      ("Stage 2 — candidate generation, salted path (hot/cold split)",
       "Design point: measured hot-key set; hot keys join salted (dict " +
       "replicated R ways), cold keys plain; union of the two — no mega-key " +
       "ever meets a single task.", fmt(candsS)),
      ("Stage 3 — context scoring + top-1",
       "Design points: one explicit ctx_id repartition of compact rows reused " +
       "by TF/norm/scoring; in-row TF (no corpus-wide (ctx,term) shuffle); " +
       "KB-vocabulary semi-join prune of the dot fan-out; no SortMergeJoin, " +
       "no Window, no global sort; top-1 as max(struct) partial aggregation.",
       fmt(scored)),
      ("S2 — vocabulary top-k (embedded in 8 oracled plans)",
       "Design point: TakeOrderedAndProject (per-partition heaps + k-row " +
       "merge), never a no-partition Window.",
       fmt(graft.ops.RelOps.s2Kb(spark, sf))),
      ("Dedup — MinHash band candidate pairs",
       "Design point: shingles computed in-row (no pre-aggregation exchange); " +
       "md5 + partial min run inside whole-stage codegen and partial " +
       "aggregation collapses the signature stream to 8 rows/doc before its " +
       "exchange (an in-row HOF form was measured ~8× slower and buys no " +
       "scale win — kept for streaming only, see StreamingNearDedup); pair " +
       "join keyed on high-cardinality (band, sig).",
       fmt(graft.ops.Dedup.minhashPairs(spark, sf))),
      ("KG PageRank (r4, fixed-point integer, 3 rounds)",
       "Design point: the prepared edge table (edges ⋈ outdeg) appears once " +
       "per round in ONE composed plan, so its exchange is planned once and " +
       "reused (printed repetition here is the AQE artifact described at the " +
       "top; PlanSpec asserts ReusedExchange with AQE off); ranks are exact " +
       "BIGINT micro-units (no float sum-order nondeterminism); per round " +
       "one shuffle join + one partial-agg groupBy(dst).",
       fmt(graft.ops.GraphOps.pagerank(spark, sf))),
      ("Sequence packing (r3)",
       "Design point: the running-offset window partitions by shard (one " +
       "sort per shard partition, all shards parallel) — never a " +
       "no-partition global running sum.",
       fmt(graft.ops.Packing.packDocuments(spark, sf))),
      ("PQ ADC top-k (r3)",
       "Design point: codebooks and the per-query LUT broadcast; the scan " +
       "side touches only the 4-codes-per-vector table, never raw vectors; " +
       "top-k windows partition by q_id.",
       fmt(graft.ops.Similarity.pqTopK(spark, sf))),
      ("Decontamination (r3)",
       "Design point: the eval shingle set broadcasts (benchmark-sized); " +
       "the corpus side is a broadcast semi-join + partial-aggregated count " +
       "— the training corpus is never shuffled.",
       fmt(graft.ops.Curation.decontaminateDocs(spark, sf))))

    val body = sections.map { case (title, note, plan) =>
      s"## $title\n\n$note\n\n```\n${plan.trim}\n```\n"
    }.mkString("\n")
    Files.writeString(Paths.get("PLANS.md"),
      "# PLANS — formatted physical plans of the flagship paths\n\n" +
      "Generated by `sbt \"runMain graft.kg.PlanDump\"` (local[8], AQE on,\n" +
      "preferSortMergeJoin=false — the bench/verify configuration). These are\n" +
      "the plans the PlanSpec assertions pin.\n\n" +
      "Common-subtree note: the TF-IDF parity queries (a2/a3/a4/j5/w1/j6) are\n" +
      "rooted in one shared (doc_id, term) aggregation. A printed ADAPTIVE\n" +
      "plan shows the subtree repeated with no ReusedExchange node — that is\n" +
      "an artifact of AQE's printing: stage deduplication happens at runtime\n" +
      "through the canonicalized-stage cache. Verified with AQE off, where\n" +
      "the static rule is visible: every such query plans ≤2 FileScans of\n" +
      "`documents` with the duplicates as ReusedExchange (a4: 2 scans, 9\n" +
      "reused exchanges; j5: 2 and 4; a3: 2 and 1; w1/j6: 1 scan).\n\n" + body)
    println(s"wrote PLANS.md (${sections.size} plans)")
    spark.stop()
  }
}
