package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev profiling probe (r6): noop-sink times the stage3/stage4 sub-plans at
  * bench scale over real checkpoints (guide §1.4) — NOT part of the driver
  * contract. Usage: runMain graft.kg.ScoringProbe [nFiles]. */
object ScoringProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 50000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                   math.max(cpus.toInt, math.min(2048, n / 4000)).toString)
    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      spark.sparkContext.setJobDescription(label)
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      spark.sparkContext.setJobDescription(null)
    }

    val dir = java.nio.file.Files.createTempDirectory("probe_r06").toString
    val io = new graft.io.ParquetTableIO(dir)
    println(s"[probe] checkpoints in $dir, n=$n")
    val t0 = System.nanoTime()
    io.write(CorpusGen.srcFiles(spark, n).toDF()
      .withColumn("sha256", sha2(col("content"), 256)), "stage0_files", Seq("lang"))
    val files = io.read(spark, "stage0_files")
    io.write(Extract.perLine(files, 2), "stage1_lines")
    val perLine = io.read(spark, "stage1_lines")
    io.write(Extract.mentionsFromLines(perLine), "stage1_mentions")
    val mentions = io.read(spark, "stage1_mentions")
    val dict = Candidates.dictionary(CorpusGen.kbEntries(spark).toDF())
    io.write(Candidates.candidates(mentions, dict, broadcastDict = true), "stage2_candidates")
    val cands = io.read(spark, "stage2_candidates")
    val kbCtx = CorpusGen.kbContexts(spark).toDF()
    println(f"[probe] setup ${(System.nanoTime() - t0) / 1e9}%.2fs")

    val contexts = Extract.contexts(perLine)
    // mirror Scoring.score internals piecewise
    val ctxs = contexts.repartition(col("ctx_id"))
    time("ctxs(repartition)")(ctxs)
    val tf = ctxs.select(col("ctx_id"),
        explode(graft.functions.TermCounter.termCounts(col("ctx_terms"))).as("e"))
      .select(col("ctx_id"), col("e.term").as("term"), col("e.tf").as("tf"))
    time("tf")(tf)
    val nCtx = ctxs.agg(count(lit(1)).as("n"))
    val idf = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nCtx))
      .select(col("term"), (log((col("n") + 1).cast("double") / (col("df") + 1)) + 1.0).as("idf"))
    time("idf")(idf)
    val wM = tf.join(idf, "term")
      .select(col("ctx_id"), col("term"), (col("tf") * col("idf")).as("wm"))
    time("wM")(wM)
    val kbTerms = kbCtx.select(col("term")).distinct()
    val wMKb = wM.join(broadcast(kbTerms), Seq("term"), "left_semi")
    time("wMKb")(wMKb)
    val mNorm = wM.groupBy(col("ctx_id")).agg(sqrt(sum(col("wm") * col("wm"))).as("m_norm"))
    time("mNorm")(mNorm)
    val pairs = cands.select(col("mention_id"), col("ctx_id"), col("entity_id"), col("prior"))
    val ctxEntity = pairs.select(col("ctx_id"), col("entity_id"))
      .repartition(col("ctx_id")).dropDuplicates("ctx_id", "entity_id")
    time("ctxEntity")(ctxEntity)
    val dots = ctxEntity.join(wMKb, "ctx_id")
      .join(broadcast(kbCtx), Seq("entity_id", "term"), "inner")
      .groupBy(col("ctx_id"), col("entity_id"))
      .agg(sum(col("wm") * col("weight")).as("dot"))
    time("dots")(dots)
    val eNorm = kbCtx.groupBy(col("entity_id")).agg(sqrt(sum(col("weight") * col("weight"))).as("e_norm"))
    val cosine = dots.filter(col("dot") > 0)
      .join(mNorm, "ctx_id")
      .join(broadcast(eNorm), "entity_id")
      .select(col("ctx_id"), col("entity_id"),
              (col("dot") / (col("m_norm") * col("e_norm"))).as("cos"))
    time("cosine")(cosine)
    val scored = pairs.join(cosine, Seq("ctx_id", "entity_id"), "left_outer")
      .select(col("mention_id"), col("entity_id"),
              coalesce(col("cos"), col("prior") * 1e-9).as("score"))
    time("scored(full)")(scored)
    time("top1(full)")(Scoring.top1(
      Scoring.score(mentions, cands, kbCtx, Some(contexts))))
    // stage4 pieces
    io.write(Scoring.top1(Scoring.score(mentions, cands, kbCtx, Some(contexts))), "stage3_top1")
    val top1 = io.read(spark, "stage3_top1")
    val linked = mentions.join(top1.select(col("mention_id"), col("entity_id")), Seq("mention_id"))
    time("linked")(linked)
    time("vote")(Canonicalize.vote(linked))
    time("canonicalMentions")(Canonicalize.canonicalMentions(mentions, top1))
    time("triples(full)")(Canonicalize.triples(Canonicalize.canonicalMentions(mentions, top1)))
    spark.stop()
  }
}
