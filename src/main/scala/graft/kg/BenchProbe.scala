package graft.kg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling probe: times the scoring sub-plans at a given corpus size.
  * Not part of the driver contract. Usage: runMain graft.kg.BenchProbe [n]. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // local-mode only: checkpoint tables are byte-small but row-heavy, so
      // the 128m default would give heavy explode stages 1-2 input splits;
      // on a real cluster at design scale keep the default.
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.adaptive.enabled", "true")
      // hash joins over sort-merge: the scoring join's big side is a streamed
      // exploded term stream - sorting it (SMJ) spills; SHJ hashes the small
      // side per partition (SURVEY.md J1)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$c")
    }
    val dir = java.nio.file.Files.createTempDirectory("probe").toString
    val io = new graft.io.ParquetTableIO(dir)
    io.write(CorpusGen.srcFiles(spark, n).toDF(), "src")
    val src = io.read(spark, "src")
    time("extract.mentions")(Extract.mentions(src).count())
    io.write(Extract.mentions(src), "mentions")
    val mentions = io.read(spark, "mentions")
    val dict = Candidates.dictionary(CorpusGen.kbEntries(spark).toDF())
    time("candidates")(Candidates.candidates(mentions, dict, broadcastDict = true).count())
    io.write(Candidates.candidates(mentions, dict, broadcastDict = true), "cands")
    val cands = io.read(spark, "cands")
    val kbCtx = CorpusGen.kbContexts(spark).toDF()

    val m = mentions.select(col("mention_id"),
      xxhash64(col("repo"), col("path"), col("commit"), col("line")).as("ctx_id"), col("ctx_terms"))
    val ctxs = m.select(col("ctx_id"), col("ctx_terms")).dropDuplicates("ctx_id")
    time("ctx dropDuplicates")(ctxs.count())
    val tf = ctxs.select(col("ctx_id"), explode(col("ctx_terms")).as("term"))
      .groupBy(col("ctx_id"), col("term")).agg(count(lit(1)).as("tf"))
    time("tf agg")(tf.count())
    time("score (full)")(Scoring.score(mentions, cands, kbCtx).count())
    time("top1 (full)")(Scoring.top1(Scoring.score(mentions, cands, kbCtx)).count())
    spark.stop()
  }
}
