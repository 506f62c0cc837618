package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Planted-hot-bigram skew measurement for `TextAnalysis.lmScore` (the one
  * documented skew point of the bigram-LM scorer: the scoring join keys on
  * the bigram, and stopword bigrams are Zipf-hot). This bench builds a
  * corpus where ONE bigram ("the of") dominates — every doc carries ~39
  * copies vs a handful of unique-tail bigrams — so the probe side of the
  * scoring join concentrates on a single hash partition, then times the
  * score with AQE's skew-join split ON vs OFF on the same input.
  *
  * Usage: `SPARK_GRAFT_CPUS=N SPARK_GRAFT_LM_DOCS=M runMain graft.ops.LmSkewBench`
  * Prints one JSON line; numbers land in BENCH.md. Salting (the J2 pattern)
  * is deliberately NOT wired into lmScore unless this measurement shows AQE
  * failing to contain the skew — measure first, then engineer. */
object LmSkewBench {

  /** n docs, each "the of the of ... u{i}_a u{i}_b u{i}_c": the hot bigram
    * is ~87% of all bigram occurrences at any n. */
  def hotCorpus(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("doc_id"),
      concat(lit(("the of " * 20).trim), lit(" "),
             format_string("u%d_a u%d_b u%d_c", col("id"), col("id"), col("id"))).as("text"))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_LM_DOCS", "2000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-lm-skew-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
    }
    // warmup (codegen + corpus expr) at a small size
    TextAnalysis.lmScoreFor(hotCorpus(spark, 10000)).count()

    val corpus = hotCorpus(spark, nDocs)
    def run(skewJoin: Boolean): Double = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin)
      // the skew detector only splits partitions above both the factor and
      // the absolute threshold; lower the threshold so the planted hot
      // partition qualifies at bench scale (cluster default is 256m)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32m")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      val (sec, rows) = time(TextAnalysis.lmScoreFor(corpus).count())
      require(rows == nDocs, s"expected $nDocs scored docs, got $rows")
      sec
    }
    // interleave OFF/ON twice to spread host drift
    val off1 = run(false); val on1 = run(true)
    val off2 = run(false); val on2 = run(true)
    println(f"""{"metric":"lm_skew","docs":$nDocs,"cpus":$cpus,"hot_bigram_share":0.87,"skew_off_sec":[$off1%.1f,$off2%.1f],"skew_on_sec":[$on1%.1f,$on2%.1f]}""")
    spark.stop()
  }
}
