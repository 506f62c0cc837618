package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement (r6, VERDICT item 7): what does a BPE merge round cost at
  * a 10^5-word vocabulary, and how much of it is the full-vocabulary
  * `mergePair` fold vs the pair-count aggregation? (LmSkewBench discipline:
  * measure before wiring an incremental form.) Not part of the driver
  * contract. Usage: runMain graft.ops.BpeScaleBench [nWords] [merges]. */
object BpeScaleBench {
  def main(args: Array[String]): Unit = {
    val nWords = args.headOption.map(_.toInt).getOrElse(100000)
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // synthetic Zipf-ish vocabulary: word w_i = base-26 digits of i repeated
    // to a 3-12 char length, count ~ 1/(i+1) — deterministic, no corpus pass
    val vocab0 = spark.range(nWords).map { i =>
      val r = new scala.util.Random(i)
      val len = 3 + r.nextInt(10)
      val w = (0 until len).map(_ => ('a' + r.nextInt(26)).toChar).mkString
      (w, math.max(1L, (nWords / (i + 1)).toLong))
    }.toDF("word", "cnt").groupBy("word").agg(max("cnt").as("cnt"))

    var vocab = vocab0.withColumn("syms", Bpe.initialSymbols(col("word"))).localCheckpoint()
    println(s"[bpe] vocab rows = ${vocab.count()}")
    var tCount = 0.0; var tMerge = 0.0
    var round = 0
    while (round < k) {
      val t0 = System.nanoTime()
      val top = Bpe.pairCounts(vocab)
        .filter(col("n") > 1)
        .orderBy(desc("n"), asc("a"), asc("b")).limit(1)
        .collect()
      val t1 = System.nanoTime()
      tCount += (t1 - t0) / 1e9
      if (top.isEmpty) { round = k }
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        vocab = vocab.withColumn("syms", Bpe.mergePair(col("syms"), a, b)).localCheckpoint()
        tMerge += (System.nanoTime() - t1) / 1e9
        round += 1
      }
    }
    println(f"[bpe] $k rounds: pairCounts+top total $tCount%.2fs, mergePair+ckpt total $tMerge%.2fs")
    spark.stop()
  }
}
