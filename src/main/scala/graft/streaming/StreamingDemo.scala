package graft.streaming

import org.apache.spark.sql.SparkSession
import graft.kg.{CorpusGen, Eval}
import java.nio.file.Files

/** Runnable sample of the streaming surface: stages two corpus chunks into a
  * watched directory, runs the incremental KG ingest, and reports triple
  * counts + P/R after each chunk. `runMain graft.streaming.StreamingDemo [n]`. */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 400
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val srcDir = Files.createTempDirectory("demo_src").toString
    val outDir = Files.createTempDirectory("demo_out").toString + "/triples"
    val ckpt = Files.createTempDirectory("demo_ckpt").toString
    val q = StreamingPipeline.start(spark, srcDir,
      CorpusGen.kbEntries(spark).toDF(), CorpusGen.kbContexts(spark).toDF(),
      outDir, ckpt)
    try {
      Seq((0, n / 2), (n / 2, n)).zipWithIndex.foreach { case ((from, until), i) =>
        spark.range(from, until).map(id => CorpusGen.genFile(id)._1).toDF()
          .coalesce(1).write.mode("append").parquet(srcDir)
        q.processAllAvailable()
        val triples = spark.read.parquet(outDir)
        val pr = Eval.precisionRecall(triples, CorpusGen.gold(spark, until).toDF()).collect()(0)
        println(f"[demo] chunk ${i + 1}: files=$until triples=${triples.count()} " +
                f"precision=${pr.getAs[Double]("precision")}%.4f recall=${pr.getAs[Double]("recall")}%.4f")
      }
    } finally { q.stop(); spark.stop() }
  }
}
