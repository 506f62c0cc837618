package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev profiling probe (r6): per-round timing of the connected-components
  * fixpoint on the KG edge table. Not part of the driver contract.
  * Usage: runMain graft.kg.CcProbe [sfDir]. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var t0 = System.nanoTime()
    def mark(label: String): Unit = {
      println(f"[ccprobe] $label%-20s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      t0 = System.nanoTime()
    }
    val timedMat: (DataFrame, String) => DataFrame = (df, name) => {
      val out = df.localCheckpoint()
      mark(name)
      out
    }
    val pairs = graft.ops.GraphOps.edges(spark, sf)
      .select(col("src").as("d1"), col("dst").as("d2"))
    val cc = graft.ops.Dedup.connectedComponents(pairs, materialize = timedMat)
    val n = cc.count()
    mark(s"final count=$n")
    spark.stop()
  }
}
