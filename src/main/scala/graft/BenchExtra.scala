package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1) — SEPARATE from the
  * frozen driver contract in [[Bench]]: spot-times named queries with
  * repeats under the exact bench session configuration, and can dump
  * `.explain("formatted")` plans for the before/after evidence files.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.BenchExtra q1,q2 [repeats] [--explain plans/r06 --suffix before]"
  *
  * Timing matches Bench's methodology (`.count()` on the query frame) so the
  * numbers are comparable to BENCH_r*.json entries; pass `--noop` to time a
  * full-column noop-sink write instead (guide §1.4) when column pruning under
  * count() would hide the cost being measured.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args.headOption.map(_.split(',').toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val repeats = args.drop(1).headOption.filter(!_.startsWith("--")).map(_.toInt).getOrElse(2)
    def flag(name: String): Option[String] = {
      val i = args.indexOf(name); if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
    }
    val explainDir = flag("--explain")
    val suffix = flag("--suffix").getOrElse("before")
    val useNoop = args.contains("--noop")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", System.getProperty("java.io.tmpdir")))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                   math.max(cpus.toInt, 32).toString)

    spark.range(1000000).selectExpr("sum(id)").collect()
    Fixtures.ensure(spark)

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[extra] unknown query: $name")
        case Some(fn) =>
          explainDir.foreach { d =>
            val dir = java.nio.file.Paths.get(d)
            java.nio.file.Files.createDirectories(dir)
            val plan = fn(spark, sfDir).queryExecution
              .explainString(org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(dir.resolve(s"${name}_$suffix.txt"), plan)
          }
          spark.sparkContext.setJobDescription(s"extra:$name")
          val ts = (1 to repeats).map { _ =>
            time {
              val df = fn(spark, sfDir)
              if (useNoop) df.write.format("noop").mode("overwrite").save()
              else df.count()
            }
          }
          spark.sparkContext.setJobDescription(null)
          println(f"[extra] $name%-28s ${ts.map(t => f"$t%.3f").mkString(" ")} (min ${ts.min}%.3f)")
      }
    }
    spark.stop()
  }
}
