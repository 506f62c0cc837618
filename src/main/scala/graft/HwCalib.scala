package graft

import org.apache.spark.sql.SparkSession

/** Hardware-scaling calibration for the sandbox two-cluster-size stand-in
  * (BASELINE.md): times the SAME pure-CPU work per core at two parallelism
  * levels. On real N→4N clusters each executor keeps its clock; on one
  * shared 32-vCPU host, an 8-thread run sees lower sustained per-core
  * throughput than a 2-thread run (turbo headroom, SMT pairing, noisy
  * neighbors) — this probe measures that ceiling so the software scaling
  * number can be read against it. Work: `rounds` passes of
  * sum(id*3 % 7) over 250M longs PER CORE (whole-stage-codegen'd long
  * arithmetic, no shuffle, no disk — embarrassingly parallel by
  * construction, so any wall-clock gap between levels is hardware, not
  * plan). Prints one JSON line per level pair, interleaved 2,8,2,8. */
object HwCalib {
  def main(args: Array[String]): Unit = {
    val perCore = sys.env.getOrElse("SPARK_GRAFT_CALIB_PER_CORE", "250000000").toLong
    def timeAt(cores: Int): Double = {
      val spark = SparkSession.builder().master(s"local[$cores]")
        .appName(s"hwcalib-$cores")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      try {
        // warmup (codegen compile)
        spark.range(0, 1000000L, 1, cores).selectExpr("sum(id * 3 % 7)").collect()
        val t0 = System.nanoTime()
        spark.range(0, perCore * cores, 1, cores).selectExpr("sum(id * 3 % 7)").collect()
        (System.nanoTime() - t0) / 1e9
      } finally spark.stop()
    }
    val runs = Seq(2, 8, 2, 8).map(c => c -> timeAt(c))
    val by = runs.groupBy(_._1).view.mapValues(v => v.map(_._2))
    val m2 = by(2).sum / by(2).size; val m8 = by(8).sum / by(8).size
    val secs = runs.map { case (c, s) => f"""{"cores":$c,"sec":$s%.2f}""" }.mkString("[", ",", "]")
    println(f"""{"metric":"hw_calib","per_core_rows":$perCore,"runs":$secs,"mean_sec_c2":$m2%.2f,"mean_sec_c8":$m8%.2f,"hw_eff_2to8":${m2 / m8}%.3f}""")
  }
}
