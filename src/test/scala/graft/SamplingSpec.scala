package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Sampling

/** Deterministic-sampling properties: reproducibility, rate accuracy,
  * stability under corpus growth (the property `rand()`-based sampling
  * cannot give), split disjointness, and the keep-all threshold edge.
  */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ids(n: Int) = spark.range(n).select(col("id"))

  test("bernoulli: deterministic, rate within tolerance, partition-independent") {
    val a = Sampling.bernoulli(ids(20000), col("id"), 64, "t").collect().map(_.getLong(0)).sorted
    val b = Sampling.bernoulli(ids(20000).repartition(13), col("id"), 64, "t")
      .collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b), "sample must not depend on partitioning")
    val rate = a.length / 20000.0
    assert(math.abs(rate - 0.25) < 0.02, s"rate $rate far from 0.25")
  }

  test("bernoulli: stable under corpus growth — a kept row stays kept") {
    val small = Sampling.bernoulli(ids(5000), col("id"), 64, "t")
      .collect().map(_.getLong(0)).toSet
    val large = Sampling.bernoulli(ids(20000), col("id"), 64, "t")
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large), "growing the corpus must not change earlier rows' fate")
  }

  test("stratified: per-stratum rates applied; keep-all (256) keeps everything") {
    val df = ids(8000).withColumn("grp", when(col("id") % 2 === 0, "a").otherwise("b"))
    val kept = Sampling.stratified(df, col("id"), col("grp"),
      Seq("a" -> 256), default256 = 32, seed = "t")
    val aKept = kept.filter(col("grp") === "a").count()
    val bRate = kept.filter(col("grp") === "b").count() / 4000.0
    assert(aKept == 4000, s"keep-all stratum dropped rows: $aKept")
    assert(math.abs(bRate - 0.125) < 0.03, s"stratum-b rate $bRate far from 0.125")
  }

  test("uniformK: exactly k distinct rows, deterministic, top-k plan (no global sort)") {
    val q = Sampling.uniformK(ids(10000), col("id"), 37, "t")
    val a = q.collect().map(_.getLong(0))
    assert(a.length == 37 && a.distinct.length == 37)
    assert(a.sameElements(Sampling.uniformK(ids(10000), col("id"), 37, "t")
      .collect().map(_.getLong(0))))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan, got:\n$plan")
  }

  test("split: exhaustive, disjoint, ratios near target, stable per-row") {
    val s = Sampling.split(ids(20000), col("id"), 236, 246, "t")
    val counts = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 20000)
    assert(math.abs(counts("train") / 20000.0 - 236 / 256.0) < 0.02)
    assert(math.abs(counts("val") / 20000.0 - 10 / 256.0) < 0.01)
    // same row, same split, regardless of how much corpus surrounds it
    val one = Sampling.split(ids(50), col("id"), 236, 246, "t")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val again = s.filter(col("id") < 50)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(one == again)
  }
}
