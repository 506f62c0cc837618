package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.Bucketing

/** Bucketed co-located joins: the join of two same-key bucketed tables must
  * read its distribution FROM STORAGE — zero Exchange on either side — and
  * produce the same rows as the shuffled join of the raw frames. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("same-key bucketed join plans with no shuffle and matches the raw join") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val scores = docs.select(col("doc_id"), (col("n_chars") % 97).as("score"))
    Bucketing.writeBucketed(docs, "b_docs", "doc_id", 4)
    Bucketing.writeBucketed(scores, "b_scores", "doc_id", 4)
    try {
      val joined = Bucketing.colocatedJoin(spark, "b_docs", "b_scores", "doc_id")
      // force the non-broadcast path: co-location is the thing under test
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val rows = joined.collect()
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed join shuffled:\n$plan")
        val expected = docs.join(scores, "doc_id").collect()
        assert(rows.map(_.toString).sorted.toSeq ==
               expected.map(_.toString).sorted.toSeq)
        assert(rows.length == 500)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_scores")
    }
  }

  test("per-run namespacing: concurrent runs never collide; stale runs retire") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"))
    try {
      // two "concurrent" runs publish under distinct names — no collision,
      // and writing run B must not disturb run A's committed table
      val tA = Bucketing.writeBucketedRun(docs, "bkt", "runA", "doc_id", 4)
      val tB = Bucketing.writeBucketedRun(docs.limit(100), "bkt", "runB", "doc_id", 4)
      assert(tA != tB)
      assert(spark.table(tA).count() == 500 && spark.table(tB).count() == 100)

      // retiring everything but runB drops exactly runA's table
      val dropped = Bucketing.dropStale(spark, "bkt", keep = Set("runB"))
      assert(dropped == Seq(tA).sorted, s"expected to drop only $tA, dropped $dropped")
      assert(!spark.catalog.tableExists(tA) && spark.table(tB).count() == 100)

      // re-running the SAME run id overwrites its own table (rerun-safe)
      Bucketing.writeBucketedRun(docs, "bkt", "runB", "doc_id", 4)
      assert(spark.table(tB).count() == 500)
    } finally Bucketing.dropStale(spark, "bkt", keep = Set.empty)
  }
}
