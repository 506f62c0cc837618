package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Packing

/** Sequence-packing properties: pos is the running concat offset within the
  * shard's epoch order, packs chunk at the budget, epochs reshuffle
  * deterministically, and the window is always sharded (never global).
  */
class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def toyDocs(n: Int) =
    spark.range(n).select(col("id"), (col("id") % 7 + 1).as("toks"))

  test("pos is the running token offset within (shard, epoch order)") {
    val out = Packing.pack(toyDocs(500), col("id"), col("toks"),
      budget = 16, shards = 4, seed = "e1")
      .select("id", "toks", "shard", "pos", "pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // recompute per shard in the same order and compare offsets
    out.groupBy(_._3).foreach { case (_, rows) =>
      val ordered = rows.sortBy { case (id, _, _, _, _) =>
        (java.security.MessageDigest.getInstance("MD5")
          .digest(s"e1_$id".getBytes("UTF-8")).map("%02x".format(_)).mkString, id)
      }
      var run = 0L
      ordered.foreach { case (_, toks, shard, pos, packId) =>
        assert(pos == run, s"pos $pos != running offset $run")
        assert(packId == shard * Packing.PacksPerShard + pos / 16)
        run += toks
      }
    }
  }

  test("packs respect the budget: per-pack token start-span ≤ budget") {
    val out = Packing.pack(toyDocs(500), col("id"), col("toks"),
      budget = 16, shards = 4, seed = "e1")
    val spans = out.groupBy("pack_id")
      .agg((max(col("pos")) - min(col("pos"))).as("span")).collect()
    assert(spans.forall(_.getLong(1) < 16), "a pack's start offsets span past the budget")
  }

  test("a new seed is a new deterministic epoch order") {
    def packsFor(seed: String) =
      Packing.pack(toyDocs(300), col("id"), col("toks"), 16, 4, seed)
        .select("id", "pack_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e1 = packsFor("e1"); val e1b = packsFor("e1"); val e2 = packsFor("e2")
    assert(e1 == e1b, "same seed must pack identically")
    assert(e1 != e2, "a new epoch seed must reshuffle")
  }

  test("the window is sharded, never a no-partition global sort") {
    val plan = Packing.pack(toyDocs(100), col("id"), col("toks"), 16, 4, "e1")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window [") || plan.contains("windowspecdefinition(shard"),
      s"window must partition by shard:\n$plan")
  }
}
