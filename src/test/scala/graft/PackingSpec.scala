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

  test("chunks tile every document: contiguous offsets, lens sum to toks, budget-aligned") {
    // toks 1..7 with budget 16 → many docs straddle pack boundaries
    val packed = Packing.pack(toyDocs(500), col("id"), col("toks"),
      budget = 16, shards = 4, seed = "e1")
    val rows = Packing.chunks(packed, col("toks"), budget = 16)
      .select("id", "toks", "pos", "pack_id", "offset_in_doc", "chunk_len")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (id, ch) =>
      val toks = ch.head._2
      val sorted = ch.sortBy(_._5)
      // chunks tile the document: offsets contiguous from 0, lens sum to toks
      assert(sorted.head._5 == 0, s"doc $id first chunk must start at offset 0")
      sorted.sliding(2).foreach {
        case Array((_, _, _, _, o1, l1), (_, _, _, _, o2, _)) =>
          assert(o2 == o1 + l1, s"doc $id chunks not contiguous")
        case _ =>
      }
      assert(sorted.map(_._6).sum == toks, s"doc $id chunk lens must sum to toks")
      // consecutive chunks land in consecutive packs, each chunk inside its
      // pack's [p*budget, (p+1)*budget) window of the shard stream
      sorted.zipWithIndex.foreach { case ((_, _, pos, packId, off, len), j) =>
        assert(packId == sorted.head._4 + j)
        val packLo = (packId % Packing.PacksPerShard) * 16
        assert(pos + off >= packLo && (len == 0 || pos + off + len <= packLo + 16),
          s"doc $id chunk $j outside its pack window")
      }
    }
    // the straddle case actually occurs in the fixture
    assert(rows.groupBy(_._1).exists(_._2.length > 1), "fixture must contain straddling docs")
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
