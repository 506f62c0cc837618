package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{ParquetTableIO, SnapshotTable, SnapshotTableIO}
import graft.ops.CurationPipeline

/** The seam-swap proof: everything that checkpoints through the TableIO
  * trait runs unchanged when the implementation is snapshot-committed
  * tables instead of directory-swap parquet — the claim SURVEY.md §7.3/§7.4
  * makes about the Iceberg swap, demonstrated with a real second
  * implementation. */
class SnapshotTableIOSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus = {
    def sentence(seed: Int, n: Int): String = {
      val r = new scala.util.Random(seed)
      val pool = Array("alpha", "beta", "gamma", "delta", "kernel", "socket",
                       "stream", "batch", "vector", "matrix", "cursor", "ledger")
      (0 until n).map(_ => pool(r.nextInt(pool.length))).mkString(" ")
    }
    ((0 until 25).map(i => (i.toLong, sentence(i, 40), "en", "srcA")) :+
      (60L, sentence(0, 40), "en", "srcB")) // exact dup of doc 0
      .toDF("doc_id", "text", "lang", "source")
  }

  test("curation funnel over SnapshotTableIO ≡ over ParquetTableIO") {
    val pq = new CurationPipeline(
      new ParquetTableIO(Files.createTempDirectory("seam_pq").toString), "seam")
    val sn = new CurationPipeline(
      new SnapshotTableIO(Files.createTempDirectory("seam_sn").toString), "seam")
    // column ORDER is a storage detail (Hive partitionBy moves partition
    // columns to the end on read-back; snapshot tables keep writer order) —
    // compare on a canonical column order
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(df.columns.sorted.map(org.apache.spark.sql.functions.col): _*)
        .orderBy("doc_id").collect().toSeq
    val a = canon(pq.run(spark, corpus))
    val b = canon(sn.run(spark, corpus))
    assert(a == b, "funnel output must not depend on the TableIO implementation")
    assert(a.size == 25, "the exact dup must be dropped, clean docs kept")
  }

  test("staged resume works through snapshot commits: committed stages are read, not re-run") {
    val dir = Files.createTempDirectory("seam_resume").toString
    val io = new SnapshotTableIO(dir)
    val first = new CurationPipeline(io, "r1").run(spark, corpus)
      .orderBy("doc_id").collect().toSeq

    // every stage's lineage row landed through append commits
    val lin = io.read(spark, "_lineage")
    assert(lin.filter($"status" === "committed").count() > 0)

    // resume: identical output, and the stage tables were NOT recommitted —
    // each SnapshotTable's current snapshot id is unchanged after the rerun
    val snapsBefore = io.list(spark, "").map(t =>
      t -> new SnapshotTable(dir, t).currentSnapshot(spark)).toMap
    val again = new CurationPipeline(io, "r1", resume = true).run(spark, corpus)
      .orderBy("doc_id").collect().toSeq
    assert(again == first)
    val snapsAfter = io.list(spark, "").map(t =>
      t -> new SnapshotTable(dir, t).currentSnapshot(spark)).toMap
    assert(snapsAfter == snapsBefore,
      s"resume recommitted stage tables: before=$snapsBefore after=$snapsAfter")
  }

  test("write(partitionBy) range-clusters so stats pruning replaces directory pruning") {
    val dir = Files.createTempDirectory("seam_prune").toString
    val io = new SnapshotTableIO(dir)
    val triples = (0 until 4000)
      .map(i => (s"s$i", s"pred_${i % 4}", s"o$i")).toDF("subj", "pred", "obj")
    io.write(triples, "triples", partitionBy = Seq("pred"))

    val pr = new SnapshotTable(dir, "triples").readRange(
      spark, "pred", Some("pred_2"), Some("pred_2"))
    assert(pr.filesScanned < pr.filesTotal,
      s"stats prune did not bite: ${pr.filesScanned}/${pr.filesTotal}")
    assert(pr.df.count() == 1000)
    assert(io.read(spark, "triples").count() == 4000)
  }
}
