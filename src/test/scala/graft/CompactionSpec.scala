package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.{Compaction, ParquetTableIO}
import java.nio.file.Files

/** Compaction: many small files → few target-sized files, rows preserved
  * exactly, committed atomically through the TableIO seam; Hive-partitioned
  * layouts are compacted per partition and keep their pruning. The
  * crash-injection cases drive the two-phase-rename commit through every
  * crash point and assert a complete table survives each one. */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("append-accumulated small files compact to the derived count, rows intact") {
    val io = new ParquetTableIO(Files.createTempDirectory("compact").toString)
    // simulate 20 micro-batch appends of 50 rows each → ≥20 small files
    for (b <- 0 until 20)
      io.append((b * 50 until (b + 1) * 50).map(i => (i.toLong, s"row_$i")).toDF("id", "v"),
                "events")
    val before = Compaction.fileCount(spark, io, "events")
    assert(before >= 20, s"expected many small files, got $before")
    val rowsBefore = io.read(spark, "events").orderBy("id").collect().toSeq

    val bytes = Compaction.tableBytes(spark, io, "events")
    // pick a target that derives ~3 files from the actual on-disk bytes
    val (b0, b1) = Compaction.compact(spark, io, "events", targetBytes = bytes / 3 + 1)
    assert(b0 == before)
    assert(b1 <= 3, s"expected <=3 files after compaction, got $b1")

    val rowsAfter = io.read(spark, "events").orderBy("id").collect().toSeq
    assert(rowsAfter == rowsBefore)
    assert(rowsAfter.size == 1000)
  }

  test("compacting a partitioned table keeps the layout and its pruning") {
    val io = new ParquetTableIO(Files.createTempDirectory("compact_part").toString)
    val df = (0 until 600).map(i => (i.toLong, s"pred_${i % 3}", s"v$i"))
      .toDF("id", "pred", "obj").repartition(8)
    io.write(df, "triples", partitionBy = Seq("pred"))
    assert(Compaction.partitionColumns(spark, io, "triples") == Seq("pred"))
    val before = Compaction.fileCount(spark, io, "triples")
    assert(before > 6, s"expected several files per partition, got $before")
    val rowsBefore = io.read(spark, "triples").orderBy("id")
      .collect().map(_.toString).toSeq

    val (_, after) = Compaction.compact(spark, io, "triples")
    assert(after == 3, s"expected one file per pred partition, got $after")

    // layout preserved: pred is still a partition column read from dir names
    val reread = io.read(spark, "triples")
    val rowsAfter = reread.orderBy("id").collect().map(_.toString).toSeq
    assert(rowsAfter == rowsBefore)

    // and directory-level pruning still reaches the scan (PlanSpec pattern)
    val scan = reread.filter(col("pred") === "pred_1").select("id", "obj")
      .queryExecution.sparkPlan.collectLeaves().map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("isnotnull(pred"),
      s"partition pruning lost after compaction:\n$scan")
  }

  test("nested (two-level) partition layouts compact per leaf and survive") {
    val io = new ParquetTableIO(Files.createTempDirectory("compact_nested").toString)
    val df = (0 until 400).map(i => (i.toLong, s"p${i % 2}", s"l${i % 3}", i * 2L))
      .toDF("id", "pred", "lang", "v").repartition(6)
    io.write(df, "t", partitionBy = Seq("pred", "lang"))
    assert(Compaction.partitionColumns(spark, io, "t") == Seq("pred", "lang"))
    val rowsBefore = io.read(spark, "t").orderBy("id").collect().map(_.toString).toSeq
    val (_, after) = Compaction.compact(spark, io, "t")
    assert(after == 6, s"expected one file per (pred,lang) leaf, got $after")
    assert(io.read(spark, "t").orderBy("id").collect().map(_.toString).toSeq == rowsBefore)
    assert(Compaction.partitionColumns(spark, io, "t") == Seq("pred", "lang"))
  }

  test("a torn ._tmp (crash mid-write) is ignored and replaced by the next write") {
    val io = new ParquetTableIO(Files.createTempDirectory("torn_tmp").toString)
    val v1 = (0 until 30).map(i => (i.toLong, "v1")).toDF("id", "v")
    io.write(v1, "t")
    // simulate a writer that died mid-job: a garbage ._tmp next to a healthy dst
    val torn = java.nio.file.Paths.get(io.root, "t._tmp")
    Files.createDirectories(torn)
    Files.writeString(torn.resolve("part-garbage.parquet"), "not parquet")
    assert(io.read(spark, "t").count() == 30) // dst untouched, tmp ignored
    io.write((0 until 40).map(i => (i.toLong, "v2")).toDF("id", "v"), "t")
    val rows = io.read(spark, "t").collect()
    assert(rows.length == 40 && rows.forall(_.getString(1) == "v2"))
  }

  /** IO whose commit dies at a named crash point (the test seam). */
  private class CrashingIO(root: String, at: String) extends ParquetTableIO(root) {
    override protected def crashPoint(name: String): Unit =
      if (name == at) throw new RuntimeException(s"injected crash at $name")
  }

  test("a crash at every commit point leaves a complete table (write and compact)") {
    for (at <- Seq("before-swap", "mid-swap", "after-swap")) {
      val root = Files.createTempDirectory(s"crash_$at").toString
      val good = new ParquetTableIO(root)
      val v1 = (0 until 100).map(i => (i.toLong, "v1")).toDF("id", "v")
      val v2 = (0 until 100).map(i => (i.toLong, "v2")).toDF("id", "v")
      good.write(v1, "t")

      val bad = new CrashingIO(root, at)
      val e = intercept[RuntimeException](bad.write(v2, "t"))
      assert(e.getMessage.contains(at))

      // next access through a fresh (healthy) IO recovers a COMPLETE table:
      // v1 if the swap never committed, v2 if the staged copy was complete
      val rows = good.read(spark, "t").collect()
      assert(rows.length == 100, s"torn table after crash at $at")
      val versions = rows.map(_.getString(1)).distinct.toSeq
      assert(versions.size == 1, s"mixed versions after crash at $at: $versions")
      val expected = if (at == "before-swap") "v1" else "v2"
      assert(versions.head == expected,
        s"crash at $at recovered $versions, expected $expected")

      // and the table is fully writable again afterwards
      val v3 = (0 until 50).map(i => (i.toLong, "v3")).toDF("id", "v")
      good.write(v3, "t")
      assert(good.read(spark, "t").collect().map(_.getString(1)).forall(_ == "v3"))
    }
  }

  test("a reader racing the commit mid-swap rolls it forward; the writer tolerates losing the rename") {
    val root = Files.createTempDirectory("reader_race").toString
    val good = new ParquetTableIO(root)
    good.write((0 until 20).map(i => (i.toLong, "v1")).toDF("id", "v"), "t")
    // writer whose mid-swap window is interleaved with a concurrent read:
    // recover() sees dst missing + old/tmp present and rolls the commit
    // forward itself — the writer's own rename then fails benignly
    var readerSaw = -1L
    val racing = new ParquetTableIO(root) {
      override protected def crashPoint(name: String): Unit =
        if (name == "mid-swap") readerSaw = good.read(spark, "t").count()
    }
    racing.write((0 until 35).map(i => (i.toLong, "v2")).toDF("id", "v"), "t") // must not throw
    assert(readerSaw == 35, "racing reader should see the rolled-forward v2")
    val rows = good.read(spark, "t").collect()
    assert(rows.length == 35 && rows.forall(_.getString(1) == "v2"))
  }

  test("a crashed compaction leaves the original table untouched") {
    for (at <- Seq("before-swap", "mid-swap")) {
      val root = Files.createTempDirectory(s"crash_compact_$at").toString
      val good = new ParquetTableIO(root)
      for (b <- 0 until 10)
        good.append((b * 10 until (b + 1) * 10).map(i => (i.toLong, s"r$i")).toDF("id", "v"), "t")
      val rowsBefore = good.read(spark, "t").orderBy("id").collect().toSeq

      val bad = new CrashingIO(root, at)
      intercept[RuntimeException](Compaction.compact(spark, bad, "t"))

      // mid-swap leaves dst missing on disk — recover() must roll FORWARD to
      // the fully-staged compacted copy; before-swap must keep the original
      val rowsAfter = good.read(spark, "t").orderBy("id").collect().toSeq
      assert(rowsAfter == rowsBefore, s"compaction crash at $at changed table contents")
    }
  }
}
