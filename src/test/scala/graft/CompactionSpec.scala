package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.{Compaction, ParquetTableIO}
import java.nio.file.Files

/** Compaction: many small files → few target-sized files, rows preserved
  * exactly, committed atomically through the TableIO seam. */
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
}
