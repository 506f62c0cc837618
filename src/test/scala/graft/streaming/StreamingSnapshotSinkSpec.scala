package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.io.SnapshotTable

/** Exactly-once streaming sink into a SnapshotTable: every micro-batch is a
  * metadata-only marker-keyed append; replays are manifest no-ops; the
  * accumulated table chains into the CDC hand-off (readAppendsBetween). */
class StreamingSnapshotSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("stream lands in ONE table exactly once; incremental consumer follows the head") {
    val srcDir = Files.createTempDirectory("sss_src").toString
    val ckpt = Files.createTempDirectory("sss_ckpt").toString
    val table = new SnapshotTable(Files.createTempDirectory("sss_tab").toString, "docs")

    def drop(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(srcDir)

    drop((0L until 20L).map(i => (i, s"doc $i")))
    val stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(srcDir)
    val q = StreamingSnapshotSink.start(stream, table, "ingest", ckpt)
    try {
      q.processAllAvailable()
      assert(table.read(spark).count() == 20)
      val head1 = table.currentSnapshot(spark).get

      // second file arrives → second micro-batch → ONE metadata-only append
      drop((20L until 30L).map(i => (i, s"doc $i")))
      q.processAllAvailable()
      assert(table.read(spark).select("doc_id").as[Long].collect().toSet
        == (0L until 30L).toSet)

      // the CDC hand-off: a consumer anchored at head1 sees ONLY the new batch
      val delta = table.readAppendsBetween(spark, head1, table.currentSnapshot(spark).get)
      assert(delta.select("doc_id").as[Long].collect().toSet == (20L until 30L).toSet)
    } finally q.stop()

    // at-least-once delivery simulated: re-running an already-committed
    // batch through the sink body is a manifest no-op — rows unchanged
    val before = table.read(spark).count()
    val markers = table.committedMarkers(spark)
    assert(markers.exists(_.startsWith("ingest#")), s"expected ingest markers, got $markers")
    val replayId = markers.filter(_.startsWith("ingest#")).map(_.split("#")(1).toLong).min
    StreamingSnapshotSink.addBatch(table, "ingest")(
      (100L until 110L).map(i => (i, s"dup $i")).toDF("doc_id", "text"), replayId)
    assert(table.read(spark).count() == before, "replayed batch must not double-append")

    // a genuinely new batch id still lands
    StreamingSnapshotSink.addBatch(table, "ingest")(
      Seq((200L, "late")).toDF("doc_id", "text"), 9999L)
    assert(table.read(spark).count() == before + 1)
  }

  test("maintenance keeps the replay horizon: compaction re-anchors, expire keeps markers") {
    val table = new SnapshotTable(Files.createTempDirectory("sss_maint").toString, "docs")
    (0 until 5).foreach { b =>
      StreamingSnapshotSink.addBatch(table, "q")(
        (b * 10 until (b + 1) * 10).map(i => (i.toLong, s"d$i")).toDF("doc_id", "text"), b.toLong)
    }
    assert(table.read(spark).count() == 50)
    // compaction folds the 5 micro-batch commits into one file set
    val rewritten = table.rewriteDataFiles(spark, targetBytes = 1L << 30)
    assert(table.manifest(spark, rewritten).get.data.size == 1)
    // expire to the replay horizon: recent markers survive, old metadata goes
    table.expireSnapshots(spark, keepLast = 2)
    val kept = table.committedMarkers(spark)
    // the last pre-compaction batch marker is inside keepLast=2 ⇒ retained
    assert(kept.contains("q#4"), s"marker horizon lost: $kept")
    // replay of a retained-marker batch is still a no-op after maintenance
    StreamingSnapshotSink.addBatch(table, "q")(
      Seq((999L, "dup")).toDF("doc_id", "text"), 4L)
    assert(table.read(spark).count() == 50)
  }
}
