package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.SnapshotTable

/** SnapshotTable — the Iceberg-semantics layer: metadata-only commits,
  * snapshot isolation under torn commits, time travel, equality-delete
  * merge-on-read with the sequence rule, stats-based file skipping,
  * rewrite_data_files and expire_snapshots. */
class SnapshotTableSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fresh(prefix: String) =
    new SnapshotTable(Files.createTempDirectory(prefix).toString, "t")

  private def docs(from: Int, until: Int) =
    (from until until).map(i => (i.toLong, s"lang_${i % 3}", i * 10)).toDF("doc_id", "lang", "toks")

  test("overwrite + read + snapshot ids") {
    val t = fresh("snap_basic")
    assert(!t.exists(spark))
    val s1 = t.writeOverwrite(docs(0, 100))
    assert(s1 == 1L && t.currentSnapshot(spark).contains(1L))
    assert(t.read(spark).count() == 100)
    val s2 = t.writeOverwrite(docs(0, 40))
    assert(s2 == 2L)
    assert(t.read(spark).count() == 40)
    assert(t.snapshots(spark) == Seq(1L, 2L))
  }

  test("append is metadata-only: existing data files are re-listed, not rewritten") {
    val t = fresh("snap_append")
    t.writeOverwrite(docs(0, 100))
    val fs = new Path(t.location).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m1 = t.manifest(spark, 1L).get
    val before = m1.data.map { e =>
      val st = fs.getFileStatus(new Path(s"${t.location}/${e.path}"))
      (e.path, st.getLen, st.getModificationTime)
    }
    assert(before.nonEmpty)

    t.append(docs(100, 120))
    val m2 = t.manifest(spark, 2L).get
    // every snapshot-1 file appears verbatim in snapshot 2, untouched on disk
    assert(m1.data.map(_.path).toSet.subsetOf(m2.data.map(_.path).toSet))
    before.foreach { case (path, len, mtime) =>
      val st = fs.getFileStatus(new Path(s"${t.location}/$path"))
      assert(st.getLen == len && st.getModificationTime == mtime, s"$path was rewritten")
    }
    // only the appended rows are new bytes
    val newFiles = m2.data.map(_.path).toSet -- m1.data.map(_.path).toSet
    assert(newFiles.nonEmpty)
    assert(m2.data.filter(e => newFiles(e.path)).map(_.rows).sum == 20)
    assert(t.read(spark).count() == 120)
  }

  test("time travel: readAt returns each snapshot exactly") {
    val t = fresh("snap_tt")
    t.writeOverwrite(docs(0, 50))
    t.append(docs(50, 80))
    t.writeOverwrite(docs(0, 10))
    assert(t.readAt(spark, 1L).count() == 50)
    assert(t.readAt(spark, 2L).count() == 80)
    assert(t.readAt(spark, 3L).count() == 10)
    assert(t.readAt(spark, 2L).agg(sum("doc_id")).as[Long].head == (0L until 80).sum)
  }

  test("equality deletes: merge-on-read drops prior rows; later appends of the same key survive") {
    val t = fresh("snap_del")
    t.writeOverwrite(docs(0, 100))                                // seq 1
    t.deleteWhereKeys(Seq(5L, 17L, 42L).toDF("doc_id"), Seq("doc_id")) // seq 2
    val afterDel = t.read(spark).select("doc_id").as[Long].collect().toSet
    assert(afterDel.size == 97 && !afterDel(5L) && !afterDel(17L) && !afterDel(42L))

    // sequence rule: a re-insert AFTER the delete is not affected by it
    t.append(Seq((17L, "lang_x", 999)).toDF("doc_id", "lang", "toks")) // seq 3
    val afterRe = t.read(spark)
    assert(afterRe.count() == 98)
    assert(afterRe.filter($"doc_id" === 17L).select("toks").as[Int].head == 999)
    // and the pre-delete snapshot still shows the original row (time travel)
    assert(t.readAt(spark, 1L).filter($"doc_id" === 17L).select("toks").as[Int].head == 170)
  }

  test("upsert: one commit replaces matching keys and inserts the rest, moving only the new bytes") {
    val t = fresh("snap_upsert")
    t.writeOverwrite(docs(0, 100))
    val m1 = t.manifest(spark, 1L).get
    // modify 10, 11 (new toks) and insert 200, 201 — one commit
    val up = Seq((10L, "lang_x", -1), (11L, "lang_x", -2),
                 (200L, "lang_x", 2000), (201L, "lang_x", 2010))
      .toDF("doc_id", "lang", "toks")
    val s = t.upsert(up, Seq("doc_id"))
    assert(s == 2L && t.snapshots(spark) == Seq(1L, 2L))
    val cur = t.read(spark)
    assert(cur.count() == 102)
    assert(cur.filter($"doc_id" === 10L).select("toks").as[Int].head() == -1)
    assert(cur.filter($"doc_id" === 200L).count() == 1)
    assert(cur.filter($"doc_id" === 50L).select("toks").as[Int].head() == 500) // untouched key intact
    // metadata-only against existing data: snapshot-1 files re-listed verbatim
    val m2 = t.manifest(spark, 2L).get
    assert(m1.data.map(_.path).toSet.subsetOf(m2.data.map(_.path).toSet))
    assert(m2.deletes.exists(d => d.seq == 2L && d.keys == Seq("doc_id")))
    // CDC view of the upsert: its keys as deletes, its rows as appends, one seq
    assert(t.deletedKeysBetween(spark, 1L, 2L, Seq("doc_id")).as[Long].collect().sorted
           sameElements Array(10L, 11L, 200L, 201L))
    assert(t.readAppendsBetween(spark, 1L, 2L).count() == 4)
    // a later upsert of an upserted key still wins (sequence rule chains)
    t.upsert(Seq((10L, "lang_y", -7)).toDF("doc_id", "lang", "toks"), Seq("doc_id"))
    assert(t.read(spark).filter($"doc_id" === 10L).select("toks").as[Int].head() == -7)
    assert(t.read(spark).count() == 102)
  }

  test("rewriteDataFiles materializes merge-on-read state and clears the delete list") {
    val t = fresh("snap_rw")
    t.writeOverwrite(docs(0, 200))
    t.deleteWhereKeys(docs(0, 200).filter($"doc_id" % 4 === 0).select("doc_id"), Seq("doc_id"))
    t.append(docs(200, 220))
    val expect = t.read(spark).orderBy("doc_id").collect().toSeq
    val s = t.rewriteDataFiles(spark)
    val m = t.manifest(spark, s).get
    assert(m.deletes.isEmpty, "compaction must merge equality deletes away")
    assert(t.read(spark).orderBy("doc_id").collect().toSeq == expect)
    // pre-compaction snapshots remain time-travelable until expired
    assert(t.readAt(spark, 1L).count() == 200)
  }

  test("readRange prunes files by footer min/max stats, row-exact") {
    val t = fresh("snap_prune")
    // range-cluster so files carry disjoint doc_id ranges (Iceberg's
    // hidden-partitioning effect: clustered writes → tight per-file stats)
    t.writeOverwrite(docs(0, 10000).repartitionByRange(8, col("doc_id")))
    val pr = t.readRange(spark, "doc_id", Some(2000L), Some(2999L))
    assert(pr.filesTotal >= 8, s"expected >=8 data files, got ${pr.filesTotal}")
    assert(pr.filesScanned < pr.filesTotal,
      s"prune did not bite: ${pr.filesScanned}/${pr.filesTotal}")
    val got = pr.df.select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == (2000L to 2999L).toSeq)
    // string column pruning works off UTF-8 binary stats too
    val prS = t.readRange(spark, "lang", Some("lang_2"), Some("lang_2"))
    assert(prS.df.count() == t.read(spark).filter($"lang" === "lang_2").count())
  }

  test("deleteWhere's victim scan prunes data files by manifest stats") {
    val t = fresh("snap_delprune")
    t.writeOverwrite(docs(0, 10000).repartitionByRange(8, col("doc_id")))
    val (seq, n) = t.deleteWhere(spark, col("doc_id").between(2000, 2999))
    assert(seq.isDefined && n == 1000)
    // the pushed-down predicate reached the SnapshotFileIndex: only the
    // files overlapping [2000, 2999] were ever opened to find victims
    assert(t.lastVictimScanListed > 0 && t.lastVictimScanListed < 8,
      s"victim scan listed ${t.lastVictimScanListed} of >=8 files")
    val left = t.read(spark).select("doc_id").as[Long].collect().sorted.toSeq
    assert(left == ((0L until 2000L) ++ (3000L until 10000L)).toSeq)
  }

  test("snapshot isolation: a torn manifest is invisible to readers and stepped over by committers") {
    val t = fresh("snap_torn")
    t.writeOverwrite(docs(0, 60)) // seq 1
    // simulate a committer that claimed seq 2 and died mid-stream
    val fs = new Path(t.location).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val torn = new Path(s"${t.location}/meta/snap-2.json")
    val out = fs.create(torn, false)
    out.write("{\"snapshot\": 2, \"parent\": 1, \"opera".getBytes("UTF-8"))
    out.close()

    // readers: current is still snapshot 1, fully readable
    assert(t.currentSnapshot(spark).contains(1L))
    assert(t.read(spark).count() == 60)
    // committers: the burned sequence is skipped, parent is the last VALID
    val s = t.append(docs(60, 70))
    assert(s == 3L)
    val m = t.manifest(spark, 3L).get
    assert(m.parent == 1L)
    assert(t.read(spark).count() == 70)
  }

  test("expireSnapshots drops old manifests and unreferenced/orphan files, keeps current") {
    val t = fresh("snap_expire")
    t.writeOverwrite(docs(0, 100))     // seq 1
    t.writeOverwrite(docs(0, 30))      // seq 2 — seq-1 files now unreferenced by current
    t.append(docs(30, 40))             // seq 3
    // orphan from a crashed staging write: a data dir no manifest references
    val fs = new Path(t.location).getFileSystem(spark.sparkContext.hadoopConfiguration)
    docs(0, 5).write.mode("overwrite").parquet(s"${t.location}/data/orphan-dead")

    val (kept, removed) = t.expireSnapshots(spark, keepLast = 2)
    assert(kept == 2 && removed > 0)
    assert(t.snapshots(spark) == Seq(2L, 3L))
    assert(t.read(spark).count() == 40)
    assert(t.readAt(spark, 2L).count() == 30)
    assert(!fs.exists(new Path(s"${t.location}/data/orphan-dead")))
    intercept[IllegalArgumentException](t.readAt(spark, 1L))
    // every remaining data file is referenced by a kept manifest
    val referenced = Seq(2L, 3L).flatMap(s => t.manifest(spark, s).get.data.map(_.path)).toSet
    val onDisk = fs.listStatus(new Path(s"${t.location}/data")).flatMap(d =>
      fs.listStatus(d.getPath).filter(_.getPath.getName.endsWith(".parquet"))
        .map(f => s"data/${d.getPath.getName}/${f.getPath.getName}")).toSet
    assert(onDisk == referenced)
  }

  test("incremental append scan: exactly the rows committed in (from, to], deletes not applied") {
    val t = fresh("snap_incr")
    t.writeOverwrite(docs(0, 50))                                        // seq 1 (create)
    t.append(docs(50, 70))                                               // seq 2
    t.deleteWhereKeys(Seq(3L, 55L).toDF("doc_id"), Seq("doc_id"))        // seq 3
    t.append(docs(70, 80))                                               // seq 4

    // since the creating overwrite: both appended batches, and the deleted
    // key 55 still PRESENT (append scan surfaces inserts only — Iceberg's
    // incremental read semantics; deletes travel separately below)
    val inc = t.readAppendsBetween(spark, 1L, 4L).select("doc_id").as[Long].collect().toSet
    assert(inc == (50L until 80L).toSet)
    // a narrower window sees only its own batch
    assert(t.readAppendsBetween(spark, 2L, 4L).select("doc_id").as[Long].collect().toSet
      == (70L until 80L).toSet)
    // the delete-only window appends nothing
    assert(t.readAppendsBetween(spark, 2L, 3L).count() == 0)

    // the delete half of the CDC feed
    val delKeys = t.deletedKeysBetween(spark, 1L, 4L, Seq("doc_id")).as[Long].collect().toSet
    assert(delKeys == Set(3L, 55L))
    // empty range still returns the right shape, typed from the table schema
    val none = t.deletedKeysBetween(spark, 3L, 4L, Seq("doc_id"))
    assert(none.count() == 0 && none.schema.fieldNames.toSeq == Seq("doc_id"))
  }

  test("incremental scan refuses to cross an overwrite; re-anchors at it") {
    val t = fresh("snap_incr_ow")
    t.writeOverwrite(docs(0, 30))   // seq 1
    t.append(docs(30, 40))          // seq 2
    t.rewriteDataFiles(spark)       // seq 3 — an overwrite commit
    t.append(docs(40, 45))          // seq 4
    intercept[IllegalArgumentException](t.readAppendsBetween(spark, 1L, 4L))
    // consumers re-anchor at the rewrite snapshot and continue
    assert(t.readAppendsBetween(spark, 3L, 4L).select("doc_id").as[Long].collect().toSet
      == (40L until 45L).toSet)
    // nonsense ranges are refused
    intercept[IllegalArgumentException](t.readAppendsBetween(spark, 99L, 4L))
  }

  test("appendOnce: duplicate markers are metadata no-ops — the exactly-once seam") {
    val t = fresh("snap_once")
    assert(t.appendOnce(docs(0, 10), "q#0").contains(1L))
    assert(t.appendOnce(docs(10, 20), "q#1").contains(2L))
    // replayed batch: fast-path no-op, no new snapshot, rows unchanged
    assert(t.appendOnce(docs(10, 20), "q#1").isEmpty)
    assert(t.snapshots(spark) == Seq(1L, 2L))
    assert(t.read(spark).count() == 20)
    assert(t.committedMarkers(spark) == Set("q#0", "q#1"))
    // a second query id sharing the table namespaces independently
    assert(t.appendOnce(docs(20, 25), "r#1").contains(3L))
    assert(t.read(spark).count() == 25)
    // markers survive in manifests, and the manifest records them
    assert(t.manifest(spark, 3L).get.marker.contains("r#1"))
  }

  test("zValue interleaves bits; z-order rewrite prunes on BOTH dimensions") {
    import graft.io.ZOrder
    // bit-exact spot checks: a-bits land even, b-bits odd
    val z = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (63L, 63L))
      .toDF("a", "b").select(ZOrder.zValue(col("a"), col("b"))).as[Long].collect().toSeq
    assert(z == Seq(0L, 1L, 2L, 39L, 4095L))

    // 64×64 grid; rows arrive z-hostile (ordered by x then y)
    val grid = spark.range(0, 4096).select(
      (col("id") % 64).as("x"), expr("id div 64").as("y"))
    val lin = fresh("snap_lin"); val zt = fresh("snap_zord")
    lin.writeOverwrite(grid); zt.writeOverwrite(grid)
    lin.rewriteDataFiles(spark, targetBytes = 400, sortBy = Seq("x", "y"))
    zt.rewriteDataFilesZOrder(spark, "x", "y", targetBytes = 400)

    val want = (0L until 4096L).filter(i => i / 64 >= 8 && i / 64 <= 15)
      .map(i => (i % 64, i / 64)).toSet
    val zPrune = zt.readRange(spark, "y", Some(8L), Some(15L))
    val lPrune = lin.readRange(spark, "y", Some(8L), Some(15L))
    // row-exact on both layouts
    assert(zPrune.df.select("x", "y").as[(Long, Long)].collect().toSet == want)
    assert(lPrune.df.select("x", "y").as[(Long, Long)].collect().toSet == want)
    // linear (x,y) sort gives y NO locality — every file spans the full y
    // range; the z-curve keeps files square-ish so the y-scan prunes hard
    assert(zPrune.filesTotal >= 8)
    assert(lPrune.filesScanned == lPrune.filesTotal,
      s"unexpected linear-layout y prune: ${lPrune.filesScanned}/${lPrune.filesTotal}")
    assert(zPrune.filesScanned * 2 <= zPrune.filesTotal,
      s"z-order y prune too weak: ${zPrune.filesScanned}/${zPrune.filesTotal}")
    // and x-pruning still bites on the z layout too
    val zx = zt.readRange(spark, "x", Some(0L), Some(7L))
    assert(zx.filesScanned < zx.filesTotal)
    assert(zx.df.count() == 8 * 64)
  }

  test("schema evolution: appends add nullable columns, old files read NULL, type change refused") {
    val t = fresh("snap_evo")
    t.writeOverwrite(docs(0, 10).select("doc_id", "lang"))   // 2-column table
    t.append(docs(10, 15))                                   // introduces toks
    val cur = t.read(spark)
    assert(cur.schema.fieldNames.toSeq == Seq("doc_id", "lang", "toks"))
    assert(cur.filter($"doc_id" < 10 && $"toks".isNull).count() == 10)
    assert(cur.filter($"doc_id" >= 10 && $"toks".isNotNull).count() == 5)
    // an append that OMITS a column: its new files read NULL for it
    t.append(docs(15, 18).select("doc_id", "toks"))
    val cur2 = t.read(spark)
    assert(cur2.count() == 18)
    assert(cur2.filter($"doc_id" >= 15 && $"lang".isNull).count() == 3)
    // time travel keeps each snapshot's own schema
    assert(t.readAt(spark, 1L).schema.fieldNames.toSeq == Seq("doc_id", "lang"))
    // silent type promotion is refused
    intercept[IllegalArgumentException](
      t.append(docs(18, 19).withColumn("toks", lit("oops"))))
    assert(t.read(spark).count() == 18, "refused append must not commit")
  }

  test("empty table and misuse guards") {
    val t = fresh("snap_guard")
    intercept[IllegalStateException](t.read(spark))
    intercept[IllegalStateException](t.deleteWhereKeys(Seq(1L).toDF("doc_id"), Seq("doc_id")))
    t.writeOverwrite(docs(0, 3))
    intercept[IllegalArgumentException](t.readAt(spark, 99L))
  }

  test("position deletes: predicate kills physical rows; a re-append of the key survives") {
    val t = fresh("snap_posdel")
    t.writeOverwrite(docs(0, 100).repartition(4)) // multi-file so (file,pos) matters
    val (seq, n) = t.deleteWhere(spark, $"toks" >= 100 && $"toks" < 300) // doc_id 10..29
    assert(seq.contains(2L) && n == 20)
    assert(t.read(spark).count() == 80)
    assert(t.read(spark).filter($"doc_id" >= 10 && $"doc_id" < 30).count() == 0)
    // commit was metadata-only for data: no data file rewritten
    val m1 = t.manifest(spark, 1L).get; val m2 = t.manifest(spark, 2L).get
    assert(m2.data.map(_.path) == m1.data.map(_.path))
    assert(m2.posDeletes.map(_.rows).sum == 20)
    // file-scoped, NOT key-scoped: re-appending the same doc_ids is visible
    // without any sequence bookkeeping (the new rows live in new files)
    t.append(docs(10, 30))
    assert(t.read(spark).count() == 100)
    assert(t.read(spark).filter($"doc_id" === 15).count() == 1)
    // time travel: snapshot 1 still has all 100, snapshot 2 has 80
    assert(t.readAt(spark, 1L).count() == 100)
    assert(t.readAt(spark, 2L).count() == 80)
    // composes with an equality delete on top
    t.deleteWhereKeys(Seq(50L, 15L).toDF("doc_id"), Seq("doc_id"))
    assert(t.read(spark).count() == 98)
    // nothing-matches → no commit at all
    val before = t.currentSnapshot(spark)
    assert(t.deleteWhere(spark, $"toks" === -1) == ((None, 0L)))
    assert(t.currentSnapshot(spark) == before)
  }

  test("rollback: metadata-only restore of an earlier snapshot; incremental scans refuse to cross") {
    val t = fresh("snap_rollback")
    t.writeOverwrite(docs(0, 50))                       // 1
    t.append(docs(50, 70))                              // 2
    t.deleteWhereKeys(Seq(3L).toDF("doc_id"), Seq("doc_id")) // 3
    assert(t.read(spark).count() == 69)
    val rb = t.rollbackTo(spark, 1L)                    // 4
    assert(rb == 4L)
    // current state ≡ snapshot 1, bad history still time-travelable
    assert(t.read(spark).count() == 50)
    assert(t.readAt(spark, 3L).count() == 69)
    // metadata-only: snapshot 4 re-lists snapshot 1's files verbatim
    assert(t.manifest(spark, 4L).get.data.map(_.path) ==
           t.manifest(spark, 1L).get.data.map(_.path))
    // appends continue from the restored state
    t.append(docs(100, 110))                            // 5
    assert(t.read(spark).count() == 60)
    // a consumer anchored before the rollback must re-anchor
    intercept[IllegalArgumentException](t.readAppendsBetween(spark, 2L, 5L))
    // anchored AT the rollback is fine: sees only the post-rollback append
    assert(t.readAppendsBetween(spark, 4L, 5L).count() == 10)
  }

  test("tags pin snapshots across expiry (Iceberg refs)") {
    val t = fresh("snap_tags")
    t.writeOverwrite(docs(0, 30))        // 1
    t.createTag(spark, "release-1", 1L)
    t.writeOverwrite(docs(0, 40))        // 2
    t.writeOverwrite(docs(0, 50))        // 3
    assert(t.tags(spark) == Map("release-1" -> 1L))
    assert(t.readTag(spark, "release-1").count() == 30)
    intercept[IllegalStateException](t.createTag(spark, "release-1", 2L))
    // expiry keeps the tagged snapshot 1 and its files; snapshot 2 goes
    val (kept, removed) = t.expireSnapshots(spark, keepLast = 1)
    assert(kept == 2 && removed > 0)
    assert(t.snapshots(spark) == Seq(1L, 3L))
    assert(t.readTag(spark, "release-1").count() == 30, "tagged data must survive expiry")
    assert(t.read(spark).count() == 50)
    // dropping the tag releases the pin
    t.dropTag(spark, "release-1")
    t.expireSnapshots(spark, keepLast = 1)
    assert(t.snapshots(spark) == Seq(3L))
  }
}
