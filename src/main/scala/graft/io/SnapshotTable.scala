package graft.io

import java.util.UUID

import scala.annotation.tailrec
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Snapshot-based table format over parquet — the sandbox stand-in for the
  * Iceberg tables the north rule mandates (SURVEY.md §7.4: no Iceberg runtime
  * jar exists on this machine, so the format's SEMANTICS are implemented here
  * and the TableIO seam stays the one-file swap).
  *
  * Layout (all paths inside a manifest are RELATIVE — the table relocates):
  * {{{
  *   <root>/<name>/data/<uuid>/part-*.parquet      write-once data files
  *   <root>/<name>/deletes/<uuid>/part-*.parquet   equality-delete key files
  *   <root>/<name>/meta/snap-<seq>.json            one manifest per snapshot
  * }}}
  *
  * A snapshot's manifest lists every live data file with its row count,
  * byte size and per-column min/max/null-count statistics (harvested from
  * the parquet FOOTERS of the newly staged files only — a metadata read,
  * never a data scan), plus the list of equality-delete files in force.
  *
  * Commit protocol (Iceberg's optimistic model): data/delete files are
  * staged first under a fresh uuid directory; the commit then claims the
  * next sequence number by exclusive-create of `meta/snap-<seq>.json` and
  * streams the manifest into it. A claim collision (concurrent committer)
  * retries at the next sequence; a crash mid-stream leaves a torn manifest
  * that readers skip (current = highest PARSEABLE manifest) and committers
  * step over, so every crash point leaves the previous snapshot fully
  * readable — snapshot isolation without a rename-no-replace primitive.
  * Note the residual race Iceberg delegates to an atomic-CAS catalog:
  * two committers that both observed parent P and claim DIFFERENT
  * sequences serialize here by polling the pending predecessor manifest
  * (`settleParent`); a writer that dies mid-stream is declared dead after
  * the poll window and its sequence is skipped. Single-writer-per-table
  * workloads (this engine's checkpoint/delta runs) never hit the window.
  *
  * What this buys at 100 TB, measured in SnapshotDeltaBench / asserted in
  * SnapshotTableSpec:
  *  - append / delete commits move only the CHANGED bytes (the manifest
  *    re-lists existing files — a metadata-only commit), vs the full-table
  *    rewrite a directory-swap parquet table needs;
  *  - equality deletes give merge-on-read semantics with Iceberg's
  *    sequence-number rule: a delete applies only to data files COMMITTED
  *    BEFORE it, so re-inserting a deleted key later is visible;
  *  - per-column min/max file skipping ([[readRange]]) prunes files the
  *    way Iceberg manifests + hidden partitioning do — range-clustered
  *    writes make any filtered scan touch only overlapping files;
  *  - [[readAt]] time travel over retained snapshots; [[rewriteDataFiles]]
  *    is `rewrite_data_files` (compaction + delete merge);
  *    [[expireSnapshots]] is `expire_snapshots` + orphan-file removal.
  */
final class SnapshotTable(val root: String, val name: String) extends Serializable {
  import SnapshotTable._

  /** Data files the last [[deleteWhere]] victim scan actually listed
    * (manifest-stats prune observability for tests/benches; -1 before any
    * call). */
  @transient @volatile var lastVictimScanListed: Int = -1

  def location: String = s"$root/$name"
  private def metaDir = s"$location/meta"

  private def fs(spark: SparkSession): FileSystem =
    new Path(location).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def conf(spark: SparkSession): Configuration =
    spark.sparkContext.hadoopConfiguration
  /** Scheme-stripped absolute path of a manifest-relative file — the join
    * key against `input_file_name()` when rows must know their data seq. */
  private def absPath(f: FileSystem, rel: String): String =
    f.makeQualified(new Path(s"$location/$rel")).toUri.getPath

  // ---------------------------------------------------------------- reads

  /** Sequence ids of all committed (parseable) snapshots, ascending. */
  def snapshots(spark: SparkSession): Seq[Long] = {
    val f = fs(spark)
    listManifestSeqs(f, metaDir).filter(s => readManifest(f, metaDir, s).isDefined)
  }

  def currentSnapshot(spark: SparkSession): Option[Long] =
    snapshots(spark).lastOption

  /** Snapshot metadata (file list, stats, deletes in force) — the Iceberg
    * `snapshots`/`files` metadata-table equivalent. */
  def manifest(spark: SparkSession, seq: Long): Option[Manifest] =
    readManifest(fs(spark), metaDir, seq)

  def exists(spark: SparkSession): Boolean = currentSnapshot(spark).isDefined

  /** Current table state (merge-on-read: equality deletes applied). */
  def read(spark: SparkSession): DataFrame =
    readAt(spark, currentSnapshot(spark).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $location")))

  /** Time travel: the table exactly as of snapshot `seq`. */
  def readAt(spark: SparkSession, seq: Long): DataFrame = {
    val f = fs(spark)
    val m = readManifest(f, metaDir, seq).getOrElse(
      throw new IllegalArgumentException(s"no snapshot $seq in $location"))
    readFromManifest(spark, f, m, m.data)
  }

  /** The table as a CATALYST-INTEGRATED relation (the Delta/Iceberg
    * integration shape): the scan's file listing is a [[SnapshotFileIndex]]
    * over this snapshot's manifest, so ANY filter Catalyst pushes toward the
    * scan — `.filter(...)`, a `WHERE` through a temp view — prunes data
    * files by manifest min/max stats automatically, at plan time, with no
    * explicit [[readRange]] call and no filesystem listing. Equality deletes
    * are applied on top (merge-on-read), same as [[read]]; row-level results
    * are identical to [[read]] by construction (asserted in
    * SnapshotFileIndexSpec). Returns the frame plus the index so callers
    * can assert how hard the prune bit. */
  def readIndexed(spark: SparkSession): IndexedRead =
    readIndexedAt(spark, currentSnapshot(spark).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $location")))

  def readIndexedAt(spark: SparkSession, seq: Long): IndexedRead = {
    val f = fs(spark)
    val m = readManifest(f, metaDir, seq).getOrElse(
      throw new IllegalArgumentException(s"no snapshot $seq in $location"))
    val schema = StructType.fromDDL(m.schema)
    if (m.data.isEmpty)
      return IndexedRead(
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
        new SnapshotFileIndex(spark, location, Nil, schema))
    val (base, index) = indexedBase(spark, m, schema)
    IndexedRead(applyDeletes(spark, f, m, m.data, base), index)
  }

  /** A scan of `m`'s data files whose file listing is a [[SnapshotFileIndex]]
    * — filters Catalyst pushes toward the scan prune files by manifest
    * min/max stats at plan time (shared by [[readIndexedAt]] and the
    * victim-finding scan of [[deleteWhere]]). */
  private def indexedBase(spark: SparkSession, m: Manifest,
                          schema: StructType): (DataFrame, SnapshotFileIndex) = {
    val index = new SnapshotFileIndex(spark, location, m.data, schema)
    val relation = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      index, new StructType(), schema, None,
      new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat(),
      Map.empty[String, String])(spark)
    (spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .baseRelationToDataFrame(relation), index)
  }

  /** Stats-pruned range scan on one column: files whose [min,max] cannot
    * intersect [lower,upper] are never opened (bounds are inclusive; a
    * missing bound is unbounded). Row-exact: the residual range filter is
    * re-applied after the file-level prune, so overlap files contribute
    * only in-range rows. Returns the scanned/total file counts so callers
    * (tests, benches) can assert the prune actually bit. */
  def readRange(spark: SparkSession, column: String,
                lower: Option[Any], upper: Option[Any]): PrunedRead = {
    val f = fs(spark)
    val m = readManifest(f, metaDir, currentSnapshot(spark).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $location"))).get
    val survivors = m.data.filter { e =>
      e.stats.get(column) match {
        case Some(cs) =>
          upper.forall(u => cmpStat(cs.tpe, cs.min, u) <= 0) &&
          lower.forall(l => cmpStat(cs.tpe, cs.max, l) >= 0)
        case None => true // no stats recorded — never prune what we can't judge
      }
    }
    val base = readFromManifest(spark, f, m, survivors)
    val c = col(column)
    val ranged = (lower, upper) match {
      case (Some(l), Some(u)) => base.filter(c >= lit(l) && c <= lit(u))
      case (Some(l), None)    => base.filter(c >= lit(l))
      case (None, Some(u))    => base.filter(c <= lit(u))
      case (None, None)       => base
    }
    PrunedRead(ranged, survivors.size, m.data.size)
  }

  /** Incremental APPEND scan — Iceberg's incremental read: exactly the rows
    * whose data files were committed in the snapshot range `(fromSeq, toSeq]`.
    * This is the changed-data feed the delta pipelines want: a consumer
    * remembers the last snapshot it processed and reads only what landed
    * since — a metadata-only file selection, never a diff of two full scans.
    *
    * Semantics match Iceberg's incremental append scan: equality deletes are
    * NOT applied (they are surfaced separately by [[deletedKeysBetween]]),
    * and the range must not cross an `overwrite` commit (a replace breaks
    * the file-seq ↔ row-lineage correspondence — same restriction Iceberg
    * enforces). `fromSeq` itself may be any committed snapshot — an
    * overwrite AT `fromSeq` is fine (scan "since the rewrite"); `fromSeq=0`
    * is valid only for a table whose whole history is appends. */
  def readAppendsBetween(spark: SparkSession, fromSeq: Long, toSeq: Long): DataFrame = {
    require(fromSeq >= 0 && toSeq > fromSeq, s"need 0 <= fromSeq < toSeq, got ($fromSeq, $toSeq]")
    val f = fs(spark)
    val m = readManifest(f, metaDir, toSeq).getOrElse(
      throw new IllegalArgumentException(s"no snapshot $toSeq in $location"))
    // walk the parent chain down to fromSeq: every commit strictly inside
    // the range must be append-lineage (append / delete / noop)
    var cur = m
    while (cur.snapshot > fromSeq) {
      require(!Set("overwrite", "rollback").contains(cur.operation) || cur.snapshot == fromSeq,
        s"incremental scan ($fromSeq, $toSeq] crosses ${cur.operation} at snapshot ${cur.snapshot} of $location")
      if (cur.parent < fromSeq)
        throw new IllegalArgumentException(
          s"snapshot $fromSeq is not an ancestor of $toSeq in $location")
      if (cur.parent == fromSeq || cur.parent == 0) cur = cur.copy(snapshot = fromSeq)
      else cur = readManifest(f, metaDir, cur.parent).getOrElse(
        throw new IllegalStateException(s"ancestor manifest ${cur.parent} missing in $location"))
    }
    val entries = m.data.filter(e => e.seq > fromSeq && e.seq <= toSeq)
    readFromManifest(spark, f, m.copy(deletes = Nil, posDeletes = Nil), entries)
  }

  /** The equality-delete keys committed in `(fromSeq, toSeq]` whose key
    * columns are exactly `keyCols` — the delete half of a CDC feed (pair
    * with [[readAppendsBetween]]). Distinct keys; typed from the table
    * schema, so an empty range still returns the right shape. */
  def deletedKeysBetween(spark: SparkSession, fromSeq: Long, toSeq: Long,
                         keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "deletedKeysBetween needs key columns")
    val f = fs(spark)
    val m = readManifest(f, metaDir, toSeq).getOrElse(
      throw new IllegalArgumentException(s"no snapshot $toSeq in $location"))
    val dels = m.deletes.filter(d =>
      d.seq > fromSeq && d.seq <= toSeq && d.keys == keyCols)
    if (dels.isEmpty) {
      val schema = StructType(StructType.fromDDL(m.schema).fields.filter(f2 => keyCols.contains(f2.name)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else
      dels.map(d => spark.read.parquet(s"$location/${d.path}").select(keyCols.map(col): _*))
        .reduce(_ unionByName _).distinct()
  }

  /** Marker-idempotent append — the exactly-once streaming commit: if any
    * retained snapshot already carries `marker` (e.g. `"<queryId>#<batchId>"`
    * from a Structured Streaming `foreachBatch` sink), the call is a no-op
    * and returns None; otherwise the rows are append-committed with the
    * marker recorded in the manifest, as Iceberg stores the checkpointed
    * batch id in its snapshot summary. The replay check runs twice: before
    * staging (cheap fast path) and again INSIDE the claimed commit, so a
    * retry racing a writer that died after its commit never double-appends —
    * the loser publishes a metadata-only no-op re-listing its parent (its
    * orphaned staging files are swept by [[expireSnapshots]]). Markers
    * expire with their snapshots: retain at least the source's replay
    * horizon (Structured Streaming replays only the LAST unacknowledged
    * batch, so any retention >= 2 commits per active query suffices). */
  def appendOnce(df: DataFrame, marker: String): Option[Long] = {
    require(marker.nonEmpty, "appendOnce needs a non-empty marker")
    val spark = df.sparkSession
    if (committedMarkers(spark).contains(marker)) return None
    val staged = stage(df, "data")
    var replayed = false
    val seq = commit(spark, "append") { (parent, seq) =>
      if (committedMarkers(spark).contains(marker)) {
        replayed = true
        val p = parent.getOrElse(throw new IllegalStateException(
          s"marker $marker committed but no parent manifest in $location"))
        // metadata-only no-op, marker NOT re-recorded
        CommitParts(p.data, p.deletes, p.posDeletes, p.schema, None)
      } else {
        val schema = parent match {
          case Some(p) => evolveSchema(StructType.fromDDL(p.schema), df.schema).toDDL
          case None    => df.schema.toDDL
        }
        CommitParts(parent.map(_.data).getOrElse(Nil) ++ staged.map(_.at(seq)),
          parent.map(_.deletes).getOrElse(Nil),
          parent.map(_.posDeletes).getOrElse(Nil), schema, Some(marker))
      }
    }
    if (replayed) None else Some(seq)
  }

  /** Markers of all committed (retained) snapshots. */
  def committedMarkers(spark: SparkSession): Set[String] = {
    val f = fs(spark)
    listManifestSeqs(f, metaDir)
      .flatMap(s => readManifest(f, metaDir, s)).flatMap(_.marker).toSet
  }

  /** Data files + deletes of a manifest subset as a DataFrame. The
    * sequence rule: an equality delete drops a matching row only from data
    * files with a STRICTLY SMALLER commit sequence (Iceberg v2 semantics) —
    * rows appended after the delete survive it. Rows learn their data seq
    * from a broadcast (file path → seq) map; with no deletes in force the
    * plan is a bare multi-file scan. */
  private def readFromManifest(spark: SparkSession, f: FileSystem,
                               m: Manifest, entries: Seq[DataFileEntry]): DataFrame = {
    val schema = StructType.fromDDL(m.schema)
    if (entries.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val df = spark.read.schema(schema).parquet(entries.map(e => s"$location/${e.path}"): _*)
    applyDeletes(spark, f, m, entries, df)
  }

  /** Merge-on-read over an already-built scan of `entries`. */
  private def applyDeletes(spark: SparkSession, f: FileSystem, m: Manifest,
                           entries: Seq[DataFileEntry], df: DataFrame): DataFrame = {
    if (m.deletes.isEmpty && m.posDeletes.isEmpty) return df
    taggedWithDeletes(spark, f, m, entries, df).drop(FileCol, RelCol, DataSeqCol, PosCol)
  }

  /** The merge-on-read scan WITH its bookkeeping columns still attached
    * (manifest-relative file path + in-file row ordinal) — the shape
    * [[deleteWhere]] needs to name victim rows. */
  private def taggedWithDeletes(spark: SparkSession, f: FileSystem, m: Manifest,
                                entries: Seq[DataFileEntry], df: DataFrame): DataFrame = {
    val pathSeq = spark.createDataFrame(entries.map(e => (absPath(f, e.path), e.path, e.seq)))
      .toDF(FileCol, RelCol, DataSeqCol)
    // rows learn their file from the DETERMINISTIC `_metadata.file_path`
    // column (not input_file_name(), whose nondeterminism would fence off
    // predicate pushdown below this projection — the indexed read's file
    // skipping depends on filters reaching the scan); `_metadata.row_index`
    // is the row's ordinal within its parquet file — the position-delete key
    val tagged = df
      .withColumn(FileCol, regexp_replace(col("_metadata.file_path"), "^[a-z0-9+.-]+:/+", "/"))
      .withColumn(PosCol, col("_metadata.row_index"))
      .join(broadcast(pathSeq), FileCol)
    val eqDone = m.deletes.groupBy(_.keys).foldLeft(tagged) { case (acc, (keys, dels)) =>
      val delKeys = dels.map { d =>
        spark.read.parquet(s"$location/${d.path}")
          .select(keys.map(col): _*).withColumn(DelSeqCol, lit(d.seq))
      }.reduce(_ unionByName _)
      val keyEq = keys.map(k => acc(k) === delKeys(k)).reduce(_ && _)
      // delete sets are churn-sized by design (bulk removal should use
      // rewriteDataFiles) — broadcast keeps merge-on-read a zero-exchange
      // residual-condition hash anti join
      acc.join(broadcast(delKeys), keyEq && delKeys(DelSeqCol) > acc(DataSeqCol), "left_anti")
    }
    if (m.posDeletes.isEmpty) eqDone
    else {
      // position deletes name (file, ordinal) directly — file-scoped, so no
      // sequence comparison: the row they point at is dead in every snapshot
      // that lists both the file and the delete (Iceberg v2 position deletes)
      val posKeys = m.posDeletes.map(d => spark.read.parquet(s"$location/${d.path}"))
        .reduce(_ unionByName _)
      eqDone.join(broadcast(posKeys),
        eqDone(RelCol) === posKeys(PosDelFileCol) && eqDone(PosCol) === posKeys(PosDelPosCol),
        "left_anti")
    }
  }

  // -------------------------------------------------------------- commits

  /** Replace the table contents (previous snapshots stay time-travelable
    * until expired). Returns the committed snapshot id. */
  def writeOverwrite(df: DataFrame): Long = {
    val staged = stage(df, "data")
    commit(df.sparkSession, "overwrite") { (_, seq) =>
      CommitParts(staged.map(_.at(seq)), Nil, Nil, df.schema.toDDL, None)
    }
  }

  /** Metadata-only append: existing data files are RE-LISTED, only the new
    * rows hit the disk. Schema EVOLVES by union (Iceberg add-column
    * semantics): columns the append introduces are appended to the table
    * schema as nullable — prior files read them as NULL; columns the append
    * omits become nullable and read NULL from the new files; a same-name
    * type change is refused (no silent promotion). Time travel keeps each
    * snapshot's own schema. */
  def append(df: DataFrame): Long = {
    val staged = stage(df, "data")
    commit(df.sparkSession, "append") { (parent, seq) =>
      val schema = parent match {
        case Some(p) => evolveSchema(StructType.fromDDL(p.schema), df.schema).toDDL
        case None    => df.schema.toDDL
      }
      CommitParts(parent.map(_.data).getOrElse(Nil) ++ staged.map(_.at(seq)),
        parent.map(_.deletes).getOrElse(Nil),
        parent.map(_.posDeletes).getOrElse(Nil), schema, None)
    }
  }

  /** Equality delete: rows of PRIOR snapshots matching a key in `keysDf`
    * (distinct over `keyCols`) disappear from reads; later appends of the
    * same key are unaffected (sequence rule). The commit writes only the
    * (small) key set. */
  def deleteWhereKeys(keysDf: DataFrame, keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "equality delete needs at least one key column")
    val spark = keysDf.sparkSession
    val staged = stage(keysDf.select(keyCols.map(col): _*).distinct(), "deletes")
    commit(spark, "delete") { (parent, seq) =>
      val p = parent.getOrElse(
        throw new IllegalStateException(s"delete on empty table $location"))
      CommitParts(p.data,
        p.deletes ++ staged.map(s => DeleteFileEntry(s.rel, seq, keyCols, s.rows)),
        p.posDeletes, p.schema, None)
    }
  }

  /** Row-level POSITION delete (Iceberg v2's second delete kind): rows of the
    * CURRENT merge-on-read state matching `cond` are named by (data file,
    * in-file row ordinal) — `_metadata.row_index`, stable because data files
    * are write-once — and committed as position-delete files. Unlike an
    * equality delete this kills specific physical rows, so a later re-insert
    * of the same logical key is untouched without any sequence bookkeeping,
    * and the predicate may be arbitrary (no key columns needed). Finding the
    * victims costs one filtered scan (pushed-down predicate prunes files via
    * the manifest stats on an indexed read; Iceberg's MERGE pays the same
    * scan); the commit itself moves only the (file, pos) pairs.
    * Returns (snapshot, rows deleted); no commit at all if nothing matched. */
  def deleteWhere(spark: SparkSession, cond: org.apache.spark.sql.Column): (Option[Long], Long) = {
    val f = fs(spark)
    val m = readManifest(f, metaDir, currentSnapshot(spark).getOrElse(
      throw new IllegalStateException(s"deleteWhere on empty table $location"))).get
    val schema = StructType.fromDDL(m.schema)
    if (m.data.isEmpty) return (None, 0L)
    // victim scan goes through the SnapshotFileIndex relation so `cond`
    // (pushed below the tagging projections by Catalyst) prunes data files
    // by manifest stats before any byte is read
    val (scan, index) = indexedBase(spark, m, schema)
    val victims = taggedWithDeletes(spark, f, m, m.data, scan)
      .filter(cond)
      .select(col(RelCol).as(PosDelFileCol), col(PosCol).as(PosDelPosCol))
    val staged = stage(victims, "deletes")
    lastVictimScanListed = index.lastFilesListed
    val nRows = staged.map(_.rows).sum
    if (nRows == 0) return (None, 0L) // staged empty dir is swept by expireSnapshots
    val seq = commit(spark, "delete") { (parent, seq) =>
      val p = parent.getOrElse(
        throw new IllegalStateException(s"delete on empty table $location"))
      CommitParts(p.data, p.deletes,
        p.posDeletes ++ staged.map(s => PosDeleteFileEntry(s.rel, seq, s.rows)),
        p.schema, None)
    }
    (Some(seq), nRows)
  }

  /** Rollback — Iceberg's `rollback_to_snapshot`: a METADATA-ONLY commit
    * re-listing snapshot `seq`'s exact state (data, deletes, schema) as the
    * new current snapshot. History is preserved (the rolled-back snapshots
    * stay time-travelable until expired); no data moves. Incremental
    * consumers must re-anchor, so [[readAppendsBetween]] refuses to cross a
    * rollback the same way it refuses an overwrite. */
  def rollbackTo(spark: SparkSession, seq: Long): Long = {
    val f = fs(spark)
    val target = readManifest(f, metaDir, seq).getOrElse(
      throw new IllegalArgumentException(s"no snapshot $seq in $location"))
    commit(spark, "rollback") { (_, _) =>
      CommitParts(target.data, target.deletes, target.posDeletes, target.schema, None)
    }
  }

  // ----------------------------------------------------------------- refs

  /** Tag a snapshot with an immutable name (Iceberg refs): tagged snapshots
    * survive [[expireSnapshots]] regardless of `keepLast` — the audit/
    * reproducibility pin ("the corpus release we trained on"). Exclusive
    * create: retagging an existing name is refused (drop it first). */
  def createTag(spark: SparkSession, tagName: String, seq: Long): Unit = {
    require(tagName.matches("[A-Za-z0-9._-]+"), s"bad tag name: $tagName")
    val f = fs(spark)
    require(readManifest(f, metaDir, seq).isDefined, s"no snapshot $seq in $location")
    val out =
      try f.create(new Path(s"$metaDir/tag-$tagName.json"), false)
      catch { case _: java.io.IOException =>
        throw new IllegalStateException(s"tag $tagName already exists in $location") }
    val bytes = s"""{"name":"$tagName","snapshot":$seq}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    try out.write(bytes) finally out.close()
  }

  /** All tags → snapshot ids. */
  def tags(spark: SparkSession): Map[String, Long] = {
    val f = fs(spark)
    val dir = new Path(metaDir)
    if (!f.exists(dir)) return Map.empty
    f.listStatus(dir).toSeq.map(_.getPath.getName).collect {
      case TagName(n) =>
        val in = f.open(new Path(s"$metaDir/tag-$n.json"))
        val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        val j = JsonMethods.parse(text)
        n -> (j \ "snapshot").extract[Long]
    }.toMap
  }

  /** The table exactly as of tag `tagName`. */
  def readTag(spark: SparkSession, tagName: String): DataFrame =
    readAt(spark, tags(spark).getOrElse(tagName,
      throw new IllegalArgumentException(s"no tag $tagName in $location")))

  def dropTag(spark: SparkSession, tagName: String): Unit =
    fs(spark).delete(new Path(s"$metaDir/tag-$tagName.json"), false)

  /** Row-level MERGE (upsert) in ONE atomic commit: rows of `df` replace any
    * prior rows sharing their key and insert otherwise. Implemented as an
    * equality delete of `df`'s keys plus a data append CARRYING THE SAME
    * SEQUENCE — the v2 sequence rule (a delete drops only STRICTLY older
    * data) makes the new rows survive their own delete, so no read-modify-
    * write of existing files ever happens: the commit moves only `df`'s
    * bytes, exactly Iceberg's merge-on-read MERGE INTO. A crash between
    * nothing and everything: both halves live in one manifest. CDC consumers
    * see the upsert as (deleted keys, appended rows) at one sequence. */
  def upsert(df: DataFrame, keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "upsert needs key columns")
    val stagedData = stage(df, "data")
    val stagedDel  = stage(df.select(keyCols.map(col): _*).distinct(), "deletes")
    commit(df.sparkSession, "upsert") { (parent, seq) =>
      val p = parent.getOrElse(
        throw new IllegalStateException(s"upsert into empty table $location — writeOverwrite first"))
      CommitParts(p.data ++ stagedData.map(_.at(seq)),
        p.deletes ++ stagedDel.map(s => DeleteFileEntry(s.rel, seq, keyCols, s.rows)),
        p.posDeletes,
        evolveSchema(StructType.fromDDL(p.schema), df.schema).toDDL, None)
    }
  }

  /** Compaction — Iceberg's `rewrite_data_files`: materializes the current
    * merge-on-read state into ~targetBytes files (clustered by `sortBy` if
    * given, which re-tightens the min/max stats for [[readRange]]) and
    * commits it as an overwrite, clearing the delete list. Old snapshots
    * remain readable until [[expireSnapshots]]. */
  def rewriteDataFiles(spark: SparkSession, targetBytes: Long = 128L * 1024 * 1024,
                       sortBy: Seq[String] = Nil): Long = {
    val (cur, nFiles) = rewriteShape(spark, targetBytes)
    val shaped =
      if (sortBy.nonEmpty) cur.repartitionByRange(nFiles, sortBy.map(col): _*)
      else cur.coalesce(nFiles)
    writeOverwrite(shaped)
  }

  /** Z-order compaction — `rewrite_data_files` with `ZORDER BY (colA, colB)`:
    * rows are clustered along the Morton curve of the two columns
    * ([[ZOrder.zValue]]), so the per-file min/max stats stay tight on BOTH
    * dimensions and [[readRange]] prunes on either one. A linear
    * `sortBy(a, b)` gives `b` no locality at all; the z-curve gives each of
    * the two dimensions ~√nFiles-factor pruning (asserted in
    * SnapshotTableSpec, measured in SnapshotDeltaBench). The z value is
    * computed from codegen'd bitwise built-ins, used only as the
    * shuffle/sort key, and never written. */
  def rewriteDataFilesZOrder(spark: SparkSession, colA: String, colB: String,
                             targetBytes: Long = 128L * 1024 * 1024): Long = {
    val (cur, nFiles) = rewriteShape(spark, targetBytes)
    val z = "__graft_z"
    val shaped = cur.withColumn(z, ZOrder.zValue(col(colA), col(colB)))
      .repartitionByRange(nFiles, col(z))
      .sortWithinPartitions(z)
      .drop(z)
    writeOverwrite(shaped)
  }

  /** Current table + target file count for a compaction rewrite, derived
    * from the CURRENT on-disk byte total (manifest metadata, no data scan). */
  private def rewriteShape(spark: SparkSession, targetBytes: Long): (DataFrame, Int) = {
    val cur = read(spark)
    val bytes = {
      val f = fs(spark)
      val m = readManifest(f, metaDir, currentSnapshot(spark).get).get
      m.data.map(_.bytes).sum
    }
    (cur, math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt)
  }

  /** Keep the last `keepLast` snapshots; drop older manifests, torn claim
    * files below the kept range, and every data/delete file no kept
    * manifest references (orphans from crashed stagings included).
    * Returns (manifests kept, files removed). Not concurrency-safe with an
    * in-flight writer — run it like Iceberg's maintenance procedures. */
  def expireSnapshots(spark: SparkSession, keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, "must keep at least one snapshot")
    val f = fs(spark)
    val valid = snapshots(spark)
    // tagged snapshots are pinned (Iceberg refs): expiry never drops them
    val keep = (valid.takeRight(keepLast) ++ tags(spark).values.filter(valid.contains)).toSet
    if (keep.isEmpty) return (0, 0)
    // all manifest files on disk (torn ones included) below the kept range go
    listManifestSeqs(f, metaDir).filterNot(keep).filter(_ < keep.max)
      .foreach(s => f.delete(new Path(s"$metaDir/snap-$s.json"), false))
    val referenced: Set[String] =
      keep.flatMap(s => readManifest(f, metaDir, s).toSeq.flatMap(m =>
        m.data.map(_.path) ++ m.deletes.map(_.path) ++ m.posDeletes.map(_.path)))
    var removed = 0
    for (sub <- Seq("data", "deletes")) {
      val dir = new Path(s"$location/$sub")
      if (f.exists(dir)) f.listStatus(dir).foreach { st =>
        val live = f.listStatus(st.getPath).exists { part =>
          referenced.contains(s"$sub/${st.getPath.getName}/${part.getPath.getName}")
        }
        if (!live) { removed += f.listStatus(st.getPath).length; f.delete(st.getPath, true) }
      }
    }
    (keep.size, removed)
  }

  def drop(spark: SparkSession): Unit = fs(spark).delete(new Path(location), true)

  // ------------------------------------------------------------- plumbing

  /** Write `df` under a fresh uuid dir and harvest per-file rows/bytes and
    * per-column min/max/null stats FROM THE PARQUET FOOTERS — metadata
    * reads over just-written files only (at cluster scale the writing
    * tasks report these; the driver never rescans data). */
  private def stage(df: DataFrame, sub: String): Seq[StagedFile] = {
    val spark = df.sparkSession
    val f = fs(spark)
    val dirName = UUID.randomUUID().toString.take(8) + "-" +
      Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(name))
    val rel = s"$sub/$dirName"
    val dir = s"$location/$rel"
    df.write.mode("overwrite").parquet(dir)
    val c = conf(spark)
    f.listStatus(new Path(dir)).toSeq
      .filter(st => st.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .map { st =>
        val (rows, stats) = footerStats(c, st.getPath)
        StagedFile(s"$rel/${st.getPath.getName}", rows, st.getLen, stats)
      }
  }

  /** Claim the next sequence number and stream the manifest built by
    * `build(parentManifest, claimedSeq)` into it. See class doc for the
    * crash/concurrency contract. */
  private def commit(spark: SparkSession, op: String)
                    (build: (Option[Manifest], Long) => CommitParts): Long = {
    val f = fs(spark)
    f.mkdirs(new Path(metaDir))
    @tailrec def attempt(tries: Int): Long = {
      val seen = listManifestSeqs(f, metaDir)
      val target = seen.lastOption.getOrElse(0L) + 1
      val claimed =
        try Some(f.create(new Path(s"$metaDir/snap-$target.json"), false))
        catch { case _: java.io.IOException => None }
      claimed match {
        case Some(out) =>
          // a build that THROWS (e.g. refused schema evolution) leaves the
          // claimed file empty = a torn manifest: invisible to readers,
          // stepped over by the next committer — a safe burned sequence
          val m = try {
            val parent = settleParent(f, target)
            val parts = build(parent, target)
            Manifest(target, parent.map(_.snapshot).getOrElse(0L), op, parts.schema,
                     parts.data, parts.deletes, parts.marker, parts.posDeletes)
          } catch { case e: Throwable => out.close(); throw e }
          val bytes = manifestJson(m).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          try { out.write(bytes) } finally out.close()
          target
        case None if tries < 50 => attempt(tries + 1)
        case None => throw new java.io.IOException(
          s"could not claim a snapshot sequence in $metaDir after 50 attempts")
      }
    }
    attempt(0)
  }

  /** Latest committed ancestor of `target`: walk down from target-1; a
    * manifest file that exists but does not yet parse is an in-flight
    * writer — poll briefly, then declare it dead and step over (its claim
    * stays burned; readers skip it forever). */
  private def settleParent(f: FileSystem, target: Long): Option[Manifest] = {
    var s = target - 1
    while (s >= 1) {
      val path = new Path(s"$metaDir/snap-$s.json")
      if (f.exists(path)) {
        var m = readManifest(f, metaDir, s)
        var polls = 0
        while (m.isEmpty && polls < 40) { Thread.sleep(25); m = readManifest(f, metaDir, s); polls += 1 }
        if (m.isDefined) return m
      }
      s -= 1
    }
    None
  }
}

object SnapshotTable {
  private val FileCol = "__graft_file"
  private val RelCol = "__graft_rel"
  private val PosCol = "__graft_pos"
  private val DataSeqCol = "__graft_data_seq"
  private val DelSeqCol = "__graft_del_seq"
  private val PosDelFileCol = "file"
  private val PosDelPosCol = "pos"
  private val TagName = "tag-([A-Za-z0-9._-]+)\\.json".r

  /** min/max serialized as strings, typed by `tpe` ∈ {long, double, string}. */
  final case class ColumnStats(tpe: String, min: String, max: String, nulls: Long)
  final case class DataFileEntry(path: String, seq: Long, rows: Long, bytes: Long,
                                 stats: Map[String, ColumnStats])
  final case class DeleteFileEntry(path: String, seq: Long, keys: Seq[String], rows: Long)
  /** A position-delete file: (file: manifest-relative data-file path,
    * pos: in-file row ordinal) rows — Iceberg v2's second delete kind. */
  final case class PosDeleteFileEntry(path: String, seq: Long, rows: Long)
  /** `marker` carries an idempotence key for [[SnapshotTable.appendOnce]]
    * (Iceberg stores the same thing as a snapshot-summary property). */
  final case class Manifest(snapshot: Long, parent: Long, operation: String, schema: String,
                            data: Seq[DataFileEntry], deletes: Seq[DeleteFileEntry],
                            marker: Option[String] = None,
                            posDeletes: Seq[PosDeleteFileEntry] = Nil)
  /** What a commit publishes (the manifest minus identity fields). */
  private[io] final case class CommitParts(data: Seq[DataFileEntry],
                                           deletes: Seq[DeleteFileEntry],
                                           posDeletes: Seq[PosDeleteFileEntry],
                                           schema: String, marker: Option[String])
  final case class PrunedRead(df: DataFrame, filesScanned: Int, filesTotal: Int)
  /** A Catalyst-integrated scan + its file index (for prune assertions). */
  final case class IndexedRead(df: DataFrame, index: SnapshotFileIndex)

  private[io] final case class StagedFile(rel: String, rows: Long, bytes: Long,
                                          stats: Map[String, ColumnStats]) {
    def at(seq: Long): DataFileEntry = DataFileEntry(rel, seq, rows, bytes, stats)
  }

  private implicit val formats: Formats = DefaultFormats

  /** Append-time schema evolution: same-name fields must keep their exact
    * type (refused otherwise — no silent promotion); fields present on only
    * one side survive as NULLABLE, because some data files will lack them
    * and the explicit-schema parquet read fills NULL. Column order: parent
    * first, new columns appended (Iceberg's add-column placement). */
  private[io] def evolveSchema(parent: StructType, next: StructType): StructType = {
    parent.fields.foreach { p =>
      next.fields.find(_.name == p.name).foreach { n =>
        require(n.dataType == p.dataType,
          s"schema evolution cannot change '${p.name}': ${p.dataType.sql} -> ${n.dataType.sql}")
      }
    }
    StructType(
      parent.fields.map(p =>
        if (next.fieldNames.contains(p.name)) p else p.copy(nullable = true)) ++
      next.fields.filterNot(f => parent.fieldNames.contains(f.name))
        .map(_.copy(nullable = true)))
  }

  private[io] def manifestJson(m: Manifest): String =
    JsonMethods.pretty(JsonMethods.render(Extraction.decompose(m)))

  private[io] def listManifestSeqs(f: FileSystem, metaDir: String): Seq[Long] = {
    val dir = new Path(metaDir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case ManifestName(s) => s.toLong }.sorted
  }
  private val ManifestName = "snap-([0-9]+)\\.json".r

  /** None for a missing OR torn (unparseable) manifest. */
  private[io] def readManifest(f: FileSystem, metaDir: String, seq: Long): Option[Manifest] = {
    val path = new Path(s"$metaDir/snap-$seq.json")
    if (!f.exists(path)) return None
    try {
      val in = f.open(path)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      val m = JsonMethods.parse(text).extract[Manifest]
      if (m.snapshot == seq) Some(m) else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-file row count + per-column stats from the parquet footer: min of
    * row-group mins, max of maxes, summed null counts; a column drops out
    * entirely if ANY row group lacks usable stats (absent stats must mean
    * "never prune", not "prune wrong"). Supported: int32/int64 ("long"),
    * float/double ("double"), UTF-8 binary ("string"); other physical or
    * logical types record no stats. */
  private[io] def footerStats(conf: Configuration, file: Path): (Long, Map[String, ColumnStats]) = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      var merged = Map.empty[String, Option[ColumnStats]]
      for (b <- blocks; c <- b.getColumns.asScala) {
        val nm = c.getPath.toDotString
        val next = chunkStats(c)
        merged = merged.updatedWith(nm) {
          case None            => Some(next)
          case Some(None)      => Some(None)
          case Some(Some(acc)) => Some(next.map(n => mergeStats(acc, n)))
        }
      }
      (rows, merged.collect { case (k, Some(v)) => (k, v) })
    } finally reader.close()
  }

  private def chunkStats(c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): Option[ColumnStats] = {
    val s = c.getStatistics
    if (s == null || s.isEmpty || !s.hasNonNullValue || s.getNumNulls < 0) return None
    val prim = c.getPrimitiveType
    val tpe = prim.getPrimitiveTypeName match {
      case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 => Some("long")
      case PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE => Some("double")
      case PrimitiveTypeName.BINARY
        if prim.getLogicalTypeAnnotation.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
        Some("string")
      case _ => None
    }
    tpe.map { t =>
      def repr(v: AnyRef): String = v match {
        case b: Binary => b.toStringUsingUTF8
        case other     => other.toString
      }
      ColumnStats(t, repr(s.genericGetMin.asInstanceOf[AnyRef]),
                  repr(s.genericGetMax.asInstanceOf[AnyRef]), s.getNumNulls)
    }
  }

  private def mergeStats(a: ColumnStats, b: ColumnStats): ColumnStats =
    ColumnStats(a.tpe,
      if (cmpRepr(a.tpe, a.min, b.min) <= 0) a.min else b.min,
      if (cmpRepr(a.tpe, a.max, b.max) >= 0) a.max else b.max,
      a.nulls + b.nulls)

  private def cmpRepr(tpe: String, a: String, b: String): Int = tpe match {
    case "long"   => java.lang.Long.compare(a.toLong, b.toLong)
    case "double" => java.lang.Double.compare(a.toDouble, b.toDouble)
    case _        => a.compareTo(b)
  }

  /** Compare a serialized stat value against a caller-supplied bound. */
  private[io] def cmpStat(tpe: String, statRepr: String, bound: Any): Int = tpe match {
    case "long"   => java.lang.Long.compare(statRepr.toLong, bound.asInstanceOf[Number].longValue)
    case "double" => java.lang.Double.compare(statRepr.toDouble, bound.asInstanceOf[Number].doubleValue)
    case _        => statRepr.compareTo(bound.toString)
  }
}
