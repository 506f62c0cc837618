package graft.io

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, PartitionDirectory}
import org.apache.spark.sql.types.StructType

import SnapshotTable.{cmpStat, ColumnStats, DataFileEntry}

/** Catalyst-integrated file skipping for [[SnapshotTable]] — the Delta/Iceberg
  * integration shape: a [[FileIndex]] whose `listFiles` receives the query's
  * data filters from `FileSourceStrategy` and answers with only the data files
  * whose manifest min/max statistics can possibly satisfy them.
  *
  * This turns manifest-stat pruning from an explicit API call
  * ([[SnapshotTable.readRange]]) into a property of the PLAN: any
  * `df.filter(...)` — or a `WHERE` clause through a temp view — on a
  * [[SnapshotTable.readIndexed]] scan prunes files automatically, because
  * Spark's own scan planning hands the pushed-down predicates to this index
  * at `planInputPartitions` time. Nothing is scanned to decide: planning cost
  * is one in-memory pass over the manifest entries, exactly Iceberg's
  * manifest-evaluation step.
  *
  * Pruning is CONSERVATIVE (sound): a file is skipped only when the filter
  * PROVABLY matches no row of it; any predicate shape the evaluator does not
  * understand keeps the file and lets Spark's parquet row-group filters and
  * the residual filter do the exact work. Row-level results are therefore
  * identical to an unpruned scan (asserted in SnapshotFileIndexSpec).
  */
final class SnapshotFileIndex(spark: SparkSession, location: String,
                              entries: Seq[DataFileEntry],
                              dataSchema: StructType) extends FileIndex {
  import SnapshotFileIndex.mayMatch

  // FileStatus built straight from manifest metadata (path + exact byte
  // length harvested at commit time) — planning never touches the
  // filesystem, the 10^12-file property the manifest design exists for.
  private val files: Seq[(DataFileEntry, FileStatusWithMetadata)] = {
    val base = new Path(location)
    val f = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qualified = f.makeQualified(base)
    entries.map { e =>
      val st = new FileStatus(e.bytes, false, 1, 128L * 1024 * 1024, 0L,
                              new Path(qualified, e.path))
      e -> FileStatusWithMetadata(st)
    }
  }

  /** Files the last `listFiles` kept / was offered — lets tests and benches
    * assert the prune actually bit without digging through an AQE plan. */
  @volatile var lastFilesListed: Int = -1
  def filesTotal: Int = files.size

  override def rootPaths: Seq[Path] = Seq(new Path(location))
  override def partitionSchema: StructType = new StructType()

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // dataFilters arrive as split conjuncts: a file must possibly satisfy
    // every one of them to stay
    val kept = files.collect {
      case (e, st) if dataFilters.forall(f => mayMatch(f, e.stats, e.rows)) => st
    }
    lastFilesListed = kept.size
    Seq(PartitionDirectory(InternalRow.empty, kept))
  }

  override def inputFiles: Array[String] = files.map(_._2.getPath.toString).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = entries.map(_.bytes).sum
}

object SnapshotFileIndex {

  /** May any row of a file with column stats `stats` satisfy `pred`?
    * Three-valued at the file level: `true` = cannot rule the file out
    * (keep), `false` = provably no row matches (skip). Unknown predicate
    * shapes, missing stats and evaluation surprises all answer keep. */
  private[graft] def mayMatch(pred: Expression, stats: Map[String, ColumnStats],
                           rows: Long): Boolean = pred match {
    case And(l, r) => mayMatch(l, stats, rows) && mayMatch(r, stats, rows)
    case Or(l, r)  => mayMatch(l, stats, rows) || mayMatch(r, stats, rows)
    case EqualTo(a: Attribute, Literal(v, _))       => inRange(stats, a.name, v, v)
    case EqualTo(Literal(v, _), a: Attribute)       => inRange(stats, a.name, v, v)
    case EqualNullSafe(a: Attribute, Literal(v, _)) if v != null => inRange(stats, a.name, v, v)
    case EqualNullSafe(Literal(v, _), a: Attribute) if v != null => inRange(stats, a.name, v, v)
    case GreaterThan(a: Attribute, Literal(v, _))          => cmpMax(stats, a.name, v) > 0
    case GreaterThanOrEqual(a: Attribute, Literal(v, _))   => cmpMax(stats, a.name, v) >= 0
    case LessThan(a: Attribute, Literal(v, _))             => cmpMin(stats, a.name, v) < 0
    case LessThanOrEqual(a: Attribute, Literal(v, _))      => cmpMin(stats, a.name, v) <= 0
    case GreaterThan(Literal(v, _), a: Attribute)          => cmpMin(stats, a.name, v) < 0
    case GreaterThanOrEqual(Literal(v, _), a: Attribute)   => cmpMin(stats, a.name, v) <= 0
    case LessThan(Literal(v, _), a: Attribute)             => cmpMax(stats, a.name, v) > 0
    case LessThanOrEqual(Literal(v, _), a: Attribute)      => cmpMax(stats, a.name, v) >= 0
    case In(a: Attribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists { case Literal(v, _) => inRange(stats, a.name, v, v) }
    case InSet(a: Attribute, vs) =>
      vs.exists(v => inRange(stats, a.name, v, v))
    case IsNull(a: Attribute) =>
      stats.get(a.name).forall(_.nulls > 0)
    case StartsWith(a: Attribute, Literal(p, _)) if p != null =>
      // compare the prefix against min/max TRUNCATED to the prefix length:
      // any string starting with p sorts inside [min.take(|p|) .. max.take(|p|)]
      stats.get(a.name).forall { cs =>
        cs.tpe != "string" || {
          val pre = p.toString
          cs.min.take(pre.length) <= pre && pre <= cs.max.take(pre.length)
        }
      }
    case Literal(v, _) => v != false // literal true/null keep, literal false skips
    case _ => true
  }

  /** value ∈ [min, max] possible? (missing stats / incomparable → keep) */
  private def inRange(stats: Map[String, ColumnStats], col: String,
                      lo: Any, hi: Any): Boolean =
    stats.get(col).forall { cs =>
      try cmpStat(cs.tpe, cs.min, hi) <= 0 && cmpStat(cs.tpe, cs.max, lo) >= 0
      catch { case scala.util.control.NonFatal(_) => true }
    }
  /** sign of (max - v), or +1 when unknowable */
  private def cmpMax(stats: Map[String, ColumnStats], col: String, v: Any): Int =
    stats.get(col).map { cs =>
      try cmpStat(cs.tpe, cs.max, v) catch { case scala.util.control.NonFatal(_) => 1 }
    }.getOrElse(1)
  /** sign of (min - v), or -1 when unknowable */
  private def cmpMin(stats: Map[String, ColumnStats], col: String, v: Any): Int =
    stats.get(col).map { cs =>
      try cmpStat(cs.tpe, cs.min, v) catch { case scala.util.control.NonFatal(_) => -1 }
    }.getOrElse(-1)
}
