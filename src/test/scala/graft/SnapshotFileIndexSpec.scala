package graft

import java.nio.file.Files

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.SnapshotTable
import graft.io.SnapshotTable.ColumnStats
import graft.io.SnapshotFileIndex

/** Catalyst-integrated file skipping: [[SnapshotFileIndex]] receives the
  * pushed-down data filters inside Spark's own scan planning and prunes data
  * files by manifest min/max stats — readRange's prune as a property of the
  * PLAN, not an API call. */
class SnapshotFileIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Range-clustered table: 2000 rows in 10 files of 200 consecutive ids,
    * plus an equality delete and a re-append so merge-on-read is in force. */
  private lazy val table: SnapshotTable = {
    val t = new SnapshotTable(Files.createTempDirectory("fidx").toString, "t")
    val src = spark.range(0, 2000).select(
      col("id").as("doc_id"),
      concat(lit("w"), format_string("%04d", col("id"))).as("word"),
      (col("id") % 7).cast("double").as("score"))
    t.writeOverwrite(src.repartitionByRange(10, col("doc_id")))
    t.deleteWhereKeys(src.filter(col("doc_id") % 10 === 3).select("doc_id"), Seq("doc_id"))
    t.append(src.filter(col("doc_id") % 100 === 3)) // survives the delete (seq rule)
    t
  }

  test("readIndexed ≡ read (merge-on-read deletes applied identically)") {
    val idx = table.readIndexed(spark)
    val a = idx.df.collect().map(_.toString).sorted
    val b = table.read(spark).collect().map(_.toString).sorted
    assert(a.length > 0 && a.sameElements(b))
  }

  test("a plain .filter prunes files at plan time (no readRange call)") {
    val idx = table.readIndexed(spark)
    val got = idx.df.filter(col("doc_id") >= 500 && col("doc_id") <= 899)
      .agg(count(lit(1)), sum(col("doc_id"))).collect()(0)
    // the listing really pruned: only files overlapping [500, 899] remain
    // (10 range-clustered originals → 2-3 overlap; +1 re-append file)
    assert(idx.index.lastFilesListed > 0 &&
           idx.index.lastFilesListed <= 4,
           s"listed ${idx.index.lastFilesListed} of ${idx.index.filesTotal}")
    // and the rows are exact (deletes + residual filter still applied)
    val exact = table.read(spark)
      .filter(col("doc_id") >= 500 && col("doc_id") <= 899)
      .agg(count(lit(1)), sum(col("doc_id"))).collect()(0)
    assert(got == exact)
  }

  test("an unfiltered scan lists every file") {
    val idx = table.readIndexed(spark)
    idx.df.agg(count(lit(1))).collect()
    assert(idx.index.lastFilesListed == idx.index.filesTotal)
  }

  test("the prune reaches through SQL over a temp view") {
    val idx = table.readIndexed(spark)
    idx.df.createOrReplaceTempView("snap_idx")
    val n = spark.sql("SELECT count(*) FROM snap_idx WHERE doc_id < 150")
      .collect()(0).getLong(0)
    assert(idx.index.lastFilesListed < idx.index.filesTotal)
    assert(n == table.read(spark).filter(col("doc_id") < 150).count())
  }

  test("string-prefix and equality predicates prune; unknown shapes keep") {
    val idx = table.readIndexed(spark)
    idx.df.filter(col("word") === "w0042").collect()
    assert(idx.index.lastFilesListed <= 2) // one original file + the re-append
    // a shape the evaluator does not understand must NOT prune
    idx.df.filter(length(col("word")) === 5).agg(count(lit(1))).collect()
    assert(idx.index.lastFilesListed == idx.index.filesTotal)
  }

  // ----------------------------------------------------- pure prune logic

  private val st = Map(
    "doc_id" -> ColumnStats("long", "100", "199", 0),
    "word"   -> ColumnStats("string", "w0100", "w0199", 0),
    "score"  -> ColumnStats("double", "0.0", "6.0", 3))
  private def may(e: Expression) = SnapshotFileIndex.mayMatch(e, st, 100L)
  private val docId = AttributeReference("doc_id", LongType)()
  private val word = AttributeReference("word", StringType)()
  private val score = AttributeReference("score", DoubleType)()

  test("mayMatch: interval logic is sound and tight") {
    assert(may(EqualTo(docId, Literal(150L))))
    assert(!may(EqualTo(docId, Literal(200L))))
    assert(!may(EqualTo(Literal(99L), docId)))
    assert(may(GreaterThan(docId, Literal(198L))))
    assert(!may(GreaterThan(docId, Literal(199L))))
    assert(may(LessThan(docId, Literal(101L))))
    assert(!may(LessThan(docId, Literal(100L))))
    assert(may(GreaterThanOrEqual(docId, Literal(199L))))
    assert(!may(LessThanOrEqual(docId, Literal(99L))))
    // And prunes if either side proves empty; Or only if both do
    assert(!may(And(EqualTo(docId, Literal(150L)), EqualTo(docId, Literal(50L)))))
    assert(may(Or(EqualTo(docId, Literal(50L)), EqualTo(docId, Literal(150L)))))
    assert(!may(Or(EqualTo(docId, Literal(50L)), EqualTo(docId, Literal(250L)))))
    // In / IsNull / StartsWith
    assert(may(In(docId, Seq(Literal(5L), Literal(105L)))))
    assert(!may(In(docId, Seq(Literal(5L), Literal(505L)))))
    assert(may(IsNull(score)) && !may(IsNull(docId)))
    assert(may(StartsWith(word, Literal("w01"))))
    assert(!may(StartsWith(word, Literal("w02"))))
    // unknown column / unknown shape / nondeterministic → keep
    assert(may(EqualTo(AttributeReference("other", LongType)(), Literal(5L))))
    assert(may(IsNotNull(docId)))
  }
}
