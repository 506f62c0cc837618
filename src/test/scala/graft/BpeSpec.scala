package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bpe

/** BPE training: pinned against an independent single-threaded reference
  * implementation (the learned merges are data-dependent, so the DuckDB
  * oracle covers only the distributed pair-counting core — this spec is the
  * oracle for the loop), plus reassembly/monotonicity properties. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------- independent reference BPE
  private def refTrain(wordCnt: Map[String, Long], k: Int)
      : (List[(String, String)], Map[String, List[String]]) = {
    var vocab: Map[String, (Long, List[String])] =
      wordCnt.map { case (w, c) => w -> (c, w.map(_.toString).toList :+ Bpe.EndOfWord) }
    var merges = List.empty[(String, String)]
    var rounds = 0
    var stop = false
    while (rounds < k && !stop) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((_, (c, syms)) <- vocab; p <- syms.zip(syms.tail))
        pairs(p) = pairs.getOrElse(p, 0L) + c
      val live = pairs.filter(_._2 > 1)
      if (live.isEmpty) stop = true
      else {
        val (a, b) = live.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges :+= ((a, b))
        def merge(s: List[String]): List[String] = s.foldLeft(List.empty[String]) {
          case (acc, t) if acc.nonEmpty && acc.last == a && t == b => acc.init :+ (a + b)
          case (acc, t) => acc :+ t
        }
        vocab = vocab.map { case (w, (c, syms)) => w -> (c, merge(syms)) }
        rounds += 1
      }
    }
    (merges, vocab.map { case (w, (_, syms)) => w -> syms })
  }

  private val sf = "/root/testdata/sf0.001"

  test("classic Sennrich example: distributed merges == reference merges") {
    val docs = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
       Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
      .toDF("text")
    val (merges, vocab) = Bpe.train(docs, k = 10)
    val wc = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val (refMerges, refVocab) = refTrain(wc, 10)
    assert(merges == refMerges)
    // "es" then "est" emerge early (newest+widest = 9 beats everything)
    assert(merges.take(2) == List(("e", "s"), ("es", "t")))
    val got = vocab.select($"word", $"syms").as[(String, Seq[String])].collect().toMap
    refVocab.foreach { case (w, syms) => assert(got(w) == syms, s"word $w") }
  }

  test("corpus merges == reference merges; segmentation identical word-for-word") {
    val docs = graft.Tables.documents(spark, sf)
    val (merges, vocab) = Bpe.train(docs, k = 8)
    assert(merges.size == 8)
    val wc = Bpe.wordCounts(docs).as[(String, Long)].collect().toMap
    val (refMerges, refVocab) = refTrain(wc, 8)
    assert(merges == refMerges)
    val got = vocab.select($"word", $"syms").as[(String, Seq[String])].collect().toMap
    assert(got.size == refVocab.size)
    refVocab.foreach { case (w, syms) => assert(got(w) == syms, s"word $w") }
  }

  test("properties: reassembly is lossless, token counts shrink, encodeWords replays training") {
    val docs = graft.Tables.documents(spark, sf)
    val (merges, vocab) = Bpe.train(docs, k = 8)
    val bad = vocab.filter(
      concat_ws("", col("syms")) =!= concat(col("word"), lit(Bpe.EndOfWord))).count()
    assert(bad == 0, "every segmentation must concatenate back to word + marker")
    val grew = vocab.filter(size(col("syms")) > length(col("word")) + 1).count()
    assert(grew == 0, "merges never grow a segmentation")
    assert(vocab.filter(size(col("syms")) < length(col("word")) + 1).count() > 0,
           "at least some words actually compressed")
    // inference path: replaying the merge table over the bare words yields
    // exactly the trained segmentation
    val replay = Bpe.encodeWords(vocab.select("word", "cnt"), merges)
      .select($"word", $"syms").as[(String, Seq[String])].collect().toMap
    val trained = vocab.select($"word", $"syms").as[(String, Seq[String])].collect().toMap
    assert(replay == trained)
  }

  test("greedy overlap semantics: 'aaa' under merge (a,a) -> [aa, a]") {
    val df = Seq("x").toDF("word")
    val out = df.select(Bpe.mergePair(Bpe.initialSymbols(lit("aaa")), "a", "a").as("s"))
      .as[Seq[String]].head()
    assert(out == Seq("aa", "a", Bpe.EndOfWord))
  }
}
