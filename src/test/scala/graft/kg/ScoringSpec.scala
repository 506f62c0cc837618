package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Hand-computed cosine + deterministic top-1 (A1–A4, W1, W3). */
class ScoringSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Two mentions, two candidate entities each. Entity 1's context matches
  // mention A; entity 2's matches mention B; entity 3 has no overlap at all.
  private val mentions = Seq(
    (1L, 101L, "r", "p", "c", 0, "ident", "X", "x", Seq("alpha", "beta", "alpha")),
    (2L, 102L, "r", "p", "c", 1, "ident", "Y", "y", Seq("gamma", "delta"))
  ).toDF("mention_id", "ctx_id", "repo", "path", "commit", "line", "kind", "surface", "norm", "ctx_terms")

  private val candidates = Seq(
    (1L, 1L, 0.9), (1L, 2L, 0.5), (1L, 3L, 0.99),
    (2L, 1L, 0.9), (2L, 2L, 0.5)
  ).toDF("mention_id", "entity_id", "prior")

  private val kbCtx = Seq(
    (1L, "alpha", 1.0), (1L, "beta", 1.0),
    (2L, "gamma", 1.0), (2L, "delta", 1.0),
    (3L, "omega", 1.0)
  ).toDF("entity_id", "term", "weight")

  private lazy val byName = Scoring.score(mentions, candidates, kbCtx)
    .collect().map(r => ((r.getAs[Long]("mention_id"), r.getAs[Long]("entity_id")),
                          r.getAs[Double]("score"))).toMap

  test("A4: cosine matches hand math") {
    // mention 1: tf = {alpha:2, beta:1}; n=2 mentions
    // df(alpha)=1, df(beta)=1, idf = ln(3/2)+1
    val idf = math.log(3.0 / 2.0) + 1.0
    val wAlpha = 2 * idf; val wBeta = 1 * idf
    val mNorm = math.sqrt(wAlpha * wAlpha + wBeta * wBeta)
    val eNorm = math.sqrt(2.0)
    val expected = (wAlpha * 1.0 + wBeta * 1.0) / (mNorm * eNorm)
    assert(math.abs(byName((1L, 1L)) - expected) < 1e-12)
  }

  test("W3: no-overlap candidate falls back to scaled prior") {
    assert(math.abs(byName((1L, 3L)) - 0.99e-9) < 1e-18)
    assert(byName((1L, 3L)) < byName((1L, 1L)))
  }

  test("W1: top-1 picks the context-matching entity, not the higher prior") {
    val top = Scoring.top1(Scoring.score(mentions, candidates, kbCtx))
      .collect().map(r => (r.getAs[Long]("mention_id"), r.getAs[Long]("entity_id"))).toMap
    assert(top == Map(1L -> 1L, 2L -> 2L))
  }

  test("W1: exact ties break toward the smaller entity_id deterministically") {
    val tied = Seq((1L, 10L, 0.5), (1L, 7L, 0.5)).toDF("mention_id", "entity_id", "prior")
    val noCtx = Seq((1L, 101L, "r", "p", "c", 0, "ident", "X", "x", Seq.empty[String]))
      .toDF("mention_id", "ctx_id", "repo", "path", "commit", "line", "kind", "surface", "norm", "ctx_terms")
    val top = Scoring.top1(Scoring.score(noCtx, tied, kbCtx)).collect()
    assert(top.length == 1 && top(0).getAs[Long]("entity_id") == 7L)
  }

  test("scores are identical with broadcastKbCtx on and off") {
    val off = Scoring.score(mentions, candidates, kbCtx, broadcastKbCtx = false)
      .collect().map(r => ((r.getAs[Long]("mention_id"), r.getAs[Long]("entity_id")),
                            r.getAs[Double]("score"))).toMap
    assert(off.keySet == byName.keySet)
    off.foreach { case (k, v) => assert(math.abs(v - byName(k)) < 1e-12, s"$k: $v vs ${byName(k)}") }
  }

  test("approx (HLL) IDF stays within tolerance of exact and keeps the P/R gate") {
    val src = CorpusGen.srcFiles(spark, 100).toDF()
    val m = Extract.mentions(src)
    val dict = Candidates.dictionary(CorpusGen.kbEntries(spark).toDF())
    val cands = Candidates.candidates(m, dict, broadcastDict = true)
    val kbc = CorpusGen.kbContexts(spark).toDF()
    def scores(approx: Boolean) =
      Scoring.score(m, cands, kbc, approxIdf = approx)
        .collect().map(r => ((r.getAs[Long]("mention_id"), r.getAs[Long]("entity_id")),
                              r.getAs[Double]("score"))).toMap
    val exact = scores(approx = false); val approx = scores(approx = true)
    assert(exact.keySet == approx.keySet)
    val maxRel = exact.collect { case (k, e) if e > 1e-6 =>
      math.abs(approx(k) - e) / e }.max
    assert(maxRel <= 0.15, s"approx IDF drifted: max relative score diff $maxRel")
    // and the end-to-end quality gate holds in approx mode too
    val top1 = Scoring.top1(Scoring.score(m, cands, kbc, approxIdf = true))
    val triples = Canonicalize.triples(Canonicalize.canonicalMentions(m, top1))
    val pr = Eval.precisionRecall(triples, CorpusGen.gold(spark, 100).toDF()).collect()(0)
    assert(pr.getAs[Double]("precision") >= 0.95 && pr.getAs[Double]("recall") >= 0.95)
  }

  test("A5: majority vote elects the cluster majority with deterministic ties") {
    val linked = Seq(
      ("r", "ident", "x", 1L), ("r", "ident", "x", 1L), ("r", "ident", "x", 2L),
      ("r", "ident", "y", 5L), ("r", "ident", "y", 4L) // tie → smaller id
    ).toDF("repo", "kind", "norm", "entity_id")
    val v = Canonicalize.vote(linked).collect()
      .map(r => (r.getAs[String]("norm"), r.getAs[Long]("entity_id"), r.getAs[Double]("conf"))).toSet
    assert(v == Set(("x", 1L, 0.666667), ("y", 4L, 0.5)))
  }
}
