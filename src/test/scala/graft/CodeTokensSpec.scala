package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.CodeTokenizer.codeTokens
import graft.kg.CorpusGen

/** The native code_tokens expression must be indistinguishable from the
  * regexp tokenizer it replaces — on the corpus, on driver testdata, on
  * adversarial strings, and on seeded random inputs. */
class CodeTokensSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def regexLower(c: org.apache.spark.sql.Column) =
    regexp_extract_all(lower(c), lit("[a-z_][a-z0-9_]{2,}"), lit(0))
  private def regexMixed(c: org.apache.spark.sql.Column) =
    regexp_extract_all(c, lit("[A-Za-z_][A-Za-z0-9_]{2,}"), lit(0))

  private def assertEqualOn(strings: Seq[String]): Unit = {
    val df = strings.toDF("s")
      .select(codeTokens(col("s")).as("fast"), regexLower(col("s")).as("slow"),
              codeTokens(col("s"), lowerOutput = false).as("fastM"), regexMixed(col("s")).as("slowM"))
    val bad = df.filter(col("fast") =!= col("slow") || col("fastM") =!= col("slowM")).collect()
    assert(bad.isEmpty, s"tokenizer divergence on: ${bad.take(3).mkString(" | ")}")
  }

  test("adversarial fixtures: digit-led runs, short runs, underscores, unicode, empties") {
    assertEqualOn(Seq(
      "", " ", "ab", "abc", "a_b", "___", "__", "12abc", "9a1", "11ab", "1ab2",
      "x1y2z3", "ABC", "AbC_d9", "foo.bar_baz", "a-b_c", "tab\there", "line\nbreak",
      "émigré café 中文 naïve", "é_abc_é", "mix3d_CASE_Token", "_x_", "get0",
      "a" * 100, "_" * 3 + "9" * 5, "0_ab", "ab_0", "x__", "3_3_3a", "π≈3_14"))
  }

  test("corpus + testdata parity (every content line and every document)") {
    val corpus = CorpusGen.srcFiles(spark, 80).collect().flatMap(_.content.split("\n")).toSeq
    assertEqualOn(corpus)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text")).as[String].collect().toSeq
    assertEqualOn(docs)
  }

  test("property: equal on 500 seeded random strings over a token-ish alphabet") {
    val alphabet = "abcXYZ019__  ..\n\t-éπ!".toCharArray
    val r = new scala.util.Random(4242L)
    (0 until 500).foreach { _ =>
      val s = Array.fill(r.nextInt(60))(alphabet(r.nextInt(alphabet.length))).mkString
      // driver-side check (no Spark job per case): compare via local eval
      val fast = graft.functions.CodeTokenizer
        .tokenize(org.apache.spark.unsafe.types.UTF8String.fromString(s), true)
        .toArray[AnyRef](org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      val slow = "[a-z_][a-z0-9_]{2,}".r.findAllIn(s.toLowerCase).toSeq
      assert(fast == slow, s"on <$s>")
    }
  }

  test("code_tokens is SQL-callable (GraftExtensions registration shape)") {
    // a fresh SparkContext per test is not possible, so register on a cloned
    // session through the same builder GraftExtensions injects (the
    // extensions class itself is exercised against a real
    // SparkSessionExtensions instance below)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext) // must not throw
    val s2 = spark.newSession()
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "code_tokens",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.CodeTokens(children.head),
      "built-in")
    val r = s2.sql("SELECT code_tokens('Val Alpha_Beta = 12ab x9') AS t")
      .collect()(0).getSeq[String](0)
    // lower("Val Alpha_Beta = 12ab x9") → val, alpha_beta; "12ab" clips to
    // "ab" (<3) and "x9" is too short — both dropped, exactly like the regexp
    assert(r == Seq("val", "alpha_beta"), s"got $r")
  }

  test("code_normalize ≡ the regexp normalization chain (fixtures + corpus + random)") {
    import graft.functions.CodeNormalizer.codeNormalize
    def regexChain(c: org.apache.spark.sql.Column) =
      trim(regexp_replace(
        regexp_replace(lower(regexp_replace(c, "([a-z0-9])([A-Z])", "$1 $2")), "[_.]", " "),
        " +", " "))
    val fixtures = Seq(
      "", " ", "_", "___", "AlphaBeta", "alpha_beta", "a.b.C", "getX_id", "ABC",
      "x__y", "Alpha_Beta.GammaDelta", "a", "A1b2C3", "aB", "a_B", "aBC", "A1B",
      "a - b", "  padded  ", "_lead", "trail_", "a..b", "x_.y", "mIxEd_CaSe9",
      "tab\there", "1Abc", "get0")
    val r = new scala.util.Random(777L)
    val alphabet = "abcXYZ019__  ..-".toCharArray
    val random = (0 until 300).map(_ =>
      Array.fill(r.nextInt(30))(alphabet(r.nextInt(alphabet.length))).mkString)
    val corpus = CorpusGen.srcFiles(spark, 40).collect()
      .flatMap(_.content.split("[ \n]")).filter(_.nonEmpty).take(2000).toSeq
    val df = (fixtures ++ random ++ corpus).toDF("s")
      .select(codeNormalize(col("s")).as("fast"), regexChain(col("s")).as("slow"))
    val bad = df.filter(col("fast") =!= col("slow"))
      .select("fast", "slow").collect()
    assert(bad.isEmpty, s"normalize divergence: ${bad.take(5).mkString(" | ")}")
    // idempotence of the native form
    val idem = (fixtures ++ random).toDF("s")
      .select(codeNormalize(col("s")).as("n1"))
      .select(col("n1"), codeNormalize(col("n1")).as("n2"))
    assert(idem.filter(col("n1") =!= col("n2")).count() == 0)
  }

  test("term_counts ≡ the HOF transform/array_distinct/filter form, order included") {
    import graft.functions.TermCounter.termCounts
    def hof(c: org.apache.spark.sql.Column) =
      transform(array_distinct(c), t =>
        struct(t.as("term"), size(filter(c, x => x === t)).cast("long").as("tf")))
    val r = new scala.util.Random(99L)
    // null elements included: both forms must emit (null, 0) at the null's
    // first occurrence (`x === null` filters to nothing in the HOF form)
    val pool = Array("alpha", "beta", "gamma", "kernel", "socket", "x", "yy", null)
    val arrays: Seq[Seq[String]] = Seq(Seq.empty[String], Seq("solo"), Seq("a", "a", "a"),
                                       Seq(null, "a", null, "a")) ++
      (0 until 200).map(_ => Seq.fill(r.nextInt(30))(pool(r.nextInt(pool.length))))
    val df = arrays.toDF("xs")
      .select(termCounts(col("xs")).as("fast"), hof(col("xs")).as("slow"))
    assert(df.filter(!(col("fast") <=> col("slow"))).count() == 0,
      df.filter(!(col("fast") <=> col("slow"))).take(2).mkString(" | "))
  }

  test("code_tokens stays inside whole-stage codegen") {
    val df = spark.range(100)
      .select(concat(lit("val x_"), col("id").cast("string"), lit(" = alpha beta_gamma")).as("s"))
      .select(codeTokens(col("s")).as("t"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)") && p.contains("code_tokens"),
      s"no codegen span with code_tokens:\n$p")
  }
}
