package graft.kg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Mention extraction (SURVEY.md §2.3, E1–E8): src_files → Mention rows.
  *
  * Everything is built-in generator/regexp/array expressions — no UDFs, no
  * custom Generator — so the whole stage is one WholeStageCodegen span per
  * branch and Catalyst prunes `content` away right after the explode.
  *
  * Scale: the only shuffle in this stage is the per-file window for the ±k
  * context (partitionBy repo,path,commit) — everything else is narrow.
  */
object Extract {

  /** Identifier grammar (code-corpus mention kind "ident"). */
  val IdentRe = "[A-Za-z_][A-Za-z0-9_]{2,}"

  /** CamelCase-with-≥2-humps grammar for doc-comment entity references. */
  val CamelRe = "[A-Z][a-z0-9]*(?:[A-Z][A-Za-z0-9]*)+"

  /** Global keyword stoplist (per-lang keywords that match IdentRe). */
  val Keywords: Seq[String] = Seq(
    "def", "val", "var", "lazy", "object", "class", "trait", "extends",
    "public", "private", "static", "void", "return", "import", "from",
    "const", "let", "function", "require", "package")

  private val commentRe = "^\\s*(//|#)"
  private val importRe  = "^\\s*(import|from)\\s|require\\("

  /** E1: file → (line_no, line). */
  def lines(src: DataFrame): DataFrame =
    src.select(col("repo"), col("path"), col("commit"), col("lang"),
               posexplode(split(col("content"), "\n")).as(Seq("line_no", "line")))

  private def isComment: Column = col("line").rlike(commentRe)
  private def isImport: Column  = col("line").rlike(importRe)

  /** E2: identifiers from code lines (comment/import lines excluded — a
    * lexer does not tokenize those as identifiers). */
  def idents(lines: DataFrame): DataFrame =
    lines.filter(!isComment && !isImport)
      .select(col("repo"), col("path"), col("commit"), col("line_no"),
              explode(regexp_extract_all(col("line"), lit(IdentRe), lit(0))).as("surface"))
      .filter(!col("surface").isin(Keywords: _*))
      .withColumn("kind", lit("ident"))

  /** E3: CamelCase entity references inside doc-comment lines. */
  def docComments(lines: DataFrame): DataFrame =
    lines.filter(isComment)
      .select(col("repo"), col("path"), col("commit"), col("line_no"),
              explode(regexp_extract_all(col("line"), lit(CamelRe), lit(0))).as("surface"))
      .withColumn("kind", lit("doccomment"))

  /** E4: import/dependency targets, one literal-pattern branch per lang so
    * each regexp stays foldable (codegen) and the lang filter pushes down. */
  def imports(lines: DataFrame): DataFrame = {
    def branch(langs: Seq[String], pattern: String): DataFrame =
      lines.filter(col("lang").isin(langs: _*))
        .select(col("repo"), col("path"), col("commit"), col("line_no"),
                regexp_extract(col("line"), pattern, 1).as("target"))
        .filter(length(col("target")) > 0)
    val jvm = branch(Seq("scala", "java"), "^\\s*import\\s+([A-Za-z0-9_.]+)")
    val py  = branch(Seq("python"), "^\\s*from\\s+[A-Za-z0-9_.]+\\s+import\\s+([A-Za-z0-9_.]+)")
    val js  = branch(Seq("js"), "require\\('kb/([A-Za-z0-9_./]+)'\\)")
    jvm.unionByName(py).unionByName(js)
      // the mention surface is the last path segment of the import target
      .select(col("repo"), col("path"), col("commit"), col("line_no"),
              regexp_extract(col("target"), "([A-Za-z0-9_]+)$", 1).as("surface"))
      .withColumn("kind", lit("import"))
  }

  /** E5: normalization — camel split, lower, snake/dot fold, space collapse. */
  def normalize(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(regexp_replace(c, "([a-z0-9])([A-Z])", "$1 $2")),
                     "[_.]", " "),
      " +", " "))

  /** E6/W2: ±k-line context per file, tokenized to lowercase terms.
    * Implemented as k lag/lead pairs + concat (no array build, stays in
    * codegen) over the per-file window. */
  def fileContexts(lines: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("repo"), col("path"), col("commit")).orderBy(col("line_no"))
    val neighbors: Seq[Column] =
      (k to 1 by -1).map(i => lag(col("line"), i).over(w)) ++
      Seq(col("line")) ++
      (1 to k).map(i => lead(col("line"), i).over(w))
    lines.select(col("repo"), col("path"), col("commit"), col("line_no"),
                 concat_ws(" ", neighbors: _*).as("ctx_text"))
      .select(col("repo"), col("path"), col("commit"), col("line_no"),
              regexp_extract_all(lower(col("ctx_text")), lit("[a-z_][a-z0-9_]{2,}"), lit(0)).as("ctx_terms"))
  }

  /** E7+E8: union the extractors, attach norm, ctx and the stable id. */
  def mentions(src: DataFrame, k: Int = 2): DataFrame = {
    val ls = lines(src)
    val union = idents(ls)
      .unionByName(docComments(ls))
      .unionByName(imports(ls))
    val ctx = fileContexts(ls, k)
    union
      .join(ctx, Seq("repo", "path", "commit", "line_no"))
      .select(
        xxhash64(col("repo"), col("path"), col("commit"), col("line_no"),
                 col("kind"), col("surface")).as("mention_id"),
        col("repo"), col("path"), col("commit"),
        col("line_no").as("line"), col("kind"), col("surface"),
        normalize(col("surface")).as("norm"),
        col("ctx_terms"))
      .dropDuplicates("mention_id")
  }
}
