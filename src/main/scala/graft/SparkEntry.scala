package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.DocOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 (or a
  * training-data-pipeline operator), expressed Spark-first over the driver
  * testdata; [[oracleSql]] carries the equivalent DuckDB SQL the driver runs
  * over the same parquet tables. Column names and value representations are
  * kept identical on both sides (the driver sorts columns by name and hashes
  * values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    DocOps.e7Union(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 scans / §2.2 filters
    "s1_corpus_scan" -> DocOps.s1CorpusScan _,
    "f1_filter"      -> DocOps.f1Filter _,
    "f3_sha256"      -> DocOps.f3Sha256 _,
    // §2.3 extraction
    "e1_word_positions" -> DocOps.e1WordPositions _,
    "e2_identifiers"    -> DocOps.e2Identifiers _,
    "e3_doccomments"    -> DocOps.e3DocComments _,
    "e4_imports"        -> DocOps.e4Imports _,
    "e5_normalize"      -> DocOps.e5Normalize _,
    "e6_context_window" -> DocOps.e6ContextWindow _,
    "e7_union_extractors" -> DocOps.e7Union _,
    "e8_mention_id"     -> DocOps.e8MentionId _,
    // classic agg baseline
    "q1_agg" -> ((s: SparkSession, dir: String) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
             round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
             round(avg(col("l_discount")), 6).as("avg_disc"),
             count(lit(1)).as("cnt"))),
  )

  private val C = DocOps.SrcFilesCte

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "s1_corpus_scan" ->
      s"""WITH $C
         |SELECT repo, path, "commit", lang, CAST(length(content) AS INT) AS content_len FROM src_files""".stripMargin,
    "f1_filter" ->
      s"""WITH $C
         |SELECT repo, path, lang, doc_id FROM src_files
         |WHERE lang IN ('en','de','fr') AND content IS NOT NULL AND length(content) < 1500""".stripMargin,
    "f3_sha256" ->
      s"""WITH $C
         |SELECT doc_id, sha256(content) AS sha FROM src_files""".stripMargin,
    "e1_word_positions" ->
      s"""WITH $C,
         |parts AS (SELECT doc_id, string_split(content, ' ') AS p FROM src_files),
         |ex AS (SELECT doc_id, CAST(unnest(range(len(p))) AS INT) AS pos, unnest(p) AS word FROM parts)
         |SELECT doc_id, pos, word FROM ex WHERE length(word) > 0""".stripMargin,
    "e2_identifiers" ->
      s"""WITH $C,
         |ex AS (SELECT doc_id, repo, path, unnest(regexp_extract_all(lower(content), '[a-z_][a-z0-9_]{2,}')) AS surface FROM src_files)
         |SELECT doc_id, repo, path, surface FROM ex WHERE surface NOT IN ('the','and','for','not')""".stripMargin,
    "e3_doccomments" ->
      s"""WITH $C,
         |c AS (SELECT doc_id, '// ' || content AS line FROM src_files WHERE doc_id % 2 = 0),
         |cm AS (SELECT doc_id, regexp_extract(line, '^// (.*)$$', 1) AS comment FROM c),
         |f AS (SELECT doc_id, comment FROM cm WHERE length(comment) > 0)
         |SELECT doc_id, unnest(regexp_extract_all(lower(comment), '[a-z_][a-z0-9_]{2,}')) AS surface FROM f""".stripMargin,
    "e4_imports" ->
      s"""WITH $C,
         |c AS (SELECT doc_id, 'import pkg' || CAST(doc_id % 5 AS VARCHAR) || '.mod' || CAST(doc_id % 3 AS VARCHAR) AS line FROM src_files WHERE doc_id % 3 = 0),
         |t AS (SELECT doc_id, regexp_extract(line, '^import ([a-z0-9_.]+)', 1) AS target FROM c)
         |SELECT doc_id, target FROM t WHERE length(target) > 0""".stripMargin,
    "e5_normalize" ->
      s"""WITH $C,
         |ex AS (SELECT unnest(regexp_extract_all(lower(content), '[a-z_][a-z0-9_]{2,}')) AS term FROM src_files),
         |terms AS (SELECT DISTINCT term FROM ex WHERE term NOT IN ('the','and','for','not')),
         |s AS (SELECT term, 'get' || upper(substr(term,1,1)) || substr(term,2) || '_id' AS surface FROM terms)
         |SELECT term, surface,
         |  trim(regexp_replace(regexp_replace(lower(regexp_replace(surface, '([a-z0-9])([A-Z])', '\\1 \\2', 'g')), '[_.]', ' ', 'g'), ' +', ' ', 'g')) AS norm
         |FROM s""".stripMargin,
    "e6_context_window" ->
      s"""WITH $C,
         |parts AS (SELECT doc_id, string_split(content, ' ') AS p FROM src_files),
         |ex AS (SELECT doc_id, CAST(unnest(range(len(p))) AS INT) AS pos, unnest(p) AS word FROM parts),
         |w AS (SELECT doc_id, pos, word FROM ex WHERE length(word) > 0)
         |SELECT doc_id, pos, word,
         |  concat_ws(' ', lag(word,2) OVER win, lag(word,1) OVER win, lead(word,1) OVER win, lead(word,2) OVER win) AS ctx
         |FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY pos)""".stripMargin,
    "e7_union_extractors" ->
      s"""WITH $C,
         |i AS (SELECT doc_id, surface FROM (SELECT doc_id, unnest(regexp_extract_all(lower(content), '[a-z_][a-z0-9_]{2,}')) AS surface FROM src_files) WHERE surface NOT IN ('the','and','for','not')),
         |dc AS (SELECT doc_id, unnest(regexp_extract_all(lower(regexp_extract('// ' || content, '^// (.*)$$', 1)), '[a-z_][a-z0-9_]{2,}')) AS surface FROM src_files WHERE doc_id % 2 = 0),
         |im AS (SELECT doc_id, regexp_extract('import pkg' || CAST(doc_id % 5 AS VARCHAR) || '.mod' || CAST(doc_id % 3 AS VARCHAR), '^import ([a-z0-9_.]+)', 1) AS surface FROM src_files WHERE doc_id % 3 = 0)
         |SELECT doc_id, surface, 'ident' AS kind FROM i
         |UNION ALL SELECT doc_id, surface, 'doccomment' AS kind FROM dc
         |UNION ALL SELECT doc_id, surface, 'import' AS kind FROM im WHERE length(surface) > 0""".stripMargin,
    "e8_mention_id" ->
      s"""WITH $C,
         |parts AS (SELECT doc_id, repo, path, "commit", string_split(content, ' ') AS p FROM src_files),
         |ex AS (SELECT doc_id, repo, path, "commit", CAST(unnest(range(len(p))) AS INT) AS pos, unnest(p) AS word FROM parts),
         |f AS (SELECT * FROM ex WHERE length(word) > 0)
         |SELECT doc_id, pos, md5(repo || '|' || path || '|' || "commit" || '|' || CAST(pos AS VARCHAR) || '|' || word) AS mention_id FROM f""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
        |  round(sum(l_extendedprice * (1.0 - l_discount)),2) AS sum_disc_price,
        |  round(avg(l_discount),6) AS avg_disc, CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
  )
}
