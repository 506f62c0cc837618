package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{DocOps, RelOps}

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
    // §2.1 KB scan / §2.4 joins
    "s2_kb_dictionary"   -> RelOps.s2Kb _,
    "j1_candidates"      -> RelOps.j1Candidates _,
    "j2_salted_candidates" -> RelOps.j2SaltedCandidates _,
    "j3_nil_mentions"    -> RelOps.j3NilMentions _,
    "j4_docs_with_candidates" -> RelOps.j4DocsWithCandidates _,
    "j5_cosine_score"    -> RelOps.j5CosineScore _,
    "j6_eval_pr"         -> RelOps.j6Eval _,
    "j7_sha_check"       -> RelOps.j7ShaCheck _,
    // §2.5 aggregations
    "a1_tf"              -> RelOps.a1Tf _,
    "a2_idf"             -> RelOps.a2Idf _,
    "a3_norms"           -> RelOps.a3Norms _,
    "a4_cosine_query"    -> RelOps.a4CosineQuery _,
    "a5_majority_vote"   -> RelOps.a5MajorityVote _,
    "a6_hot_keys"        -> RelOps.a6HotKeys _,
    "a7_lineage_rollup"  -> RelOps.a7LineageRollup _,
    "a8_distinct"        -> RelOps.a8Distinct _,
    "a9_counters"        -> RelOps.a9Counters _,
    // §2.6 windows, §2.7 sort/limit, §2.8 set ops
    "w1_top1_candidate"  -> RelOps.w1Top1 _,
    "w2_moving_sum"      -> RelOps.w2MovingSum _,
    "w3_rank_prior"      -> RelOps.w3RankPrior _,
    "u2_except_resume"   -> RelOps.u2ExceptResume _,
    "u3_sha_except"      -> RelOps.u3ShaExcept _,
    "u4_intersect"       -> RelOps.u4Intersect _,
    "o3_global_topk"     -> RelOps.o3GlobalTopK _,
    "q3_join_agg"        -> RelOps.q3JoinAgg _,
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
  private val T = RelOps.TermsCte
  private val M = RelOps.MentionsCte
  private val K = RelOps.KbCte
  /** Shared tf-idf CTE chain (documents as the corpus). */
  private val TfIdf =
    s"""$T,
       |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM terms GROUP BY doc_id, term),
       |idf AS (SELECT term, ln(((SELECT count(*) FROM documents) + 1.0) / (count(DISTINCT doc_id) + 1)) + 1.0 AS idf FROM terms GROUP BY term),
       |tw AS (SELECT tf.doc_id, tf.term, tf.tf * idf.idf AS w FROM tf JOIN idf ON tf.term = idf.term)""".stripMargin

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
    "s2_kb_dictionary" ->
      s"""WITH $T, $K
         |SELECT entity_id, label, prior FROM kb""".stripMargin,
    "j1_candidates" ->
      s"""WITH $T, $M, $K
         |SELECT m.doc_id, m.surface, k.entity_id FROM mentions m JOIN kb k ON m.surface = k.label""".stripMargin,
    "j2_salted_candidates" ->
      s"""WITH $T, $M, $K
         |SELECT m.doc_id, m.surface, k.entity_id FROM mentions m JOIN kb k ON m.surface = k.label""".stripMargin,
    "j3_nil_mentions" ->
      s"""WITH $T, $M, $K
         |SELECT DISTINCT surface FROM mentions WHERE surface NOT IN (SELECT label FROM kb)""".stripMargin,
    "j4_docs_with_candidates" ->
      s"""WITH $C, $T, $M, $K
         |SELECT doc_id, repo, path FROM src_files
         |WHERE doc_id IN (SELECT m.doc_id FROM mentions m JOIN kb k ON m.surface = k.label)""".stripMargin,
    "j5_cosine_score" ->
      s"""WITH $T, $K,
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM terms GROUP BY doc_id, term),
         |dwl AS (SELECT DISTINCT k.entity_id, t.doc_id FROM terms t JOIN kb k ON t.term = k.label),
         |co AS (SELECT d.entity_id, t.term, CAST(count(*) AS BIGINT) AS cnt
         |       FROM dwl d JOIN terms t ON d.doc_id = t.doc_id GROUP BY d.entity_id, t.term),
         |ctx AS (SELECT entity_id, term, CAST(cnt AS DOUBLE) AS we FROM (
         |          SELECT entity_id, term, cnt, row_number() OVER (PARTITION BY entity_id ORDER BY cnt DESC, term) AS rn FROM co)
         |        WHERE rn <= 10),
         |dv AS (SELECT doc_id, term, CAST(tf AS DOUBLE) AS wd FROM tf),
         |dn AS (SELECT doc_id, sqrt(sum(wd*wd)) AS dn FROM dv GROUP BY doc_id),
         |en AS (SELECT entity_id, sqrt(sum(we*we)) AS en FROM ctx GROUP BY entity_id),
         |dot AS (SELECT dv.doc_id, ctx.entity_id, sum(dv.wd * ctx.we) AS dot
         |        FROM dv JOIN ctx ON dv.term = ctx.term GROUP BY dv.doc_id, ctx.entity_id)
         |SELECT dot.doc_id, dot.entity_id, round(dot.dot / (dn.dn * en.en), 4) AS score
         |FROM dot JOIN dn ON dot.doc_id = dn.doc_id JOIN en ON dot.entity_id = en.entity_id""".stripMargin,
    "j6_eval_pr" ->
      s"""WITH $T, $K,
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM terms GROUP BY doc_id, term),
         |emitted AS (SELECT doc_id, entity_id FROM (
         |  SELECT tf.doc_id, k.entity_id, tf.tf, row_number() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf DESC, k.entity_id) AS rn
         |  FROM tf JOIN kb k ON tf.term = k.label) WHERE rn = 1),
         |gold AS (SELECT doc_id, entity_id FROM (
         |  SELECT tf.doc_id, k.entity_id, tf.tf, row_number() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf DESC, k.entity_id) AS rn
         |  FROM tf JOIN kb k ON tf.term = k.label WHERE k.entity_id <= 10) WHERE rn = 1),
         |j AS (SELECT e.doc_id AS ed, g.doc_id AS gd FROM emitted e FULL OUTER JOIN gold g
         |      ON e.doc_id = g.doc_id AND e.entity_id = g.entity_id)
         |SELECT CAST(sum(CASE WHEN ed IS NOT NULL AND gd IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS matched,
         |       CAST(sum(CASE WHEN ed IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS emitted_cnt,
         |       CAST(sum(CASE WHEN gd IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS gold_cnt,
         |       round(CAST(sum(CASE WHEN ed IS NOT NULL AND gd IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |             / sum(CASE WHEN ed IS NOT NULL THEN 1 ELSE 0 END), 6) AS precision,
         |       round(CAST(sum(CASE WHEN ed IS NOT NULL AND gd IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |             / sum(CASE WHEN gd IS NOT NULL THEN 1 ELSE 0 END), 6) AS recall
         |FROM j""".stripMargin,
    "j7_sha_check" ->
      s"""WITH $C
         |SELECT CAST(count(*) AS BIGINT) AS mismatches
         |FROM (SELECT doc_id, sha256(content) AS sha_a FROM src_files) a
         |JOIN (SELECT doc_id, sha256(content) AS sha_b FROM src_files) b USING (doc_id)
         |WHERE sha_a <> sha_b""".stripMargin,
    "a1_tf" ->
      s"""WITH $T
         |SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM terms GROUP BY doc_id, term""".stripMargin,
    "a2_idf" ->
      s"""WITH $T
         |SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
         |       round(ln(((SELECT count(*) FROM documents) + 1.0) / (count(DISTINCT doc_id) + 1)) + 1.0, 6) AS idf
         |FROM terms GROUP BY term""".stripMargin,
    "a3_norms" ->
      s"""WITH $TfIdf
         |SELECT doc_id, round(sqrt(sum(w*w)), 6) AS l2_norm FROM tw GROUP BY doc_id""".stripMargin,
    "a4_cosine_query" ->
      s"""WITH $TfIdf,
         |q AS (SELECT term, idf AS wq FROM idf WHERE term IN ('spark','join','data')),
         |qn AS (SELECT sqrt(sum(wq*wq)) AS qn FROM q),
         |dn AS (SELECT doc_id, sqrt(sum(w*w)) AS dn FROM tw GROUP BY doc_id),
         |dot AS (SELECT tw.doc_id, sum(tw.w * q.wq) AS dot FROM tw JOIN q ON tw.term = q.term GROUP BY tw.doc_id)
         |SELECT dot.doc_id, round(dot.dot / (dn.dn * qn.qn), 4) AS cos
         |FROM dot JOIN dn ON dot.doc_id = dn.doc_id CROSS JOIN qn""".stripMargin,
    "a5_majority_vote" ->
      s"""WITH v AS (SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z_][a-z0-9_]{2,}')) AS term FROM documents),
         |c AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY lang, term)
         |SELECT lang, term AS top_term, cnt FROM (
         |  SELECT lang, term, cnt, row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term) AS rn FROM c)
         |WHERE rn = 1""".stripMargin,
    "a6_hot_keys" ->
      s"""WITH $T,
         |c AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM terms GROUP BY term)
         |SELECT term, cnt FROM (SELECT term, cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rn FROM c)
         |WHERE rn <= 10""".stripMargin,
    "a7_lineage_rollup" ->
      s"""WITH $C,
         |tok AS (SELECT repo, path, unnest(regexp_extract_all(lower(content), '[a-z_][a-z0-9_]{2,}')) AS term FROM src_files)
         |SELECT repo, CAST(count(DISTINCT path) AS BIGINT) AS files, CAST(count(*) AS BIGINT) AS token_rows
         |FROM tok GROUP BY repo""".stripMargin,
    "a8_distinct" ->
      "SELECT DISTINCT lang, source FROM documents",
    "a9_counters" ->
      """SELECT CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
        |       CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |       CAST(sum(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS BIGINT) AS hi_qty
        |FROM lineitem""".stripMargin,
    "w1_top1_candidate" ->
      s"""WITH $T, $K,
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM terms GROUP BY doc_id, term)
         |SELECT doc_id, entity_id, tf FROM (
         |  SELECT tf.doc_id, k.entity_id, tf.tf, row_number() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf DESC, k.entity_id) AS rn
         |  FROM tf JOIN kb k ON tf.term = k.label)
         |WHERE rn = 1""".stripMargin,
    "w2_moving_sum" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity, l_extendedprice, l_partkey, l_suppkey ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 2) AS moving_qty
        |FROM lineitem""".stripMargin,
    "w3_rank_prior" ->
      s"""WITH $T, $K
         |SELECT entity_id, label, prior, CAST(rank() OVER (ORDER BY prior DESC, label) AS BIGINT) AS rnk FROM kb""".stripMargin,
    "u2_except_resume" ->
      s"""WITH $C
         |SELECT repo FROM src_files EXCEPT SELECT repo FROM src_files WHERE lang = 'en'""".stripMargin,
    "u3_sha_except" ->
      s"""WITH $C
         |SELECT CAST((SELECT count(*) FROM (SELECT sha256(content) AS sha FROM src_files EXCEPT SELECT sha256(content) FROM src_files)) AS BIGINT) AS a_minus_b,
         |       CAST((SELECT count(*) FROM (SELECT sha256(content) AS sha FROM src_files EXCEPT SELECT sha256(content) FROM src_files)) AS BIGINT) AS b_minus_a""".stripMargin,
    "u4_intersect" ->
      """SELECT source FROM documents WHERE lang = 'en'
        |INTERSECT
        |SELECT source FROM documents WHERE n_chars > 300""".stripMargin,
    "o3_global_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "q3_join_agg" ->
      """SELECT c_mktsegment, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |       CAST(count(*) AS BIGINT) AS cnt
        |FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
        |  round(sum(l_extendedprice * (1.0 - l_discount)),2) AS sum_disc_price,
        |  round(avg(l_discount),6) AS avg_disc, CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
  )
}
