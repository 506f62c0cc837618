package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Context-based disambiguation (SURVEY.md §2.5 A1–A4, J5, W1/W3): score each
  * (mention, candidate entity) pair with TF-IDF/cosine between the mention's
  * ±k-line context terms and the entity's KB context vector, then keep the
  * top-1 per mention (deterministic tie-break), falling back to the lookup
  * prior when the context carries no signal.
  *
  * All relational — join + two-phase hash aggregation; no UDAF, so partial
  * (map-side) aggregation and whole-stage codegen apply. The scoring join is
  * explicitly repartitioned by mention hash (north_star mandate) so the
  * tf/norm/dot aggregations reuse one exchange.
  *
  * Determinism: float sums depend on partition order, so ranking compares
  * scores rounded to 1e-9 with entity_id as total tie-break — output is
  * stable across partition counts (tested local[2] vs local[8]).
  */
object Scoring {

  /** exactIdf=false switches DF counting to approx_count_distinct (HLL) —
    * the 10^12-row path; exact at test scale. */
  def score(mentions: DataFrame, candidates: DataFrame, kbCtx: DataFrame,
            exactIdf: Boolean = true, shufflePartitions: Int = 0): DataFrame = {
    // A1: term frequency per mention context — repartition by mention hash
    // up front; tf, norms and the dot aggregation all reuse this exchange.
    val base = mentions.select(col("mention_id"), explode(col("ctx_terms")).as("term"))
    val repart = if (shufflePartitions > 0) base.repartition(shufflePartitions, col("mention_id"))
                 else base.repartition(col("mention_id"))
    val tf = repart.groupBy(col("mention_id"), col("term")).agg(count(lit(1)).as("tf"))

    // A2: document frequency / IDF over the mention-context corpus
    val nMentions = mentions.agg(countDistinct(col("mention_id")).as("n"))
    val dfCol = if (exactIdf) countDistinct(col("mention_id")) else approx_count_distinct(col("mention_id"))
    val idf = tf.groupBy(col("term")).agg(dfCol.as("df"))
      .crossJoin(broadcast(nMentions))
      .select(col("term"), (log((col("n") + 1).cast("double") / (col("df") + 1)) + 1.0).as("idf"))

    val wM = tf.join(idf, "term")
      .select(col("mention_id"), col("term"), (col("tf") * col("idf")).as("wm"))

    // A3: L2 norms
    val mNorm = wM.groupBy(col("mention_id")).agg(sqrt(sum(col("wm") * col("wm"))).as("m_norm"))
    val eNorm = kbCtx.groupBy(col("entity_id")).agg(sqrt(sum(col("weight") * col("weight"))).as("e_norm"))

    // J5 + A4: candidate-restricted scoring join → cosine
    val pairTerms = candidates.join(wM, "mention_id")
      .join(kbCtx, Seq("entity_id", "term"))
    val dot = pairTerms.groupBy(col("mention_id"), col("entity_id"))
      .agg(sum(col("wm") * col("weight")).as("dot"))
    val cosine = dot
      .join(mNorm, "mention_id")
      .join(broadcast(eNorm), "entity_id")
      .select(col("mention_id"), col("entity_id"),
              (col("dot") / (col("m_norm") * col("e_norm"))).as("score"))

    // W3 fallback: candidates with no shared context terms rank by prior,
    // scaled below any real cosine so context evidence always wins.
    val noCtx = candidates.join(dot.select(col("mention_id"), col("entity_id")),
                                Seq("mention_id", "entity_id"), "left_anti")
      .select(col("mention_id"), col("entity_id"), (col("prior") * 1e-9).as("score"))

    cosine.unionByName(noCtx)
  }

  /** W1: argmax-score candidate per mention, deterministic. */
  def top1(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("mention_id"))
      .orderBy(round(col("score"), 9).desc, col("entity_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("mention_id"), col("entity_id"), round(col("score"), 9).as("score"))
  }
}
