package graft.kg

import org.apache.spark.sql.SparkSession

/** Dev tool (r6): prints the stage3 scoring plan joins/exchanges so the
  * materialization changes can be audited without the UI. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = CorpusGen.srcFiles(spark, 300).toDF()
    val pl = Extract.perLine(src)
    val mentions = Extract.mentionsFromLines(pl)
    val dict = Candidates.dictionary(CorpusGen.kbEntries(spark).toDF())
    val cands = Candidates.candidates(mentions, dict, broadcastDict = true)
    val scored = Scoring.top1(Scoring.score(mentions, cands,
      CorpusGen.kbContexts(spark).toDF(), Some(Extract.contexts(pl))))
    scored.collect()
    val p = scored.queryExecution.executedPlan.toString
    val interesting = p.linesIterator.filter(l =>
      l.contains("Join") || l.contains("Exchange") || l.contains("Aggregate") ||
      l.contains("Window") || l.contains("Sort "))
    interesting.foreach(l => println("[plan] " + l.trim.take(160)))
    spark.stop()
  }
}
