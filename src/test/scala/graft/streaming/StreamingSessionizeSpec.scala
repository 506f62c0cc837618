package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import java.nio.file.Files
import java.sql.Timestamp

/** Streaming sessionization: the replayed events corpus must produce the
  * SAME session rows as the batch form of the same operator — including
  * sessions that span micro-batch boundaries (the stateful merge) — and the
  * exact-gap boundary semantics are pinned against batch W4. */
class StreamingSessionizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("replayed events corpus: stream sessions ≡ batch sessions, byte-identical") {
    val srcDir = Files.createTempDirectory("sess_src").toString
    val outDir = Files.createTempDirectory("sess_out").toString + "/sessions"
    val ckpt = Files.createTempDirectory("sess_ckpt").toString

    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("user_id"), col("event_id"), col("ts").cast("timestamp").as("ts"),
              col("value"))
    val maxTs = events.agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)
    // split INSIDE some session: midpoint of the first within-gap consecutive
    // event pair of the busiest user — so at least one session must merge
    // across the micro-batch boundary
    val busiest = events.groupBy("user_id").count()
      .orderBy(col("count").desc, col("user_id")).first().getLong(0)
    val us = events.filter(col("user_id") === busiest)
      .select(unix_micros(col("ts"))).orderBy("unix_micros(ts)")
      .collect().map(_.getLong(0))
    val midTs = us.zip(us.tail).collectFirst {
      case (a, b) if b - a > 0 && b - a <= 1800L * 1000000L => (a + b) / 2
    }.getOrElse(sys.error("no within-gap pair to split"))

    // replay in two micro-batches split by time — sessions in flight at the
    // split must MERGE across batches in the state store — then a sentinel
    // far past every session's end advances the watermark so everything
    // emits (append mode emits a session only once it can no longer grow)
    val stream = spark.readStream
      .schema("user_id LONG, event_id LONG, ts TIMESTAMP, value DOUBLE")
      .parquet(srcDir)
    val q = StreamingSessionize(stream)
      .writeStream.outputMode("append").format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt).start()
    try {
      events.filter(unix_micros(col("ts")) <= midTs)
        .coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      events.filter(unix_micros(col("ts")) > midTs)
        .coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      Seq((-1L, -1L, new Timestamp(maxTs / 1000L + 10L * 3600 * 1000), 0.0))
        .toDF("user_id", "event_id", "ts", "value")
        .coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()

      def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.filter(col("user_id") >= 0)
          .select(col("user_id"), date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss"),
                  date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss"),
                  col("n_events"), col("total_value"))
          .collect().map(_.toString).sorted.toSeq

      val streamed = canon(spark.read.parquet(outDir))
      val batch = canon(StreamingSessionize(events))
      assert(streamed.nonEmpty && streamed == batch,
        s"stream=${streamed.size} batch=${batch.size} " +
        s"onlyStream=${(streamed diff batch).take(3)} onlyBatch=${(batch diff streamed).take(3)}")
      // cross-batch merge actually happened: users with events on both sides
      // of the split have FEWER sessions than the two halves independently
      val splitSessions =
        StreamingSessionize(events.filter(unix_micros(col("ts")) <= midTs)).count() +
        StreamingSessionize(events.filter(unix_micros(col("ts")) > midTs)).count()
      assert(streamed.size < splitSessions,
        s"no session spanned the micro-batch split (${streamed.size} vs $splitSessions)")
    } finally q.stop()
  }

  test("boundary semantics match batch W4: exactly-gap merges, gap+1s splits") {
    // two events exactly 30 min apart (merge on BOTH operators — gap must be
    // STRICTLY exceeded to split), one event 30 min + 1 s later (split)
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq((1L, 1L, t("2024-01-01 00:00:00"), 1.0),
                 (1L, 2L, t("2024-01-01 00:30:00"), 1.0),
                 (1L, 3L, t("2024-01-01 01:00:01"), 1.0))
      .toDF("user_id", "event_id", "ts", "value")
    val sessions = StreamingSessionize(ev).orderBy("session_start").collect()
    assert(sessions.length == 2, sessions.mkString("; "))
    assert(sessions(0).getAs[Long]("n_events") == 2)
    val w4 = graft.ops.RelOps.w4SessionizeFor(ev).collect()
    assert(w4.length == 2, w4.mkString("; "))
  }

  test("session membership ≡ batch W4 on the events corpus (ends differ by +gap)") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("user_id"), col("event_id"), col("ts").cast("timestamp").as("ts"),
              col("value"))
    // same split convention ⇒ identical sessions; W4 reports max(ts) as the
    // end where session_window reports last_ts+gap, so compare on the
    // end-independent columns (start, size, value sum)
    def key(df: org.apache.spark.sql.DataFrame, startCol: String) =
      df.select(col("user_id"), date_format(col(startCol), "yyyy-MM-dd HH:mm:ss"),
                col("n_events"), col("total_value"))
        .collect().map(_.toString).sorted.toSeq
    val sw = key(StreamingSessionize(events), "session_start")
    val w4 = key(graft.ops.RelOps.w4SessionizeFor(events), "session_start")
    assert(sw.nonEmpty && sw == w4,
      s"onlySW=${(sw diff w4).take(3)} onlyW4=${(w4 diff sw).take(3)}")
  }
}
