package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Structured Streaming analytics: windowed aggregation (streaming run ==
  * batch plan) and gap sessionization (flatMapGroupsWithState output ==
  * the batch gaps-and-islands twin, up to watermark-closure of each user's
  * final session).
  */
class EventStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"
  private val gapMs = 30 * 60000L

  test("streaming windowed counts (complete mode) == batch aggregate") {
    val batchDf = spark.read.parquet(s"$sf/events.parquet")
    val expected = EventStream.windowedTypeCounts(batchDf)
      .orderBy("window_start_ms", "event_type").collect().toSeq
    val got = EventStream.runWindowedOverParquet(spark, s"$sf/events.parquet")
      .orderBy("window_start_ms", "event_type").collect().toSeq
    assert(got.nonEmpty)
    assert(got == expected)
  }

  test("streaming sessionize == batch sessions, minus only not-yet-closed tails") {
    import spark.implicits._
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val events = spark.readStream.schema(schema)
      .parquet(EventStream.streamableDir(s"$sf/events.parquet"))
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[EventStream.Event]

    val q = EventStream.sessionize(spark, events)
      .writeStream.format("memory").queryName("graft_sessions_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("graft_sessions_test")
      .as[EventStream.Session].collect()
      .map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime, s.n_events))
      .toSet

    val batch = EventStream.sessionizeBatch(spark.read.parquet(s"$sf/events.parquet"))
      .select(col("user_id"), col("session_start_ms"),
        col("session_end_ms"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet

    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch),
      s"streaming emitted sessions absent from batch: ${(streamed -- batch).take(3)}")

    // a batch session may be missing from the stream ONLY if it is its
    // user's final session and the final watermark (max ts - 1 s) has not
    // yet passed session_end + gap (2 s slack for timeout strictness)
    val wm = spark.read.parquet(s"$sf/events.parquet")
      .agg(max(unix_millis(col("ts").cast("timestamp")))).as[Long].head() - 1000L
    val lastOfUser = batch.groupBy(_._1).map { case (_, ss) => ss.maxBy(_._3) }.toSet
    (batch -- streamed).foreach { s =>
      assert(lastOfUser.contains(s) && s._3 + gapMs + 2000 >= wm,
        s"closed session missing from streaming output: $s")
    }
    // most sessions are closed well before the end of the corpus
    assert(streamed.size >= batch.size - lastOfUser.size)
  }

  test("streaming dedup (dropDuplicates) == batch DISTINCT on the key") {
    import spark.implicits._
    val streamed = EventStream.runDedupOverParquet(
        spark, s"$sf/events.parquet", Seq("user_id", "event_type"))
      .as[(Long, String)].collect().toSet
    val batch = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id", "event_type").distinct()
      .as[(Long, String)].collect().toSet
    assert(streamed == batch)
  }

  test("dedupWithinWatermark evicts state: a key repeated past the watermark re-emits") {
    import spark.implicits._
    // static-frame semantics check of the plan's dedup column set (the
    // watermark-eviction behavior itself is runtime): duplicates inside one
    // batch collapse to the first arrival
    val rows = Seq(
      (1L, "2024-01-01 00:00:00", 7L, "click", 1.0),
      (2L, "2024-01-01 00:00:30", 7L, "click", 2.0), // dup within watermark
      (3L, "2024-01-01 02:00:00", 8L, "view", 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-wm").toString
    rows.coalesce(1).write.mode("overwrite").parquet(dir)
    val queryName = "graft_dedup_wm_test"
    val schema = spark.read.parquet(dir).schema
    val q = EventStream.dedupWithinWatermark(
        spark.readStream.schema(schema).parquet(dir),
        Seq("user_id", "event_type"), "10 minutes")
      .select("user_id", "event_type", "event_id")
      .writeStream.format("memory").queryName(queryName)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table(queryName)
      .select("user_id", "event_type").as[(Long, String)].collect().toSet
    assert(out == Set((7L, "click"), (8L, "view")))
  }
}
