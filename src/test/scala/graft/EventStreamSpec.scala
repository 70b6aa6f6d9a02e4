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
}
