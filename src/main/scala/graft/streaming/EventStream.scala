package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming analytics over the events stream: watermarked
  * windowed aggregation and custom sessionization state — the streaming
  * surface beyond index ingestion (StreamIngest).
  *
  * Scale notes: both operators are keyed-state streaming aggregations; state
  * is partitioned by the grouping key across executors (RocksDB/HDFS state
  * store in production), watermarks bound state size (windows/sessions older
  * than the watermark are evicted), and the same code runs unchanged on a
  * 1000-executor cluster — the file/memory source+sink here are only the
  * test harness.
  */
object EventStream {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long)

  /** Hourly tumbling-window counts + exact cents sums per event type, with a
    * watermark for append-mode state eviction. value sums are scaled to
    * integer cents so batch/streaming/oracle agree exactly.
    */
  def windowedTypeCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      // parquet timestamps are NTZ; watermarks need LTZ (identity under the
      // session's UTC zone). Epoch-millis output keeps the driver/oracle
      // comparison integer-exact.
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .select(unix_millis(col("w.start")).as("window_start_ms"), col("event_type"),
        col("n"), col("sum_cents"))

  /** Gap-based sessionization via flatMapGroupsWithState with event-time
    * timeout (the `KeyValueGroupedDataset` custom-state surface): a session
    * is a maximal run of a user's events with inter-event gaps < `gapMin`
    * minutes. Sessions emit when the watermark passes session_end + gap
    * (event-time timeout), i.e. when no in-order event can extend them.
    *
    * Within a micro-batch, events may arrive unordered; the state keeps the
    * OPEN session only, so correctness requires per-batch sorting here plus
    * the watermark guarantee across batches — the standard streaming
    * sessionization contract.
    */
  def sessionize(spark: SparkSession, events: Dataset[Event],
                 gapMin: Int = 30): Dataset[Session] = {
    import spark.implicits._
    val gapMs = gapMin * 60000L

    def update(userId: Long, rows: Iterator[Event],
               state: GroupState[(Long, Long, Long)]): Iterator[Session] = {
      // state = (startMs, endMs, count) of the open session
      val sorted = rows.toArray.sortBy(_.ts.getTime)
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      if (state.hasTimedOut) {
        val (s, e, n) = state.get
        out += Session(userId, new java.sql.Timestamp(s), new java.sql.Timestamp(e), n)
        state.remove()
      }
      var cur: Option[(Long, Long, Long)] = state.getOption
      sorted.foreach { ev =>
        val t = ev.ts.getTime
        cur match {
          case Some((s, e, n)) if t - e < gapMs => cur = Some((s, math.max(e, t), n + 1))
          case Some((s, e, n)) =>
            out += Session(userId, new java.sql.Timestamp(s), new java.sql.Timestamp(e), n)
            cur = Some((t, t, 1L))
          case None => cur = Some((t, t, 1L))
        }
      }
      cur.foreach { c =>
        state.update(c)
        state.setTimeoutTimestamp(c._2 + gapMs)
      }
      out.iterator
    }

    events
      .withWatermark("ts", "1 second")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** Batch twin of [[sessionize]]: gaps-and-islands over a window, with the
    * SAME millisecond arithmetic as the streaming state machine (stream-side
    * timestamps go through `Timestamp.getTime`, which truncates micros), so
    * batch == streaming-closed-sessions exactly. One shuffle, keyed by
    * user_id — the standard scalable sessionization plan.
    */
  def sessionizeBatch(events: DataFrame, gapMin: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapMs = gapMin * 60000L
    val byUser = Window.partitionBy("user_id").orderBy("ms")
    events
      .select(col("user_id"), unix_millis(col("ts").cast("timestamp")).as("ms"))
      .withColumn("brk", when(lag(col("ms"), 1).over(byUser).isNull
        .or(col("ms") - lag(col("ms"), 1).over(byUser) >= gapMs), 1L).otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min(col("ms")).as("session_start_ms"),
        max(col("ms")).as("session_end_ms"),
        count(lit(1)).as("n_events"))
      .drop("sid")
  }

  private val nameCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The streaming file source lists a DIRECTORY; the test tables are single
    * parquet files, so symlink a bare file into a temp dir (zero-copy).
    * Real deployments point at a table directory and this is a no-op.
    */
  def streamableDir(parquetPath: String): String = {
    val src = new java.io.File(parquetPath)
    if (!src.isFile) parquetPath
    else {
      val d = java.nio.file.Files.createTempDirectory("graft-stream-src")
      java.nio.file.Files.createSymbolicLink(d.resolve(src.getName), src.toPath)
      d.toString
    }
  }

  /** Streaming exact deduplication — the pipeline's `dedup_exact` as a
    * stream: `dropDuplicates` over the key columns keeps the first arrival
    * per key, with per-key state hash-partitioned across executors. Only
    * the KEY columns are projected, so the output is deterministic (which
    * duplicate row survives arrival order is not). For unbounded feeds use
    * [[dedupWithinWatermark]], which bounds the state instead of keeping
    * every key forever.
    */
  def runDedupOverParquet(spark: SparkSession, parquetPath: String,
                          keys: Seq[String]): DataFrame = {
    val queryName = s"graft_stream_dedup_${nameCounter.incrementAndGet()}"
    val schema = spark.read.parquet(parquetPath).schema
    val stream = spark.readStream.schema(schema).parquet(streamableDir(parquetPath))
    val q = stream
      .select(keys.map(col): _*)
      .dropDuplicates(keys)
      .writeStream.format("memory").queryName(queryName)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Watermark-bounded streaming dedup (`dropDuplicatesWithinWatermark`):
    * a key's state is evicted once the watermark passes its event time, so
    * state size tracks the duplication window, not the stream length — the
    * 100 TB-feed shape, where duplicates cluster in time. Two rows with the
    * same key count as duplicates only while the earlier one's state is
    * still live.
    */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
                           watermark: String): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Drive a bounded file-source stream to completion and return the
    * windowed aggregate as a static frame (memory sink, complete mode —
    * every window emits regardless of the final watermark, so the result
    * equals the batch computation exactly).
    */
  def runWindowedOverParquet(spark: SparkSession, parquetPath: String): DataFrame = {
    val queryName = s"graft_stream_win_${nameCounter.incrementAndGet()}"
    val schema = spark.read.parquet(parquetPath).schema
    val stream = spark.readStream.schema(schema).parquet(streamableDir(parquetPath))
    val q = windowedTypeCounts(stream)
      .writeStream.format("memory").queryName(queryName)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
