package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.index.{IndexBuilder, IndexConfig, SourceFile}

/** Continuous ingestion via Structured Streaming.
  *
  * The reference is batch-update by design (`ARCHITECTURE.md:31`): documents
  * accumulate in an `IndexWriter` and become searchable at `commit()`
  * boundaries, with readers reloading on commit
  * (`ReloadPolicy::OnCommitWithDelay`, `src/reader/mod.rs:21-30`). The
  * Spark-native equivalent is exactly a `foreachBatch` sink: one micro-batch
  * == one commit — each micro-batch is appended as a fresh set of immutable
  * segments and the manifest is atomically republished, so a reader that
  * re-pins the manifest (a new `Searcher`) sees each commit point.
  *
  * There are no watermark/late-data semantics to match (the reference has
  * none): ingestion is append-only and ordering within a micro-batch is
  * normalized by the builder's deterministic docId assignment.
  *
  * Compaction: run `Merger.compact` between commits (the reference's merge
  * threads), keeping segment counts bounded under LogMergePolicy.
  */
object StreamIngest {

  /** Start ingesting a stream of SourceFile rows into `indexDir`.
    * Each micro-batch calls `IndexBuilder.append` — new segIds, new batch
    * directory, manifest republish (write-new + rename, atomic).
    */
  def start(spark: SparkSession, stream: Dataset[SourceFile], indexDir: String,
            cfg: IndexConfig = IndexConfig(),
            trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[SourceFile], batchId: Long) =>
        commitBatch(spark, batch.toDF(), indexDir, cfg, batchId)
      }
      .start()

  /** [[start]] for an arbitrary-schema streaming DataFrame (multi-field
    * schemas carry extra columns beyond SourceFile — typed fields, arrays,
    * JSON — which the builder indexes per its IndexConfig). Named rather
    * than overloaded: `Dataset[SourceFile]` and `DataFrame` erase to the
    * same JVM signature.
    */
  def startDf(spark: SparkSession, stream: DataFrame, indexDir: String,
              cfg: IndexConfig = IndexConfig(),
              trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        commitBatch(spark, batch.toDF(), indexDir, cfg, batchId)
      }
      .start()

  /** One micro-batch commit (exposed for tests / manual batching). */
  def commitBatch(spark: SparkSession, batch: DataFrame, indexDir: String,
                  cfg: IndexConfig, batchId: Long): Unit = {
    if (!batch.isEmpty) {
      IndexBuilder.append(spark, batch, indexDir, cfg)
      ()
    }
  }
}
