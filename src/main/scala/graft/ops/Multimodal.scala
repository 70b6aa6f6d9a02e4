package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract /
  * frame-sample stages as typed `mapPartitions` over the binary batches.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked deterministic STUB (`decodeStub`): it
  * derives fake width/height/frame-count from the bytes. Everything around
  * it — the binary schema, the per-partition batch iteration, the typed
  * output schema, the frame-sampling explode — is real Spark plumbing and
  * is tested; swapping `decodeStub` for a JNI/FFM codec is a one-function
  * change.
  *
  * Scale notes: binary payloads ride Parquet byte arrays; `mapPartitions`
  * keeps one decoded item in memory at a time (no per-partition
  * materialization); frame sampling explodes to (doc, frame) rows whose
  * count is bounded by `step`.
  */
object Multimodal {

  final case class Blob(doc_id: Long, blob: Array[Byte])

  /** Decoded media metadata (the "feature extraction" output schema). */
  final case class MediaMeta(doc_id: Long, byte_len: Long, first_byte: Long,
                             width: Long, height: Long, n_frames: Long)

  /** STUB decoder — deterministic fake of an image/video header parse.
    * Real implementation would hand `bytes` to a codec; the fake derives
    * the same fields from the payload so tests are reproducible.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val len = bytes.length.toLong
    val first = if (bytes.isEmpty) 0L else (bytes(0) & 0xff).toLong
    MediaMeta(
      doc_id = id,
      byte_len = len,
      first_byte = first,
      width = len % 640 + 16,
      height = (first * 7) % 480 + 16,
      n_frames = len % 40 + 5)
  }

  /** Binary ingestion: a text column standing in for a media payload
    * (UTF-8 bytes). With real data this is `spark.read.format("binaryFile")`
    * or a Parquet binary column.
    */
  def asBlobs(df: DataFrame, idCol: String, payloadCol: String)
             (implicit spark: SparkSession): Dataset[Blob] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
        encode(col(payloadCol), "UTF-8").as("blob")).as[Blob]
  }

  /** Decode / feature-extract stage: one pass, partition-parallel. */
  def decodeAll(blobs: Dataset[Blob])(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    blobs.mapPartitions(_.map(b => decodeStub(b.doc_id, b.blob)))
  }

  /** Frame sampling: every `step`-th frame index of each decoded item.
    * Output (doc_id, frame_idx) — the row-per-frame table a downstream
    * vision model consumes.
    */
  def sampleFrames(meta: Dataset[MediaMeta], step: Int): DataFrame =
    meta.toDF().select(col("doc_id"),
      explode(sequence(lit(0L), col("n_frames") - 1, lit(step.toLong))).as("frame_idx"))

  /** Aspect-preserving fit of (w, h) into (maxW, maxH), downscale only —
    * INTEGER arithmetic end to end so any engine replays it exactly
    * (floor division, width-bound vs height-bound chosen by cross-product
    * comparison, no floating point).
    */
  def fitWithin(w: Long, h: Long, maxW: Long, maxH: Long): (Long, Long) =
    if (w <= maxW && h <= maxH) (w, h)
    else if (h * maxW <= w * maxH) (maxW, math.max(1L, h * maxW / w)) // width-bound
    else (math.max(1L, w * maxH / h), maxH)                          // height-bound

  /** Resize stage: the geometry (real, tested, engine-replayable) around
    * the stubbed pixel transform — a production codec resamples `blob` to
    * (out_width, out_height); here the payload stays opaque and only the
    * metadata advances, like decodeStub.
    */
  def resizeAll(meta: Dataset[MediaMeta], maxW: Long, maxH: Long)
               (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    meta.mapPartitions(_.map { m =>
      val (ow, oh) = fitWithin(m.width, m.height, maxW, maxH)
      (m.doc_id, m.width, m.height, ow, oh)
    }).toDF("doc_id", "width", "height", "out_width", "out_height")
  }
}
