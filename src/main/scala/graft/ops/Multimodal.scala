package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract /
  * frame-sample stages as typed `mapPartitions` over the binary batches.
  *
  * IMAGE decode is REAL (round 5): [[decodeImage]] parses PNG/JPEG/GIF/BMP
  * headers through the JDK's `javax.imageio` for true width/height —
  * exercised end-to-end by the `mm_image_decode`/`mm_image_resize` entries
  * over genuine PNG bytes. VIDEO decode remains a clearly-marked
  * deterministic STUB ([[decodeStub]]; no video codec in the JDK) — it
  * derives fake width/height/frame-count from the bytes. Everything around
  * the seam — the binary schema, the per-partition batch iteration, the
  * typed output schema, the frame-sampling explode — is real Spark
  * plumbing and is tested; swapping the stub for a JNI/FFM video codec is
  * a one-function change ([[decode]] already dispatches).
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

  /** STUB decoder — deterministic fake of a VIDEO header parse (no video
    * codec ships in the sandbox JDK). Real implementation would hand
    * `bytes` to a codec; the fake derives the same fields from the payload
    * so tests are reproducible. IMAGES decode for real through
    * [[decodeImage]] — [[decode]] tries that first.
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

  /** REAL image decode: `javax.imageio` ships in the JDK, so PNG/JPEG/GIF/
    * BMP headers parse to their true width/height without any external
    * codec. Header-only work — `reader.getWidth/getHeight(0)` read the
    * image metadata, not the pixel planes, so the per-item cost is bytes
    * sniffed + a header parse regardless of image size. Returns None when
    * no installed reader claims the payload (text stand-ins, video) — then
    * [[decode]] falls back to the stub.
    */
  def decodeImage(id: Long, bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes.length < 8) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val n = r.getNumImages(false) // -1 = unknown without a full scan
          Some(MediaMeta(
            doc_id = id,
            byte_len = bytes.length.toLong,
            first_byte = (bytes(0) & 0xff).toLong,
            width = r.getWidth(0).toLong,
            height = r.getHeight(0).toLong,
            n_frames = if (n > 0) n.toLong else 1L))
        } finally r.dispose()
      }
    } finally iis.close()
  }

  /** The decode seam: real ImageIO parse for image payloads, stub for
    * everything else (video until a codec is wired in, and the text
    * stand-ins the synthetic corpus uses).
    */
  def decode(id: Long, bytes: Array[Byte]): MediaMeta =
    decodeImage(id, bytes).getOrElse(decodeStub(id, bytes))

  /** Deterministic PNG fixture: a real encoded image of the given
    * dimensions (solid color derived from them), so entries/tests exercise
    * the genuine encode → ImageIO header-decode round trip with
    * fixture-side KNOWN dims as the oracle.
    */
  def syntheticPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color((w * 31 + h) % 256, w % 256, h % 256))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real-PNG blob table: one encoded image per row, dims given by column
    * expressions (partition-parallel encode; nothing touches the driver).
    */
  def syntheticImageBlobs(df: DataFrame, idCol: String,
                          wCol: org.apache.spark.sql.Column,
                          hCol: org.apache.spark.sql.Column)
                         (implicit spark: SparkSession): Dataset[Blob] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), wCol.cast("int"), hCol.cast("int"))
      .as[(Long, Int, Int)]
      .mapPartitions(_.map { case (id, w, h) => Blob(id, syntheticPng(w, h)) })
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

  /** Decode / feature-extract stage: one pass, partition-parallel; real
    * ImageIO parse for image payloads, stub otherwise (see [[decode]]).
    */
  def decodeAll(blobs: Dataset[Blob])(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    blobs.mapPartitions(_.map(b => decode(b.doc_id, b.blob)))
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
