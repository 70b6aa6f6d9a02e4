package graft.index

/** Input row shape (BASELINE.json input_hint): an Iceberg/Parquet table of
  * source-code files. The engine never assumes more columns than these.
  */
final case class SourceFile(repo: String, path: String, commit: String, lang: String, content: String)

/** docmap — one row per indexed document (the docstore + fast-field table;
  * reference analogs: docstore `src/store/`, fieldnorms `src/fieldnorm/`,
  * fast fields `ARCHITECTURE.md:161-194` — Parquet is already columnar, so
  * fast fields are just typed columns here).
  * DocId is the segment-local dense u32 of the reference
  * (`ARCHITECTURE.md:66-72`): dense rank over (repo, path, commit) within the
  * segment — deterministic across reruns and parallelism levels.
  */
final case class DocMapRow(
    segId: Int, docId: Int,
    repo: String, path: String, commit: String, lang: String,
    sha256: String, normId: Int, tokenCount: Long, contentLen: Int)

/** One posting-list block — 128 docs max, the reference's bitpacked block
  * re-expressed as a Spark-native columnar row (`src/postings/serializer.rs:
  * 365-451`; block size `compression/mod.rs:4`). Parquet's encodings replace
  * the manual bitpacking. `lastDoc` is the skip entry (`skip.rs:56-73`);
  * (maxNormId, maxTf) is the block-max WAND pair chosen by argmax of
  * tf_factor under the segment-local weight (`serializer.rs:389-413`), with
  * tf capped at 255 (255 decodes to u32::MAX, `skip.rs:24-35`). For the
  * final partial block the reference stores no pair (VInt tail); we store
  * (255, 255) — a valid upper bound with the same decode rule.
  * `normIds` denormalizes the per-doc fieldnorm byte into the block so the
  * WAND executor is self-contained (the reference reads the .fieldnorm file).
  * `positions` is aligned with `docIds`; empty when positions are disabled.
  */
final case class PostingBlock(
    segId: Int, field: String, term: String, blockId: Int,
    lastDoc: Int, blockLen: Int,
    docIds: Array[Int], tfs: Array[Int], normIds: Array[Int],
    maxNormId: Int, maxTf: Int,
    positions: Array[Array[Int]])

/** Term dictionary summary — TermInfo analog (`src/postings/term_info.rs:9-16`):
  * per-segment doc_freq drives index-global idf and cost-ordered intersection.
  */
final case class TermDictRow(segId: Int, field: String, term: String, docFreq: Long, numBlocks: Int)

/** Per-segment field statistics (`src/index/inverted_index_reader.rs:251`,
  * summed index-globally at query time per `bm25.rs:25-48`).
  */
final case class StatsRow(segId: Int, field: String, totalNumTokens: Long, numDocs: Long)

/** Intermediate: one (doc, field, term) posting with positions, pre-blocking.
  * `normId` is the doc's PER-FIELD fieldnorm byte, computed inline during
  * analysis (it depends only on the doc's own token count in that field) so
  * the postings path never joins back to docmap.
  */
final case class DocTermRow(
    segId: Int, docId: Int, field: String, term: String, tf: Int, normId: Int,
    positions: Array[Int])

/** Per-field indexing options (`src/schema/field_type.rs:170-190` +
  * `text_options.rs:264-280`): which analyzer chain tokenizes the field and
  * which IndexRecordOption it records. The presets mirror the reference:
  * TEXT = default chain + WithFreqsAndPositions; STRING = raw + Basic.
  * `stored` is implicit — every input column is already a docmap (docstore)
  * column; `fast` likewise (Parquet is columnar, every docmap column is a
  * fast field).
  */
final case class FieldDef(
    name: String,               // input column == indexed field name
    tokenizer: String = "default",
    record: String = "position" // "basic" | "freq" | "position" (IndexRecordOption)
) {
  require(Set("basic", "freq", "position").contains(record),
    s"unknown IndexRecordOption: $record")
}
object FieldDef {
  /** `text_options.rs:276` — the TEXT preset. */
  def TEXT(name: String): FieldDef = FieldDef(name, "default", "position")
  /** `text_options.rs:268` — the STRING preset: raw tokenizer, docs-only. */
  def STRING(name: String): FieldDef = FieldDef(name, "raw", "basic")
  /** `ip_options.rs` — IpAddr field: canonical-IPv6 terms, docs-only. */
  def IPADDR(name: String): FieldDef = FieldDef(name, "ip", "basic")
  /** `field_type.rs:170-190` typed single-value fields — indexed as
    * order-preserving hex terms (see Analysis typed encodings), docs-only.
    */
  def U64(name: String): FieldDef = FieldDef(name, "u64", "basic")
  def I64(name: String): FieldDef = FieldDef(name, "i64", "basic")
  def F64(name: String): FieldDef = FieldDef(name, "f64", "basic")
  def BOOL(name: String): FieldDef = FieldDef(name, "bool", "basic")
  def DATE(name: String): FieldDef = FieldDef(name, "date", "basic")
  /** `common/src/datetime.rs:16-25` DateTimePrecision: "seconds" (reference
    * default) | "millis" | "micros" | "nanos" — values truncate to the
    * precision at indexing (nanos = the DateTime's native resolution).
    */
  def DATE(name: String, precision: String): FieldDef = precision match {
    case "seconds" => FieldDef(name, "date", "basic")
    case "millis"  => FieldDef(name, "date_millis", "basic")
    case "micros"  => FieldDef(name, "date_micros", "basic")
    case "nanos"   => FieldDef(name, "date_nanos", "basic")
    case other => throw new IllegalArgumentException(s"unknown DatePrecision: $other")
  }
  def BYTES(name: String): FieldDef = FieldDef(name, "bytes", "basic")
  /** `json_object_options.rs` — schema-less JSON object field. */
  def JSON(name: String): FieldDef = FieldDef(name, "json", "position")
}

/** Manifest entry — per-segment lineage + metrics (north-rule requirement):
  * which input batch produced it, rows/bytes/terms, wall time, sha256 check.
  */
final case class SegmentMeta(
    segId: Int, batch: Int, rows: Long, tokens: Long, terms: Long,
    buildWallMs: Long, sha256ok: Boolean)

/** Index configuration (analog of the reference schema + IndexSettings). */
final case class IndexConfig(
    numSegments: Int = 8,
    field: String = "content",
    blockSize: Int = 128,          // COMPRESSION_BLOCK_SIZE, compression/mod.rs:4
    withPositions: Boolean = true, // IndexRecordOption::WithFreqsAndPositions (TEXT preset)
    buildBatches: Int = 1,         // checkpointable segment batches per build
    /** Additional indexed fields beyond the primary text field, each with
      * its own tokenizer chain + IndexRecordOption (multi-field schema,
      * `src/schema/field_type.rs:170-190`). Their source values must be
      * string columns of the input (they are docmap columns already).
      */
    extraFields: Seq[FieldDef] = Seq.empty,
    /** Docstore compressor (`src/store/compressors.rs:10-18`: None/Lz4/
      * Zstd); applied to the docmap Parquet files — the docstore. The
      * reference default is Lz4; ours is Parquet's snappy (same class of
      * fast block codec). "none" | "snappy" | "lz4" | "zstd".
      */
    storeCodec: String = "snappy",
    /** Fast-only columns (`NumericOptions::set_fast` without
      * `set_indexed`, `src/schema/numeric_options.rs`): input columns
      * copied into the docmap (the fast-field store) verbatim but never
      * tokenized — including ARRAY columns, the columnar crate's
      * multivalued fast fields, which RangeQ/ExistsQ match per-element.
      */
    fastFields: Seq[String] = Seq.empty,
    /** Per-segment doc-count cap (`merger.rs:24-27` MAX_DOC_LIMIT = 1<<31):
      * enforced at build time — a segment reaching the cap fails the build
      * with guidance to raise numSegments (the reference errors the same
      * way at merge, `merger.rs:181-185`).
      */
    maxDocsPerSegment: Long = 1L << 31
) {
  require(Set("none", "snappy", "lz4", "zstd").contains(storeCodec),
    s"unknown store codec: $storeCodec")
  /** Parquet compression option value for the docstore writes. */
  def parquetCodec: String = if (storeCodec == "none") "uncompressed" else storeCodec
  def configHash: String = {
    // extraFields/codec only appended when non-default so existing hashes
    // (and the memoized on-disk indexes they name) are unchanged
    val ef = if (extraFields.isEmpty) ""
      else extraFields.map(f => s"${f.name},${f.tokenizer},${f.record}")
        .mkString("|ef:", ";", "")
    val cc = if (storeCodec == "snappy") "" else s"|cc:$storeCodec"
    val ff = if (fastFields.isEmpty) "" else fastFields.mkString("|ff:", ";", "")
    val s = s"v1|$numSegments|$field|$blockSize|$withPositions|$buildBatches$ef$cc$ff"
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
  }
}
