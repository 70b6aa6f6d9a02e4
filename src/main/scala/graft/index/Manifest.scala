package graft.index

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Index manifest — the reference's `meta.json` analog
  * (`src/index/index_meta.rs:301-312`): the atomically-published list of
  * segments plus per-segment lineage/metrics. Readers pin one manifest
  * version; builders write `segments.json.tmp` then rename (same
  * write-new-then-rename commit as `ARCHITECTURE.md:53`).
  *
  * Checkpoints: each build batch writes `_checkpoints/batch_<b>_<cfg>.json`
  * after its tables land; a restarted build skips batches whose checkpoint
  * (content-addressed by config hash) exists — the resumability contract.
  */
object Manifest {

  final case class IndexMeta(configHash: String, segments: Seq[SegmentMeta],
      withPositions: Boolean = true) {
    def totalRows: Long = segments.map(_.rows).sum
    def totalTokens: Long = segments.map(_.tokens).sum
  }

  private def metaDir(indexDir: String) = s"$indexDir/_meta"
  private def ckptDir(indexDir: String) = s"$indexDir/_checkpoints"

  def segmentJson(m: SegmentMeta): String =
    s"""{"segId":${m.segId},"batch":${m.batch},"rows":${m.rows},"tokens":${m.tokens},""" +
    s""""terms":${m.terms},"buildWallMs":${m.buildWallMs},"sha256ok":${m.sha256ok}}"""

  def write(indexDir: String, meta: IndexMeta): Unit = {
    Files.createDirectories(Paths.get(metaDir(indexDir)))
    val json =
      s"""{"configHash":"${meta.configHash}","withPositions":${meta.withPositions},"segments":[""" +
      meta.segments.sortBy(_.segId).map(segmentJson).mkString(",") + "]}"
    val tmp = Paths.get(metaDir(indexDir), "segments.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, Paths.get(metaDir(indexDir), "segments.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def exists(indexDir: String): Boolean =
    Files.exists(Paths.get(metaDir(indexDir), "segments.json"))

  /** Minimal JSON field extraction (flat numeric/bool/string fields only). */
  private def field(obj: String, name: String): String = {
    val i = obj.indexOf("\"" + name + "\":")
    require(i >= 0, s"missing field $name in $obj")
    val start = i + name.length + 3
    val end = obj.indexWhere(c => c == ',' || c == '}', start)
    obj.substring(start, end).trim.stripPrefix("\"").stripSuffix("\"")
  }

  def read(indexDir: String): IndexMeta = {
    val json = Files.readString(Paths.get(metaDir(indexDir), "segments.json"))
    val cfg = field(json, "configHash")
    val withPos = if (json.contains("\"withPositions\":")) // absent in pre-flag manifests
      field(json, "withPositions").toBoolean else true
    val segsPart = json.substring(json.indexOf('[') + 1, json.lastIndexOf(']'))
    val segs =
      if (segsPart.trim.isEmpty) Seq.empty[SegmentMeta]
      else segsPart.split("\\},\\{").toSeq.map { raw =>
        val obj = (if (!raw.startsWith("{")) "{" else "") + raw +
          (if (!raw.endsWith("}")) "}" else "")
        SegmentMeta(
          segId = field(obj, "segId").toInt,
          batch = field(obj, "batch").toInt,
          rows = field(obj, "rows").toLong,
          tokens = field(obj, "tokens").toLong,
          terms = field(obj, "terms").toLong,
          buildWallMs = field(obj, "buildWallMs").toLong,
          sha256ok = field(obj, "sha256ok").toBoolean)
      }
    IndexMeta(cfg, segs, withPos)
  }

  /** Segment file GC (`src/indexer/index_writer.rs:482
    * garbage_collect_files`): delete `batch=<b>` directories that no LIVE
    * segment references. Merge rewrites survivors into a fresh batch dir and
    * republishes the manifest, so a batch absent from the manifest is
    * unreachable by any future reader; run GC only when no reader still pins
    * an older manifest (the reference's living-files contract). Returns the
    * deleted paths.
    */
  def gc(indexDir: String): Seq[String] = {
    val live = read(indexDir).segments.map(_.batch).toSet
    val deleted = scala.collection.mutable.ArrayBuffer.empty[String]
    for (table <- Seq("postings", "docmap", "termdict", "stats")) {
      val dir = Paths.get(indexDir, table)
      if (Files.exists(dir)) {
        Files.list(dir).iterator().asScala.toSeq.foreach { p =>
          val name = p.getFileName.toString
          if (name.startsWith("batch=") &&
              !live.contains(name.stripPrefix("batch=").toInt)) {
            Files.walk(p).iterator().asScala.toSeq.reverseIterator
              .foreach(Files.delete)
            deleted += p.toString
          }
        }
      }
    }
    deleted.toSeq
  }

  /** `IndexWriter::rollback` (`src/indexer/index_writer.rs:564-577`):
    * return to the last committed state by dropping everything the
    * published manifest cannot reach — `batch=<b>` table directories left
    * by a killed/abandoned build or append that never republished
    * `segments.json` (the same orphan-dir sweep as [[gc]]), PLUS the
    * per-batch checkpoints referencing batches outside the manifest, so a
    * config-identical re-build cannot resurrect the rolled-back batches
    * through the resume path. Returns the deleted paths.
    */
  def rollback(indexDir: String): Seq[String] = {
    val live = read(indexDir).segments.map(_.batch).toSet
    val deleted = scala.collection.mutable.ArrayBuffer.empty[String]
    deleted ++= gc(indexDir)
    val ck = Paths.get(ckptDir(indexDir))
    if (Files.exists(ck)) {
      val ckRe = "batch_(\\d+)_.*\\.json".r
      Files.list(ck).iterator().asScala.toSeq.foreach { p =>
        p.getFileName.toString match {
          case ckRe(b) if !live.contains(b.toInt) =>
            Files.delete(p); deleted += p.toString
          case _ => ()
        }
      }
    }
    deleted.toSeq
  }

  // ---- per-batch checkpoints ----

  def checkpointPath(indexDir: String, batch: Int, configHash: String) =
    Paths.get(ckptDir(indexDir), s"batch_${batch}_$configHash.json")

  def checkpointExists(indexDir: String, batch: Int, configHash: String): Boolean =
    Files.exists(checkpointPath(indexDir, batch, configHash))

  def writeCheckpoint(indexDir: String, batch: Int, configHash: String,
                      segs: Seq[SegmentMeta]): Unit = {
    Files.createDirectories(Paths.get(ckptDir(indexDir)))
    val p = checkpointPath(indexDir, batch, configHash)
    val tmp = Paths.get(p.toString + ".tmp")
    Files.writeString(tmp,
      "[" + segs.sortBy(_.segId).map(segmentJson).mkString(",") + "]")
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def readCheckpoint(indexDir: String, batch: Int, configHash: String): Seq[SegmentMeta] = {
    val json = Files.readString(checkpointPath(indexDir, batch, configHash))
    val inner = json.substring(1, json.length - 1)
    if (inner.trim.isEmpty) Seq.empty
    else inner.split("\\},\\{").toSeq.map { raw =>
      val obj = (if (!raw.startsWith("{")) "{" else "") + raw +
        (if (!raw.endsWith("}")) "}" else "")
      SegmentMeta(field(obj, "segId").toInt, field(obj, "batch").toInt,
        field(obj, "rows").toLong, field(obj, "tokens").toLong,
        field(obj, "terms").toLong, field(obj, "buildWallMs").toLong,
        field(obj, "sha256ok").toBoolean)
    }
  }

  def listCheckpointedBatches(indexDir: String, configHash: String): Set[Int] = {
    val dir = Paths.get(ckptDir(indexDir))
    if (!Files.exists(dir)) Set.empty
    else Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case n if n.startsWith("batch_") && n.endsWith(s"_$configHash.json") =>
        n.stripPrefix("batch_").stripSuffix(s"_$configHash.json").toInt }
      .toSet
  }
}
