package graft

import org.apache.spark.sql.SparkSession
import graft.index.IndexConfig

/** spark-submit entry point for the production build job:
  *
  * {{{
  * spark-submit --class graft.BuildIndex graft.jar \
  *   --input catalog.code.files        # catalog table (Iceberg/Hive/…) …
  *   --input-path /data/files.parquet  # … or a path (exactly one of the two)
  *   --index   s3://bucket/indexes/code-v1 \
  *   --segments 4096 --batches 64 [--no-positions]
  * }}}
  *
  * The input only needs the `(repo, path, commit, lang, content)` columns
  * (BASELINE.json input_hint). `--input` resolves through the session
  * catalog, so an Iceberg table works wherever the Iceberg runtime is on the
  * classpath — the engine itself never links against a catalog
  * implementation (the sandbox has none; SURVEY.md §7 design stance).
  *
  * Resumability: re-submitting the identical command after a failure skips
  * every batch whose checkpoint exists (content-addressed by config hash) —
  * the per-partition lineage/metrics land in the manifest either way.
  * Sizing at 10^12 files: `--segments` bounds per-segment docs (the
  * reference's MAX_DOC_LIMIT, `merger.rs:27`), `--batches` bounds the rows
  * in flight per checkpointed job.
  */
object BuildIndex {

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
      case Array(k) if k.startsWith("--") => k.stripPrefix("--") -> "true"
    }.toMap

  /** The job body, separated from session lifecycle for tests. */
  def run(spark: SparkSession, args: Array[String]): index.Manifest.IndexMeta = {
    val a = parseArgs(args)
    val indexDir = a.getOrElse("index", sys.error("--index required"))
    val input = (a.get("input"), a.get("input-path")) match {
      case (Some(table), None) => spark.read.table(table)
      case (None, Some(path)) => spark.read.parquet(path)
      case _ => sys.error("exactly one of --input (catalog table) or --input-path required")
    }
    val cfg = IndexConfig(
      numSegments = a.getOrElse("segments", "256").toInt,
      buildBatches = a.getOrElse("batches", "1").toInt,
      withPositions = !a.contains("no-positions"))
    index.IndexBuilder.build(spark, input, indexDir, cfg)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-build")
      .getOrCreate() // master/executors come from spark-submit
    val t0 = System.nanoTime()
    val meta = run(spark, args)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"committed ${meta.segments.size} segments, ${meta.totalRows} rows, " +
      f"sha256ok=${meta.segments.forall(_.sha256ok)} in $secs%.1f s " +
      f"(${meta.totalRows / secs}%.0f files/s)")
    spark.stop()
  }
}
