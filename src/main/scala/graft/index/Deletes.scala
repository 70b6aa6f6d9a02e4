package graft.index

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Delete tombstones (`IndexWriter::delete_term` / `delete_query`,
  * `src/indexer/index_writer.rs:680-698`).
  *
  * Deletes are term/query-driven and batch-applied, exactly the reference's
  * model: a delete materializes the matching `(segId, docId)` addresses into
  * the `deletes` table (the alive-bitset analog,
  * `src/fastfield/alive_bitset.rs`); every subsequent query anti-joins it
  * (see `Searcher.compile`). Physical removal happens at merge/compaction
  * time, not at delete time — same batch-oriented design as the reference
  * (`ARCHITECTURE.md:31`).
  */
object Deletes {

  /** Record tombstones for every doc matched by `q` (delete_query). The
    * matching runs against the CURRENT index state (deletes already applied
    * — deleting twice is a no-op). Appends to the deletes table.
    */
  def deleteByQuery(spark: SparkSession, indexDir: String,
                    q: graft.query.Query): Long = {
    val sr = new graft.query.Searcher(spark, indexDir)
    val victims = sr.compile(q).select(col("segId"), col("docId")).distinct()
    val n = victims.count()
    if (n > 0) victims.write.mode("append").parquet(s"$indexDir/deletes")
    n
  }

  /** delete_term convenience. */
  def deleteByTerm(spark: SparkSession, indexDir: String, term: String): Long =
    deleteByQuery(spark, indexDir, graft.query.TermQ(term))

  /** Fingerprint of the tombstone state (file names + lengths), folded into
    * Searcher generation ids; 0 when no deletes exist. Driver-side FS
    * metadata only — no Spark job.
    */
  def stamp(indexDir: String): Long = {
    val p = new java.io.File(s"$indexDir/deletes")
    if (!p.exists()) 0L
    else Option(p.listFiles()).getOrElse(Array.empty)
      .filter(_.isFile).sortBy(_.getName)
      .foldLeft(1L)((h, f) =>
        (h * 1000003L + f.getName.hashCode.toLong) * 1000003L + f.length())
  }
}
