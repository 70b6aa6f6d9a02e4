package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{IndexConfig, Manifest}
import graft.query._

/** `IndexWriter::rollback` (`src/indexer/index_writer.rs:564-577`):
  * abandoning an uncommitted batch returns the index to its last commit —
  * orphan `batch=<b>` dirs AND their resume checkpoints are reclaimed, and
  * a subsequent add over the rolled-back index lands the identical final
  * state as a never-killed run.
  */
class RollbackSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def batchDf(ids: Seq[Int]) =
    ids.map(i => ("r0", s"p$i", "c0", "rust", s"common id$i payload$i"))
      .toDF("repo", "path", "commit", "lang", "content")

  /** Fingerprint a manifest modulo wall-clock metrics. */
  private def shape(m: Manifest.IndexMeta) =
    (m.configHash, m.withPositions,
      m.segments.map(s => (s.segId, s.batch, s.rows, s.tokens, s.terms, s.sha256ok))
        .sortBy(x => (x._1, x._2)))

  test("add -> kill-mid-append -> rollback -> add == clean run (index_writer.rs:564-577)") {
    val cfg = IndexConfig(numSegments = 2)
    val dirKilled = java.nio.file.Files.createTempDirectory("graft-rb-killed").toString
    val dirClean = java.nio.file.Files.createTempDirectory("graft-rb-clean").toString

    val killed = Graft.create(spark, dirKilled, cfg)
    killed.add(batchDf(0 until 5))
    val committed = killed.meta

    // simulate an append killed AFTER its table dirs land but BEFORE the
    // manifest republish: orphan batch=1 dirs + an orphan resume checkpoint
    for (table <- Seq("postings", "docmap", "termdict", "stats"))
      Seq(("junk", 1)).toDF("a", "b").write.parquet(s"$dirKilled/$table/batch=1")
    Manifest.writeCheckpoint(dirKilled, 1, cfg.configHash,
      Seq(graft.index.SegmentMeta(9, 1, 1L, 1L, 1L, 0L, sha256ok = true)))

    val deleted = killed.rollback()
    // all four orphan dirs and the checkpoint are reclaimed
    assert(deleted.length == 5, s"expected 4 dirs + 1 checkpoint, got $deleted")
    for (table <- Seq("postings", "docmap", "termdict", "stats"))
      assert(!new java.io.File(s"$dirKilled/$table/batch=1").exists())
    assert(!Manifest.checkpointExists(dirKilled, 1, cfg.configHash))
    // the committed state is untouched
    assert(shape(killed.meta) == shape(committed))
    // rollback is idempotent
    assert(killed.rollback().isEmpty)

    // resume normal life: the next add must land the same final state as a
    // run that was never killed
    killed.add(batchDf(5 until 8))
    val clean = Graft.create(spark, dirClean, cfg)
    clean.add(batchDf(0 until 5))
    clean.add(batchDf(5 until 8))
    assert(shape(killed.meta) == shape(clean.meta))

    // and the rolled-back index answers like the clean one
    val a = killed.searcher.count(TermQ("common"))
    val b = clean.searcher.count(TermQ("common"))
    assert(a == 8L && b == 8L)
  }
}
