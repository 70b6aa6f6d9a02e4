package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.bench.CorpusGen
import graft.index.{Deletes, IndexBuilder, IndexConfig, Manifest}
import graft.query.{Searcher, TermQ}
import graft.streaming.StreamIngest

/** Delete tombstones + streaming (micro-batch) ingestion. */
class DeleteStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  test("delete_term tombstones are filtered from every query path") {
    import spark.implicits._
    val dir = tmpDir("del")
    val corpus = CorpusGen.corpus(spark, 300)
    IndexBuilder.build(spark, corpus.toDF(), dir, IndexConfig(numSegments = 2))

    val before = new Searcher(spark, dir)
    val victimDocs = before.compile(TermQ("error")).count()
    assert(victimDocs > 0, "corpus must contain the delete term")
    val allBefore = before.count(TermQ("val"))

    val deleted = Deletes.deleteByTerm(spark, dir, "error")
    assert(deleted == victimDocs)

    // re-pin (reader reload on commit)
    val after = new Searcher(spark, dir)
    assert(after.count(TermQ("error")) == 0)
    // docs with 'val' but not 'error' survive
    val expectSurvivors = before
      .compile(TermQ("val")).as("a")
      .join(before.compile(TermQ("error")).as("b"),
        $"a.segId" === $"b.segId" && $"a.docId" === $"b.docId", "left_anti")
      .count()
    assert(after.count(TermQ("val")) == expectSurvivors)
    assert(allBefore >= expectSurvivors)

    // delete is idempotent: re-deleting matches nothing (already dead)
    assert(Deletes.deleteByTerm(spark, dir, "error") == 0)
  }

  test("merge compacts deletes: dead docs physically dropped, results unchanged") {
    import spark.implicits._
    val dir = tmpDir("delmerge")
    val cfg = IndexConfig(numSegments = 3)
    val corpus = CorpusGen.corpus(spark, 400)
    IndexBuilder.build(spark, corpus.toDF(), dir, cfg)
    Deletes.deleteByTerm(spark, dir, "error")

    val before = new Searcher(spark, dir)
    val expectVal = before.count(TermQ("val"))
    val expectTop = before.topDocsWand(Seq("val", "def"), 10).map(h => h.score)

    val srcSegs = graft.index.Manifest.read(dir).segments.map(_.segId)
    graft.index.Merger.merge(spark, dir, cfg, srcSegs, newSegId = 100)

    val after = new Searcher(spark, dir)
    assert(after.liveSegIds == Seq(100))
    assert(after.count(TermQ("error")) == 0)
    assert(after.count(TermQ("val")) == expectVal)
    // dead docs are physically gone, not just masked: manifest rows ==
    // docmap rows == alive count, and postings contain no trace of 'error'
    val m = graft.index.Manifest.read(dir)
    assert(m.segments.head.rows == after.docmap.count())
    assert(after.postings.where($"term" === "error").count() == 0)
    // stats were recomputed from survivors
    assert(m.segments.head.tokens ==
      after.docmap.agg(org.apache.spark.sql.functions.sum($"tokenCount"))
        .as[Long].head())
    // scores shift (global stats changed), but the engine stays consistent:
    // WAND path == exact path on the compacted index
    val wand = after.topDocsWand(Seq("val", "def"), 10)
    val exact = after.topDocs(graft.query.BoolQ(Seq(
      graft.query.Occur.Should -> TermQ("val"),
      graft.query.Occur.Should -> TermQ("def"))), 10)
    assert(wand.map(h => (h.segId, h.docId, h.score)).toSeq ==
      exact.map(h => (h.segId, h.docId, h.score)).toSeq)
    assert(expectTop.nonEmpty)
  }

  test("micro-batch append commits are isolated, resumable and searchable") {
    val dir = tmpDir("stream")
    val cfg = IndexConfig(numSegments = 2)
    val c1 = CorpusGen.corpus(spark, 120, seed = 1L)
    val c2 = CorpusGen.corpus(spark, 120, seed = 2L)

    StreamIngest.commitBatch(spark, c1.toDF(), dir, cfg, 0L)
    val m1 = Manifest.read(dir)
    val sr1 = new Searcher(spark, dir)
    val hits1 = sr1.count(TermQ("val"))

    StreamIngest.commitBatch(spark, c2.toDF(), dir, cfg, 1L)
    val m2 = Manifest.read(dir)
    // second commit appends NEW segments; first batch untouched
    assert(m2.segments.size == m1.segments.size * 2)
    assert(m2.segments.map(_.segId).distinct.size == m2.segments.size)
    assert(m1.segments.toSet.subsetOf(m2.segments.toSet))
    assert(m2.segments.forall(_.sha256ok))

    // a reader pinned on m1 still sees only batch-1 segments
    assert(sr1.liveSegIds == m1.segments.map(_.segId))

    // a re-pinned reader sees both commits; counts add up
    val sr2 = new Searcher(spark, dir)
    val only2 = tmpDir("stream2")
    IndexBuilder.build(spark, c2.toDF(), only2, cfg)
    val hits2 = new Searcher(spark, only2).count(TermQ("val"))
    assert(sr2.count(TermQ("val")) == hits1 + hits2)
  }
}
