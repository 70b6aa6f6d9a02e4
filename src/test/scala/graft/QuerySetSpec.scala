package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.bench.{CorpusGen, QuerySet}
import graft.index.{IndexBuilder, IndexConfig, Manifest}
import graft.query._

/** The search-benchmark-game-style query set (bench/queries.txt, FIXTURES.md
  * §3): every entry — TOP_10 / TOP_10_COUNT / COUNT over single terms,
  * disjunctions, `+a +b` conjunctions, and quoted phrases — must be rank- and
  * f32-score-identical to the brute-force oracle on a CorpusGen corpus, with
  * pure disjunctions routed through the block-max WAND executor exactly as
  * the bench runs them.
  */
class QuerySetSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val nDocs = 250
  lazy val indexDir = java.nio.file.Files.createTempDirectory("graft-qs").toString
  lazy val cfg = IndexConfig(numSegments = 3, blockSize = 16)
  lazy val corpus = CorpusGen.corpus(spark, nDocs, seed = 42L, avgLines = 10)
  lazy val meta: Manifest.IndexMeta = IndexBuilder.build(spark, corpus.toDF(), indexDir, cfg)
  lazy val searcher: Searcher = { meta; new Searcher(spark, indexDir) }

  lazy val naive: NaiveScorer.Corpus = {
    meta
    val src = corpus.toDF().select($"repo", $"path", $"commit", $"content")
    val rows = searcher.docmap.select($"segId", $"docId", $"repo", $"path", $"commit")
      .join(src, Seq("repo", "path", "commit"))
      .select($"segId", $"docId", $"content")
      .as[(Int, Int, String)].collect().toSeq
    NaiveScorer.fromContent(rows)
  }

  test("bench/queries.txt is in sync with the generator") {
    assert(QuerySet.load() == QuerySet.generate(),
      "regenerate with: sbt \"runMain graft.bench.QuerySet\"")
  }

  test("stratification matches FIXTURES.md: 20 single / 20 disj / 10 conj / 10 phrase") {
    val qs = QuerySet.generate().map(_.query)
    assert(qs.length == 60)
    assert(qs.count(_.isInstanceOf[TermQ]) == 20)
    assert(qs.count {
      case BoolQ(cs, _) => cs.forall(_._1 == Occur.Should); case _ => false } == 20)
    assert(qs.count {
      case BoolQ(cs, _) => cs.forall(_._1 == Occur.Must); case _ => false } == 10)
    assert(qs.count(_.isInstanceOf[PhraseQ]) == 10)
  }

  test("every query-set entry: engine (WAND-routed) == naive oracle, rank- and f32-score-identical") {
    var nonEmpty = 0
    QuerySet.generate().foreach { e =>
      val (hits, cnt) = QuerySet.run(searcher, e)
      val q = e.query
      if (e.cmd != QuerySet.Cmd.Count) {
        val oracle = naive.topDocs(q, 10)
        assert(hits.map(h => (h.segId, h.docId)).toSeq ==
          oracle.map(h => (h.segId, h.docId)),
          s"rank mismatch for '$e':\n engine=${hits.toSeq}\n oracle=$oracle")
        hits.toSeq.zip(oracle).foreach { case (h, o) =>
          assert(h.score == o.score,
            s"f32 score mismatch for '$e' at (${h.segId},${h.docId}): ${h.score} vs ${o.score}")
        }
        if (oracle.nonEmpty) nonEmpty += 1
      }
      if (e.cmd != QuerySet.Cmd.Top10)
        assert(cnt == naive.count(q), s"count mismatch for '$e'")
    }
    // the set must actually exercise the corpus (hot keywords always hit)
    assert(nonEmpty >= 15, s"only $nonEmpty non-empty queries — set/corpus mismatch")
  }
}
