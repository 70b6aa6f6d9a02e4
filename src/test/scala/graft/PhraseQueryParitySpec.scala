package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{IndexBuilder, IndexConfig}
import graft.query._

/** The reference's PhraseQuery test corpus ported verbatim
  * (`src/query/phrase_query/mod.rs:40-126,162-236`): doc-set results on the
  * 5-doc corpus and EXACT f32 BM25 scores on the scored corpora.
  */
class PhraseQueryParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** create_index analog: one TEXT field, docs in insertion order — paths
    * p0.. keep our dense docId assignment aligned with the reference's
    * insertion-order DocIds.
    */
  private def createIndex(texts: Seq[String]): Searcher = {
    val d = java.nio.file.Files.createTempDirectory("graft-pq").toString
    val docs = texts.zipWithIndex
      .map { case (t, i) => ("r0", f"p$i%03d", "c0", "x", t) }
      .toDF("repo", "path", "commit", "lang", "content")
    IndexBuilder.build(spark, docs, d, IndexConfig(numSegments = 1))
    new Searcher(spark, d)
  }

  private def docIds(sr: Searcher, q: Query): Seq[Int] =
    sr.compile(q)
      .join(sr.docmap.select($"segId", $"docId", $"path"), Seq("segId", "docId"))
      .select($"path").as[String].collect().toSeq.sorted
      .map(_.drop(1).toInt)

  /** Scores by reference DocId (insertion order). */
  private def scores(sr: Searcher, q: Query): Map[Int, Float] =
    sr.topDocs(q, 10).map(h => (h.docId, h.score)).toMap

  private lazy val corpus5 = createIndex(Seq(
    "b b b d c g c", "a b b d c g c", "a b a b c", "c a b a d ga a", "a b c"))

  test("test_phrase_query doc sets (mod.rs:40-73)") {
    assert(docIds(corpus5, PhraseQ.of("a", "b")) == Seq(1, 2, 3, 4))
    assert(docIds(corpus5, PhraseQ.of("a", "b", "c")) == Seq(2, 4))
    assert(docIds(corpus5, PhraseQ.of("b", "b")) == Seq(0, 1))
    assert(docIds(corpus5, PhraseQ.of("g", "ewrwer")).isEmpty)
    assert(docIds(corpus5, PhraseQ.of("g", "a")).isEmpty)
  }

  test("test_phrase_query_simple: only doc 1 matches (mod.rs:76-91)") {
    val sr = createIndex(Seq("a b b d c g c", "a b a b c"))
    assert(docIds(sr, PhraseQ.of("a", "b", "c")) == Seq(1))
  }

  test("test_phrase_score: exact f32 scores (mod.rs:162-169)") {
    val sr = createIndex(Seq("a b c", "a b c a b"))
    val s = scores(sr, PhraseQ.of("a", "b"))
    assert(math.abs(s(0) - 0.40618482f) < 1e-6, s)
    assert(math.abs(s(1) - 0.46844664f) < 1e-6, s)
  }

  test("test_phrase_score_with_slop_size: exact f32 scores at slop 3 (mod.rs:228-236)") {
    val sr = createIndex(Seq("a b e c", "a e e e c", "a e e e e c"))
    val s = scores(sr, PhraseQ(Seq(0 -> "a", 1 -> "c"), slop = 3))
    assert(s.size == 2, s)
    assert(math.abs(s(0) - 0.29086056f) < 1e-6, s)
    assert(math.abs(s(1) - 0.26706287f) < 1e-6, s)
  }

  test("test_phrase_score_with_slop_ordering: exact f32 scores at slop 3 (mod.rs:259-271)") {
    val sr = createIndex(Seq(
      "a e b e c", "a e e e e e b e e e e c", "a c b",
      "a c e b e", "a e c b", "a e b c"))
    // the reference's collector returns matches in DocId order; scores[i]
    // is the i-th MATCHING doc — doc 1 (distance 5) does not match
    val s = scores(sr, PhraseQ(Seq(0 -> "a", 1 -> "b", 2 -> "c"), slop = 3))
      .toSeq.sortBy(_._1).map(_._2)
    assert(math.abs(s(0) - 0.23091172f) < 1e-6, s)
    assert(math.abs(s(1) - 0.27310878f) < 1e-6, s)
    assert(math.abs(s(3) - 0.25024384f) < 1e-6, s)
  }
}
