package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{IndexBuilder, IndexConfig}
import graft.query._

/** The reference's union / intersection / minimum-required BooleanQuery
  * vectors ported verbatim (`src/query/boolean_query/boolean_query.rs:
  * 272-412`).
  */
class MinShouldMatchParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def createIndex(texts: Seq[String]): Searcher = {
    val d = java.nio.file.Files.createTempDirectory("graft-msm").toString
    val docs = texts.zipWithIndex
      .map { case (t, i) => ("r0", f"p$i%03d", "c0", "x", t) }
      .toDF("repo", "path", "commit", "lang", "content")
    IndexBuilder.build(spark, docs, d, IndexConfig(numSegments = 1))
    new Searcher(spark, d)
  }

  private def docs(sr: Searcher, q: Query): Set[Int] =
    sr.compile(q)
      .join(sr.docmap.select($"segId", $"docId", $"path"), Seq("segId", "docId"))
      .select($"path").as[String].collect().toSet.map((p: String) => p.drop(1).toInt)

  private def mrQuery(terms: Seq[String], mr: Int): Query =
    BoolQ(terms.map(t => Occur.Should -> (TermQ(t): Query)), minShouldMatch = mr)

  test("test_minimum_required (boolean_query.rs:287-352)") {
    val sr = createIndex(Seq("a b c", "a c e", "d f g", "z z z", "c i b"))
    // any 2 of {a c z i}
    assert(docs(sr, mrQuery(Seq("a", "c", "z", "i"), 2)) == Set(0, 1, 4))
    // any 3 of {a b c e}
    assert(docs(sr, mrQuery(Seq("a", "b", "c", "e"), 3)) == Set(0, 1))
    // mr exceeds clause count -> nothing
    assert(docs(sr, mrQuery(Seq("a", "b"), 3)).isEmpty)
    // mr 0 / 1 degrade to plain union
    assert(docs(sr, mrQuery(Seq("a", "z"), 1)) == Set(0, 1, 3))
    assert(docs(sr, mrQuery(Seq("a", "b"), 0)) == Set(0, 1, 4))
  }

  test("test_union / test_intersection (boolean_query.rs:354-412)") {
    val sr = createIndex(Seq("b c", "a c", "a b", "a d"))
    assert(docs(sr, mrQuery(Seq("a", "d"), 1)) == Set(1, 2, 3))
    def must(ts: String*) =
      BoolQ(ts.map(t => Occur.Must -> (TermQ(t): Query)))
    assert(docs(sr, must("a", "b")) == Set(2))
    assert(docs(sr, must("a", "c")) == Set(1))
    assert(docs(sr, must("b", "c")) == Set(0))
  }
}
