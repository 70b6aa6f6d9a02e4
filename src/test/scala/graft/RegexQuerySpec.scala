package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{IndexBuilder, IndexConfig}
import graft.query._

/** The reference's RegexQuery tests (`src/query/regex_query.rs:151-210`)
  * plus the whole-term-anchoring property tantivy_fst implies: a pattern
  * matching a SUBSTRING of a term must not match the term.
  */
class RegexQuerySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val sr = {
    val d = java.nio.file.Files.createTempDirectory("graft-rq").toString
    val docs = Seq(
      ("r0", "p0", "c0", "x", "japan"),
      ("r0", "p1", "c0", "x", "korea"))
      .toDF("repo", "path", "commit", "lang", "content")
    IndexBuilder.build(spark, docs, d, IndexConfig(numSegments = 1))
    new Searcher(spark, d)
  }

  private def hits(q: Query): Seq[(String, Float)] =
    sr.compile(q)
      .join(sr.docmap.select($"segId", $"docId", $"path"), Seq("segId", "docId"))
      .select($"path", $"score").as[(String, Float)].collect().toSeq.sortBy(_._1)

  test("test_regex_query: 'jap[ao]n' matches one at const 1.0; 'jap[A-Z]n' none") {
    assert(hits(RegexQ("jap[ao]n")) == Seq(("p0", 1.0f)))
    assert(hits(RegexQ("jap[A-Z]n")).isEmpty)
  }

  test("whole-term anchoring: a substring pattern does not match") {
    // tantivy_fst automata are implicitly anchored — "apa" is inside
    // "japan" but must NOT match the term
    assert(hits(RegexQ("apa")).isEmpty)
    assert(hits(RegexQ("jap")).isEmpty)
    assert(hits(RegexQ("jap.*")) == Seq(("p0", 1.0f)))
  }

  test("alternation survives the anchoring wrap") {
    assert(hits(RegexQ("japan|korea")).map(_._1) == Seq("p0", "p1"))
  }
}
