package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{IndexBuilder, IndexConfig}
import graft.query._

/** The reference's FuzzyTermQuery tests ported verbatim
  * (`src/query/fuzzy_query.rs:273-346`): plain vs prefix distance, and
  * transposition cost 1 vs 2.
  */
class FuzzyQuerySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val sr = {
    val d = java.nio.file.Files.createTempDirectory("graft-fuzzy").toString
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

  test("test_fuzzy_term: 'japon' ~1 matches japan at const score 1.0 (fuzzy_query.rs:292-299)") {
    assert(hits(FuzzyQ("japon", 1, transposition = true)) == Seq(("p0", 1.0f)))
  }

  test("test_fuzzy_term: 'jap' ~1 non-prefix needs distance 2 (fuzzy_query.rs:301-309)") {
    assert(hits(FuzzyQ("jap", 1, transposition = true)).isEmpty)
  }

  test("test_fuzzy_term: 'jap' ~1 prefix distance is 0 (fuzzy_query.rs:311-319)") {
    assert(hits(FuzzyQ("jap", 1, transposition = true, prefix = true)) ==
      Seq(("p0", 1.0f)))
  }

  test("test_fuzzy_term_transposition_cost_one: 'jaapn' ~1 (fuzzy_query.rs:322-346)") {
    assert(hits(FuzzyQ("jaapn", 1, transposition = true)) == Seq(("p0", 1.0f)))
    assert(hits(FuzzyQ("jaapn", 1, transposition = false)).isEmpty)
  }
}
