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

  test("sargable length band gates the Levenshtein UDF in the plan") {
    // the cheap projection of the DFA∩FST: |len(c)-len(q)| <= d runs as a
    // plan-level predicate BEFORE the DP UDF, so the dictionary scan drops
    // most terms without running the O(len^2) band
    val plan = sr.compile(FuzzyQ("japon", 1)).queryExecution.optimizedPlan.toString
    assert(plan.contains("length(term"),
      s"expected a length(term) band in the optimized plan:\n$plan")
    // ... and the band appears in the SAME Filter conjunction, BEFORE the
    // UDF, so conjunct short-circuiting applies per row
    val filterLine = plan.linesIterator.find(l =>
      l.contains("length(term") && l.contains("UDF")).getOrElse("")
    assert(filterLine.indexOf("length(term") < filterLine.indexOf("UDF"),
      s"length band must precede the UDF in the Filter:\n$filterLine")
  }

  test("distance-0 fuzzy degenerates to pushed-down equality / startsWith") {
    // (match without the closing paren: PushedFilters lists are truncated
    // with "..." in plan strings)
    val eq = sr.compile(FuzzyQ("japan", 0)).queryExecution.executedPlan.toString
    assert(eq.contains("PushedFilters") && eq.contains("EqualTo(term,japan"),
      s"d=0 must push term equality into the scan:\n$eq")
    val pre = sr.compile(FuzzyQ("jap", 0, prefix = true))
      .queryExecution.optimizedPlan.toString
    assert(pre.contains("StartsWith(term"),
      s"d=0 prefix must filter by StartsWith(term):\n$pre")
    assert(hits(FuzzyQ("japan", 0)) == Seq(("p0", 1.0f)))
    assert(hits(FuzzyQ("jap", 0, prefix = true)) == Seq(("p0", 1.0f)))
  }
}
