package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.Analysis
import graft.functions.FulltextMatch

/** The `fulltext_match` Catalyst Expression: analyzer parity with the
  * engine's default chain, SQL + codegen paths, null and non-foldable
  * query handling, and the SparkSessionExtensions injection point.
  */
class FulltextMatchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def naive(content: String, query: String): Boolean = {
    val toks = Analysis.defaultTerms(content).map(_._1).toSet
    Analysis.defaultTerms(query).map(_._1).forall(toks.contains)
  }

  test("kernel: all-terms-must with the default analyzer chain") {
    assert(FulltextMatch.matches("Hello, happy tax payer!", Array("hello", "tax")))
    assert(!FulltextMatch.matches("Hello, happy tax payer!", Array("hello", "audit")))
    assert(FulltextMatch.matches("anything", Array.empty)) // vacuous truth
    // query side lowercases + drops >=40-byte tokens like the parser does
    assert(FulltextMatch.queryTerms("Hello TAX " + "x" * 45).toSeq == Seq("hello", "tax"))
  }

  test("SQL surface: registered function, literal query (codegen path)") {
    FulltextMatch.register(spark)
    val docs = Seq(
      (0L, "error handling in the merge path"),
      (1L, "Merge-sort with ERROR codes"),
      (2L, "no relevant terms here"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("ftm_docs")
    val got = spark.sql(
      "SELECT doc_id FROM ftm_docs WHERE fulltext_match(text, 'ERROR merge') ORDER BY doc_id")
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 1L)) // null text never matches; analyzer splits on '-'
    // agreement with the naive reference on every non-null row
    val q = "error merge"
    val expected = Seq((0L, "error handling in the merge path"),
      (1L, "Merge-sort with ERROR codes"), (2L, "no relevant terms here"))
      .collect { case (id, t) if naive(t, q) => id }
    assert(got == expected)
  }

  test("non-foldable query column re-analyzes per row") {
    FulltextMatch.register(spark)
    val rows = Seq(("alpha beta gamma", "BETA"), ("alpha beta gamma", "delta"))
      .toDF("text", "q")
    rows.createOrReplaceTempView("ftm_dyn")
    val got = spark.sql("SELECT fulltext_match(text, q) FROM ftm_dyn")
      .as[Boolean].collect().toSeq
    assert(got == Seq(true, false))
  }

  test("type check rejects non-string arguments") {
    FulltextMatch.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT fulltext_match(1, 'x')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("fulltext_match"))
  }

  test("extensions class injects without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // would throw on an invalid description
  }
}
