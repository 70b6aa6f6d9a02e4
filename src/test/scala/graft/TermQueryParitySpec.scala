package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{FieldDef, IndexBuilder, IndexConfig}
import graft.query._

/** The reference's TermQuery score tests ported verbatim
  * (`src/query/term_query/mod.rs:17-127`): exact f32 BM25 constants on a
  * STRING (docs-only) field and across a multi-field schema where each
  * field carries its own statistics.
  */
class TermQueryParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("test_term_query_no_freq: STRING field, single doc scores idf = ln(4/3) (mod.rs:17-42)") {
    val d = java.nio.file.Files.createTempDirectory("graft-tq").toString
    val docs = Seq(("r0", "p0", "c0", "x", "a", ""))
      .toDF("repo", "path", "commit", "lang", "text_s", "content")
    IndexBuilder.build(spark, docs, d, IndexConfig(numSegments = 1,
      extraFields = Seq(FieldDef.STRING("text_s"))))
    val sr = new Searcher(spark, d)
    val hits = sr.topDocs(FieldQ("text_s", TermQ("a")), 2)
    assert(hits.length == 1)
    assert(math.abs(hits(0).score - 0.28768212f) < 1e-6, hits(0))
  }

  test("test_term_weight: per-field stats give the reference's exact scores (mod.rs:79-127)") {
    val d = java.nio.file.Files.createTempDirectory("graft-tw").toString
    val left0 = "left1 left2 left2 left2f2 left2f2 left3 " +
      "abcde abcde abcde abcde abcde abcde abcde abcde abcde abcewde abcde abcde"
    val large0 = (0 to 286).map(i => s"large$i").mkString(" ")
    val docs = Seq(
      ("r0", "p0", "c0", "x", left0, "right1 right2", large0, ""),
      ("r0", "p1", "c0", "x", "left4 left1", null, null, ""))
      .toDF("repo", "path", "commit", "lang", "left", "right", "large", "content")
    IndexBuilder.build(spark, docs, d, IndexConfig(numSegments = 1,
      extraFields = Seq(FieldDef.TEXT("left"), FieldDef.TEXT("right"),
        FieldDef.TEXT("large"))))
    val sr = new Searcher(spark, d)

    val byId = (q: Query) => sr.topDocs(q, 2)
    val left2 = byId(FieldQ("left", TermQ("left2")))
    assert(left2.length == 1)
    assert(math.abs(left2(0).score - 0.77802235f) < 1e-6, left2(0))

    val left1 = byId(FieldQ("left", TermQ("left1"))).sortBy(-_.score)
    assert(left1.length == 2)
    assert(math.abs(left1(0).score - 0.27101856f) < 1e-6, left1(0))
    assert(math.abs(left1(1).score - 0.13736556f) < 1e-6, left1(1))

    // "left:left2 left:left1" — Should disjunction sums per doc
    val disj = byId(BoolQ(Seq(
      Occur.Should -> FieldQ("left", TermQ("left2")),
      Occur.Should -> FieldQ("left", TermQ("left1"))))).sortBy(-_.score)
    assert(disj.length == 2)
    assert(math.abs(disj(0).score - 0.9153879f) < 1e-6, disj(0))
    assert(math.abs(disj(1).score - 0.27101856f) < 1e-6, disj(1))
  }
}
