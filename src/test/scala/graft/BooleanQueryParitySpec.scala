package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{IndexBuilder, IndexConfig}
import graft.query._

/** The reference's BooleanQuery test suite ported verbatim
  * (`src/query/boolean_query/mod.rs:23-330`): the aux 5-doc corpus's doc
  * sets per occur combination, exclusion not touching scores, boost
  * propagation, intersection score constants, and the parser round trip.
  */
class BooleanQueryParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def createIndex(texts: Seq[String]): Searcher = {
    val d = java.nio.file.Files.createTempDirectory("graft-bq").toString
    val docs = texts.zipWithIndex
      .map { case (t, i) => ("r0", f"p$i%03d", "c0", "x", t) }
      .toDF("repo", "path", "commit", "lang", "content")
    IndexBuilder.build(spark, docs, d, IndexConfig(numSegments = 1))
    new Searcher(spark, d)
  }

  /** aux_test_helper corpus (mod.rs:23-39). */
  private lazy val sr = createIndex(Seq("a b c", "a c", "b c", "a b c d", "d"))

  private def docs(q: Query): Seq[Int] =
    sr.compile(q)
      .join(sr.docmap.select($"segId", $"docId", $"path"), Seq("segId", "docId"))
      .select($"path").as[String].collect().toSeq.sorted.map(_.drop(1).toInt)

  private def scoresById(q: Query): Seq[Float] =
    sr.topDocs(q, 10).sortBy(_.docId).map(_.score).toSeq

  test("test_boolean_query: occur algebra doc sets (mod.rs:105-166)") {
    assert(docs(BoolQ(Seq(Occur.Must -> TermQ("a")))) == Seq(0, 1, 3))
    assert(docs(BoolQ(Seq(Occur.Should -> TermQ("a")))) == Seq(0, 1, 3))
    assert(docs(BoolQ(Seq(Occur.Should -> TermQ("a"),
      Occur.Should -> TermQ("b")))) == Seq(0, 1, 2, 3))
    assert(docs(BoolQ(Seq(Occur.Must -> TermQ("a"),
      Occur.Should -> TermQ("b")))) == Seq(0, 1, 3))
    assert(docs(BoolQ(Seq(Occur.Must -> TermQ("a"),
      Occur.Should -> TermQ("b"), Occur.MustNot -> TermQ("d")))) == Seq(0, 1))
    assert(docs(BoolQ(Seq(Occur.MustNot -> TermQ("d")))).isEmpty)
  }

  test("test_boolean_query_two_excluded: exclusion leaves scores untouched (mod.rs:168-214)") {
    val noExcl = sr.topDocs(BoolQ(Seq(Occur.Must -> TermQ("d"))), 3)
    assert(noExcl.length == 2)
    assert(noExcl(0).docId == 4) // top doc
    assert(noExcl(1).docId == 3)
    val scoreDoc4 = noExcl(0).score
    val excl = sr.topDocs(BoolQ(Seq(
      Occur.Must -> TermQ("d"),
      Occur.MustNot -> TermQ("a"),
      Occur.MustNot -> TermQ("b"))), 3)
    assert(excl.length == 1)
    assert(excl(0).docId == 4)
    assert(excl(0).score == scoreDoc4)
  }

  test("test_boolean_query_with_weight: boost scales the summed score (mod.rs:217-257)") {
    val sr3 = createIndex(Seq("a b c", "a c", "b c"))
    val q = BoolQ(Seq(Occur.Should -> TermQ("a"), Occur.Should -> TermQ("b")))
    val plain = sr3.topDocs(q, 10).sortBy(_.docId)
    assert(plain.head.docId == 0)
    assert(math.abs(plain.head.score - 0.84163445f) < 1e-6, plain.head)
    val boosted = sr3.topDocs(BoostQ(q, 2.0f), 10).sortBy(_.docId)
    assert(math.abs(boosted.head.score - 1.6832689f) < 1e-6, boosted.head)
  }

  test("test_intersection_score: exact f32 scores (mod.rs:258-290)") {
    val s = scoresById(BoolQ(Seq(Occur.Must -> TermQ("a"), Occur.Must -> TermQ("b"))))
    assert(math.abs(s(0) - 0.977973f) < 1e-6, s)
    assert(math.abs(s(1) - 0.84699446f) < 1e-6, s)
  }

  test("test_boolean_non_all_term_disjunction: parsed '(+a +b) d' counts 3 (mod.rs:42-50)") {
    val opts = Grammar.CompileOpts(defaultFields = Seq("content"),
      fieldTokenizers = Map("content" -> "default"), numericFields = Set.empty)
    val q = Grammar.compile(Grammar.parseToAst("(+a +b) d"), opts)
    assert(sr.count(q) == 3L)
  }

  test("test_explain: Should a/b explanation value is ln 2 (mod.rs:291-329)") {
    val sr2 = createIndex(Seq("a", "b"))
    val exp = Explain.explain(sr2,
      BoolQ(Seq(Occur.Should -> TermQ("a"), Occur.Should -> TermQ("b"))), 0,
      sr2.docmap.where($"path" === "p000").select($"docId").as[Int].head())
    assert(math.abs(exp.value - math.log(2).toFloat) < 1e-6, exp.value)
  }
}
