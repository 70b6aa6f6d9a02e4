package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{FieldDef, IndexBuilder, IndexConfig}
import graft.query._

/** Multi-field schema (`src/schema/field_type.rs:170-190`,
  * `text_options.rs:264-280`): per-field tokenizer + IndexRecordOption,
  * field-scoped query compilation, STRING-vs-TEXT preset behavior.
  */
class MultiFieldSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val (dir, sr) = {
    val d = java.nio.file.Files.createTempDirectory("graft-mf").toString
    val docs = Seq(
      // (repo, path, commit, lang, content)
      ("r0", "p0", "c0", "Scala Lang", "hello world alpha"),
      ("r0", "p1", "c0", "scala",      "hello Scala beta"),
      ("r1", "p2", "c0", "rust",       "scala lang gamma"),
      ("r1", "p3", "c0", null,         "hello delta"))
      .toDF("repo", "path", "commit", "lang", "content")
    IndexBuilder.build(spark, docs, d, IndexConfig(numSegments = 2,
      extraFields = Seq(FieldDef.STRING("lang"), FieldDef.TEXT("repo"))))
    (d, new Searcher(spark, d))
  }

  private def paths(q: Query): Set[String] = {
    sr.compile(q)
      .join(sr.docmap.select($"segId", $"docId", $"path"), Seq("segId", "docId"))
      .select($"path").as[String].collect().toSet
  }

  test("STRING preset: raw tokenizer matches the EXACT value only (text_options.rs:264-268)") {
    // the whole value is one non-lowercased term
    assert(paths(FieldQ("lang", TermQ("Scala Lang"))) == Set("p0"))
    // no per-word terms, no lowercasing
    assert(paths(FieldQ("lang", TermQ("scala"))) == Set("p1"))
    assert(paths(FieldQ("lang", TermQ("lang"))) == Set.empty)
    assert(paths(FieldQ("lang", TermQ("scala lang"))) == Set.empty)
  }

  test("TEXT preset on an extra field: default chain tokenizes + lowercases") {
    assert(paths(FieldQ("repo", TermQ("r0"))) == Set("p0", "p1"))
  }

  test("same term, different fields, different results") {
    // 'scala' as a content token vs as the raw lang value
    assert(paths(TermQ("scala")) == Set("p1", "p2"))
    assert(paths(FieldQ("lang", TermQ("scala"))) == Set("p1"))
  }

  test("field scoping distributes through boolean trees") {
    val q = BoolQ(Seq(
      Occur.Must -> FieldQ("lang", TermQ("scala")),
      Occur.Must -> TermQ("hello")))
    assert(paths(q) == Set("p1"))
  }

  test("null field values are skipped, doc still indexed in other fields") {
    assert(paths(TermQ("delta")) == Set("p3"))
    assert(paths(FieldQ("lang", TermQ("delta"))) == Set.empty)
  }

  test("per-field stats and docFreqs are field-scoped") {
    assert(sr.docFreqs(Seq("scala")).get("scala").contains(2L))      // content
    assert(sr.docFreqs(Seq("scala"), "lang").get("scala").contains(1L))
    // content: 3+3+3+2 = 11 tokens; lang raw: one token per non-null value
    assert(sr.fieldStats("content")._1 == 11L)
    assert(sr.fieldStats("lang")._1 == 3L)
  }

  test("basic record option stores tf=1 and no positions") {
    val row = sr.postings
      .where($"field" === "lang" && $"term" === "scala")
      .select($"tfs", $"positions").head()
    assert(row.getSeq[Int](0).toList == List(1))
    assert(row.getSeq[scala.collection.Seq[Int]](1).forall(_.isEmpty))
  }

  // pre-tokenized input (`src/tokenizer/tokenized_string.rs`): an extra
  // field fed by an array<struct<text, position>> column is indexed
  // verbatim — no analyzer, caller-supplied positions
  private lazy val preSr = {
    val d = java.nio.file.Files.createTempDirectory("graft-pre").toString
    val docs = Seq(
      ("r0", "p0", "c0", "x", "alpha", Seq(("Hello", 0), ("World", 2))),
      ("r0", "p1", "c0", "x", "beta",  Seq(("hello", 0), ("world", 1))),
      ("r1", "p2", "c0", "x", "gamma", null: Seq[(String, Int)]))
      .toDF("repo", "path", "commit", "lang", "content", "toks")
      .withColumn("toks", $"toks".cast("array<struct<text:string,position:int>>"))
    IndexBuilder.build(spark, docs, d, IndexConfig(numSegments = 2,
      extraFields = Seq(FieldDef("toks", "default", "position"))))
    new Searcher(spark, d)
  }
  private def prePaths(q: Query): Set[String] =
    preSr.compile(q)
      .join(preSr.docmap.select($"segId", $"docId", $"path"), Seq("segId", "docId"))
      .select($"path").as[String].collect().toSet

  test("pre-tokenized tokens are indexed verbatim, bypassing the analyzer") {
    // 'Hello' was NOT lowercased — the default chain never ran on it
    assert(prePaths(FieldQ("toks", TermQ("Hello"))) == Set("p0"))
    assert(prePaths(FieldQ("toks", TermQ("hello"))) == Set("p1"))
    // null token arrays skip the field, doc still indexed elsewhere
    assert(prePaths(TermQ("gamma")) == Set("p2"))
  }

  test("pre-tokenized caller positions are honored (gapped phrase needs slop)") {
    // p0's positions are 0 and 2: adjacent phrase misses, slop 1 hits
    assert(prePaths(FieldQ("toks",
      PhraseQ(Seq(0 -> "Hello", 1 -> "World"), slop = 0))) == Set.empty)
    assert(prePaths(FieldQ("toks",
      PhraseQ(Seq(0 -> "Hello", 1 -> "World"), slop = 1))) == Set("p0"))
    assert(prePaths(FieldQ("toks",
      PhraseQ(Seq(0 -> "hello", 1 -> "world"), slop = 0))) == Set("p1"))
  }
}
