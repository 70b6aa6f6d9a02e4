package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.Analysis
import graft.index.{FieldDef, IndexBuilder, IndexConfig}
import graft.query._

/** Multi-valued fields: per-value analysis with POSITION_GAP = 1 position
  * continuation (`postings_writer.rs:17,136-160`), fieldnorms/stats counting
  * all values' tokens, and multivalued numeric fast fields where
  * RangeQ/ExistsQ match per-element (columnar crate multivalue columns).
  */
class MultiValueFieldSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("multiValueTerms: positions continue across values with gap 1") {
    // "alpha beta" -> alpha@0 beta@1, end_position 2, +GAP -> 3
    assert(Analysis.multiValueTerms("default", Seq("alpha beta", "gamma")) ==
      Seq(("alpha", 0), ("beta", 1), ("gamma", 3)))
  }

  test("multiValueTerms: a token-less value still advances the gap") {
    // postings_writer.rs:157 — end_position unchanged by tokens, then +GAP
    assert(Analysis.multiValueTerms("default", Seq("alpha", "", "beta")) ==
      Seq(("alpha", 0), ("beta", 3)))
  }

  test("multiValueTerms: null elements are skipped without a gap") {
    assert(Analysis.multiValueTerms("default", Seq("alpha", null, "beta")) ==
      Seq(("alpha", 0), ("beta", 2)))
  }

  private lazy val (sr, dir) = {
    val d = java.nio.file.Files.createTempDirectory("graft-mv").toString
    val docs = Seq(
      ("r0", "p0", "c0", "x", "filler zero", Seq("hello world", "deep blue"),
        Seq(10L, 200L)),
      ("r0", "p1", "c0", "x", "filler one", Seq("hello", "world"), Seq(20L, 30L)),
      ("r1", "p2", "c0", "x", "filler two", Seq.empty[String], Seq.empty[Long]))
      .toDF("repo", "path", "commit", "lang", "content", "tags", "sizes")
    IndexBuilder.build(spark, docs, d, IndexConfig(numSegments = 1,
      extraFields = Seq(FieldDef("tags", "default", "position")),
      fastFields = Seq("sizes")))
    (new Searcher(spark, d), d)
  }

  private def paths(q: Query): Set[String] =
    sr.compile(q)
      .join(sr.docmap.select($"segId", $"docId", $"path"), Seq("segId", "docId"))
      .select($"path").as[String].collect().toSet

  test("term matches any element of a multi-valued field") {
    assert(paths(FieldQ("tags", TermQ("blue"))) == Set("p0"))
    assert(paths(FieldQ("tags", TermQ("hello"))) == Set("p0", "p1"))
  }

  test("phrase inside one value matches; across the value boundary only with slop") {
    // p0: hello@0 world@1 | deep@3 blue@4 — intra-value phrase matches
    assert(paths(FieldQ("tags", PhraseQ.of("hello", "world"))) == Set("p0"))
    // p1: hello@0 | world@2 — blocked by the gap at slop 0
    // (so p1 must NOT appear above), but slop 1 bridges it
    assert(paths(FieldQ("tags",
      PhraseQ(Seq(0 -> "hello", 1 -> "world"), slop = 1))) == Set("p0", "p1"))
    // "world deep" spans p0's boundary (1 -> 3): slop 0 no, slop 1 yes
    assert(paths(FieldQ("tags", PhraseQ.of("world", "deep"))) == Set.empty)
    assert(paths(FieldQ("tags",
      PhraseQ(Seq(0 -> "world", 1 -> "deep"), slop = 1))) == Set("p0"))
  }

  test("stats count every value's tokens (fieldnorm source)") {
    val total = spark.read.parquet(s"$dir/stats")
      .where(col("field") === "tags")
      .agg(sum("totalNumTokens")).as[Long].head()
    assert(total == 6L) // p0: 4, p1: 2, p2: 0
  }

  test("multivalued fast field: range matches when ANY element is in bounds") {
    assert(paths(RangeQ("sizes", Some((100.0, true)), Some((300.0, true)))) ==
      Set("p0"))
    assert(paths(RangeQ("sizes", Some((15.0, true)), Some((25.0, true)))) ==
      Set("p1"))
    assert(paths(RangeQ("sizes", Some((5.0, true)), None)) == Set("p0", "p1"))
  }

  test("exists on a multivalued fast field requires at least one value") {
    assert(paths(ExistsQ("sizes")) == Set("p0", "p1"))
  }
}
