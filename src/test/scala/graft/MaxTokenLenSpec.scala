package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Analysis
import graft.index.{FieldDef, IndexBuilder, IndexConfig}
import graft.query._

/** MAX_TOKEN_LEN drop at the postings writer (`src/tokenizer/mod.rs:166`
  * = u16::MAX - 5; `postings_writer.rs:139-147`) — the reference's
  * `test_store_max_len_token` / `test_drop_token_that_are_too_long`
  * (`src/postings/mod.rs:147-217`) ported against a whitespace-chain field
  * (the analog of registering SimpleTokenizer with no RemoveLong filter).
  */
class MaxTokenLenSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val okToken = "a" * Analysis.MaxTokenLen
  private val longToken = "a" * (Analysis.MaxTokenLen + 1)

  private lazy val (sr, dir) = {
    val d = java.nio.file.Files.createTempDirectory("graft-mtl").toString
    val docs = Seq(
      // doc 0: a max-len token — must be indexed verbatim
      ("r0", "p0", "c0", okToken, "filler zero"),
      // doc 1: an exceeding token followed by a normal one — only "hello"
      // survives, at its original position 1
      ("r0", "p1", "c0", longToken + " hello", "filler one"))
      .toDF("repo", "path", "commit", "lang", "content")
    IndexBuilder.build(spark, docs, d, IndexConfig(numSegments = 1,
      extraFields = Seq(FieldDef("lang", "whitespace", "position"))))
    (new Searcher(spark, d), d)
  }

  private def paths(q: Query): Set[String] =
    sr.compile(q)
      .join(sr.docmap.select($"segId", $"docId", $"path"), Seq("segId", "docId"))
      .select($"path").as[String].collect().toSet

  test("a token of exactly MAX_TOKEN_LEN bytes is indexed (postings/mod.rs:147-184)") {
    assert(paths(FieldQ("lang", TermQ(okToken))) == Set("p0"))
  }

  test("a token exceeding MAX_TOKEN_LEN is dropped; later tokens survive (mod.rs:186-217)") {
    assert(paths(FieldQ("lang", TermQ(longToken))) == Set.empty)
    assert(paths(FieldQ("lang", TermQ("hello"))) == Set("p1"))
    // the doc's lang term dictionary holds exactly ONE term, like the
    // reference's num_terms() == 1 assertion
    val terms = sr.termdict.where("field = 'lang' ").select("term")
      .as[String].collect().toSet
    assert(terms == Set(okToken, "hello"))
  }

  test("dropped tokens keep positions and are excluded from the fieldnorm count") {
    import org.apache.spark.sql.functions._
    // position of "hello" is 1 (the dropped token occupied slot 0)
    val pos = sr.postings
      .where(col("field") === "lang" && col("term") === "hello")
      .selectExpr("positions[0][0]").as[Int].head()
    assert(pos == 1)
    // stats: doc 0 contributes 1 token, doc 1 contributes 1 (not 2)
    val total = spark.read.parquet(s"$dir/stats")
      .where(col("field") === "lang")
      .agg(sum("totalNumTokens")).as[Long].head()
    assert(total == 2L)
  }

  test("withinMaxTokenLen counts UTF-8 bytes, not chars") {
    // 3-byte chars: 21844 chars = 65532 bytes > 65530
    assert(!Analysis.withinMaxTokenLen("€" * 21844))
    assert(Analysis.withinMaxTokenLen("€" * 21843)) // 65529 bytes
    assert(Analysis.withinMaxTokenLen("a" * Analysis.MaxTokenLen))
    assert(!Analysis.withinMaxTokenLen("a" * (Analysis.MaxTokenLen + 1)))
  }
}
