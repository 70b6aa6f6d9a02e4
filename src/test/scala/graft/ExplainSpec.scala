package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{IndexBuilder, IndexConfig}
import graft.query._

/** Nested Explanation tree (`src/query/explanation.rs`, Lucene-format BM25
  * breakdown `bm25.rs:191-221`, per-weight impls in `term_weight.rs:26`,
  * `boolean_weight.rs:285`, `boost_query.rs:74`, `const_score_query.rs:71`,
  * `phrase_weight.rs:85`).
  */
class ExplainSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val sr = {
    val d = java.nio.file.Files.createTempDirectory("graft-expl").toString
    val docs = Seq(
      ("r0", "p0", "c0", "en", "spark merge spark alpha"),
      ("r0", "p1", "c0", "en", "spark beta gamma"),
      ("r1", "p2", "c0", "fr", "merge delta epsilon zeta"))
      .toDF("repo", "path", "commit", "lang", "content")
    IndexBuilder.build(spark, docs, d, IndexConfig(numSegments = 2))
    new Searcher(spark, d)
  }

  private def addr(path: String): (Int, Int) =
    sr.docmap.where($"path" === path).select($"segId", $"docId")
      .as[(Int, Int)].head()

  private def compiledScore(q: Query, path: String): Float = {
    val (s, d) = addr(path)
    sr.compile(q).filter(x => x.segId == s && x.docId == d).head().score
  }

  test("term explain: tree structure and exact f32 score identity") {
    val (s, d) = addr("p0")
    val e = Explain.explain(sr, TermQ("spark"), s, d)
    assert(e.description == "TermQuery, product of...")
    assert(e.value == compiledScore(TermQ("spark"), "p0"))
    // product decomposes: (K1+1) * idf * tf-factor nodes
    val Seq(k1, idf, tf) = e.details
    assert(k1.description == "(K1+1)" && k1.value == 2.2f)
    assert(idf.description.startsWith("idf, computed as"))
    assert(idf.details.map(_.description) ==
      Seq("n, number of docs containing this term", "N, total number of docs"))
    assert(idf.details(0).value == 2.0f && idf.details(1).value == 3.0f)
    assert(tf.description == "freq / (freq + k1 * (1 - b + b * dl / avgdl))")
    assert(tf.details.exists(c =>
      c.description.startsWith("freq,") && c.value == 2.0f)) // 'spark' twice in p0
    assert(e.context.exists(_.contains("\"spark\"")))
    // value == product of the three factors (f32)
    assert(e.value == k1.value * idf.value * (tf.value))
  }

  test("bool explain: sum node over matching positive clauses") {
    val q = BoolQ(Seq(
      Occur.Must -> TermQ("spark"),
      Occur.Should -> TermQ("merge")))
    val (s, d) = addr("p0")
    val e = Explain.explain(sr, q, s, d)
    assert(e.description == "BooleanClause. sum of ...")
    assert(e.details.length == 2)
    assert(e.value == compiledScore(q, "p0"))
    // p1 matches only the Must; one detail child
    val (s1, d1) = addr("p1")
    val e1 = Explain.explain(sr, q, s1, d1)
    assert(e1.details.length == 1)
  }

  test("boost and const-score wrap the inner explanation") {
    val (s, d) = addr("p1")
    val b = Explain.explain(sr, BoostQ(TermQ("spark"), 2.0f), s, d)
    assert(b.description == "Boost x2 of ...")
    assert(b.value == b.details.head.value * 2.0f)
    val c = Explain.explain(sr, ConstScoreQ(TermQ("spark"), 0.5f), s, d)
    assert(c.description == "Const" && c.value == 0.5f)
    assert(c.details.head.description == "TermQuery, product of...")
  }

  test("phrase explain: Phrase Scorer with phrase_count as freq") {
    val (s, d) = addr("p0")
    val q = PhraseQ(Seq(0 -> "spark", 1 -> "merge"))
    val e = Explain.explain(sr, q, s, d)
    assert(e.description == "Phrase Scorer")
    assert(e.value == compiledScore(q, "p0"))
    val inner = e.details.head
    assert(inner.details(1).description == "idf") // bare summed idf node (bm25.rs:121)
    assert(inner.details(2).details.exists(c =>
      c.description.startsWith("freq,") && c.value == 1.0f))
  }

  test("does-not-match throws, like the reference's explain error") {
    val (s, d) = addr("p2")
    intercept[IllegalArgumentException] {
      Explain.explain(sr, TermQ("spark"), s, d)
    }
  }

  test("pretty json renders the nested tree") {
    val (s, d) = addr("p0")
    val js = Explain.explain(sr, TermQ("spark"), s, d).toPrettyJson
    assert(js.contains("\"value\""))
    assert(js.contains("\"details\": ["))
    assert(js.contains("k1, term saturation parameter"))
    // parses as JSON (reuse Spark's jackson)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(js)
    assert(node.get("details").size() == 3)
  }
}
