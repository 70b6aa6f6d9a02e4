package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{FieldDef, IndexBuilder, IndexConfig, JsonField}
import graft.query._

/** Schema-less JSON field (`doc/src/json.md`, `src/core/json_utils.rs`):
  * flatten vectors from the reference doc, typed-term priority, the array
  * bag-of-terms pitfall, and dotted-path queries through the parser.
  */
class JsonFieldSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def terms(json: String): Seq[String] =
    JsonField.flatten(json, "default").map(_._1)

  private val S = JsonField.Sep.toString
  private val E = JsonField.End.toString

  test("flatten emits the reference doc's triplets (json.md:8-29)") {
    val doc = """{"user": {"name": "Paul Masurel",
                 "address": {"city": "Tokyo", "country": "Japan"},
                 "created_at": "2018-11-12T23:20:50.52Z"}}"""
    val ts = terms(doc)
    assert(ts.contains(s"user${S}name${E}spaul"))
    assert(ts.contains(s"user${S}name${E}smasurel"))
    assert(ts.contains(s"user${S}address${S}city${E}stokyo"))
    assert(ts.contains(s"user${S}address${S}country${E}sjapan"))
    // created_at parses as RFC-3339 -> a single date term, no text terms
    val dateTerms = ts.filter(_.startsWith(s"user${S}created_at$E"))
    assert(dateTerms == Seq(s"user${S}created_at${E}d" +
      java.time.OffsetDateTime.parse("2018-11-12T23:20:50.52Z").toInstant.toEpochMilli))
    // positions restart per value: "Paul Masurel" tokens at 0 and 1
    val byTerm = JsonField.flatten(doc, "default").toMap
    assert(byTerm(s"user${S}name${E}spaul") == 0)
    assert(byTerm(s"user${S}name${E}smasurel") == 1)
  }

  test("number typing priority u64 -> i64 -> f64 (json.md:62)") {
    assert(terms("""{"a": 5}""") == Seq(s"a${E}u5"))
    assert(terms("""{"a": -5}""") == Seq(s"a${E}i-5"))
    assert(terms("""{"a": 5.5}""") == Seq(s"a${E}f5.5"))
    assert(terms("""{"a": true}""") == Seq(s"a${E}btrue"))
    assert(terms("""{"a": null}""") == Seq.empty)
    assert(terms("not json at all") == Seq.empty)
  }

  private lazy val sr = {
    val d = java.nio.file.Files.createTempDirectory("graft-json").toString
    val docs = Seq(
      ("r0", "p0", "c0", "x", "alpha",
        """{"cart_id": 3234234, "cart": [
             {"product_type": "sneakers", "attributes": {"color": "white"}},
             {"product_type": "t-shirt", "attributes": {"color": "red"}}]}"""),
      ("r0", "p1", "c0", "x", "beta",
        """{"cart_id": 99, "cart": [
             {"product_type": "sneakers", "attributes": {"color": "red"}}]}"""),
      ("r1", "p2", "c0", "x", "gamma", """{"note": "white red sneakers"}"""))
      .toDF("repo", "path", "commit", "lang", "content", "attrs")
    IndexBuilder.build(spark, docs, d, IndexConfig(numSegments = 2,
      extraFields = Seq(FieldDef("attrs", "json", "position"))))
    new Searcher(spark, d)
  }
  private val opts = Grammar.CompileOpts(fieldTokenizers =
    Map("content" -> "default", "attrs" -> "json"))
  private def paths(q: Query): Set[String] =
    sr.compile(q)
      .join(sr.docmap.select($"segId", $"docId", $"path"), Seq("segId", "docId"))
      .select($"path").as[String].collect().toSet

  test("dotted json-path queries through the parser") {
    assert(paths(QueryParser.parse("attrs.cart.product_type:sneakers", opts = opts)) ==
      Set("p0", "p1"))
    // array bag-of-terms pitfall (json.md:114-140): p0 matches even though
    // no single cart element has sneakers+red
    assert(paths(QueryParser.parse(
      "attrs.cart.product_type:sneakers AND attrs.cart.attributes.color:red",
      opts = opts)) == Set("p0", "p1"))
    // numeric typed term with query-side expansion
    assert(paths(QueryParser.parse("attrs.cart_id:3234234", opts = opts)) == Set("p0"))
    // a path term never leaks into other paths or the content field
    assert(paths(QueryParser.parse("attrs.note:sneakers", opts = opts)) == Set("p2"))
    assert(paths(QueryParser.parse("sneakers", opts = opts)) == Set.empty)
  }

  test("json phrase: positions within one string value") {
    assert(paths(QueryParser.parse("attrs.note:\"white red\"", opts = opts)) == Set("p2"))
    assert(paths(QueryParser.parse("attrs.note:\"red white\"", opts = opts)) == Set.empty)
  }
}
