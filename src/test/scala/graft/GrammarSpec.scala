package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query.Grammar
import graft.query._

/** The reference grammar's own test vectors
  * (`query-grammar/src/query_grammar.rs` test module), asserted against the
  * parity Debug rendering of our user-input AST. Each pair is
  * (query, expected reference Debug output).
  */
class GrammarSpec extends AnyFunSuite {

  private def check(query: String, expected: String): Unit =
    assert(Grammar.parseToAst(query).render == expected, s"parse($query)")

  private def checkErr(query: String): Unit =
    assertThrows[Grammar.ParseException](Grammar.parseToAst(query))

  test("empty / single term / default clause") {
    check("", "<emptyclause>")
    check("abc", "abc")
    check("a b", "(*a *b)")
    check("+(a b)", "(*a *b)")
    check("+d", "d")
    check("   abc", "abc")
    check("abc ", "abc")
  }

  test("hyphens and in-word wildcards") {
    check("\"www-form-encoded\"", "\"www-form-encoded\"")
    check("'www-form-encoded'", "'www-form-encoded'")
    check("www-form-encoded", "www-form-encoded")
    check("mr james bo?d", "(*mr *james *bo?d)")
    check("mr james bo*", "(*mr *james *bo*)")
    check("mr james b*d", "(*mr *james *b*d)")
  }

  test("NOT operator") {
    check("NOTa", "NOTa")
    check("NOT a", "(-a)")
    check("tata -toto", "(*tata -toto)")
    check("tata NOT toto", "(*tata -toto)")
  }

  test("boosts") {
    check("a^3", "(a)^3")
    check("a^3 b^2", "(*(a)^3 *(b)^2)")
    check("a^1", "a")
  }

  test("binary operators") {
    check("a AND b", "(+a +b)")
    check("a\nAND b", "(+a +b)")
    check("a OR b", "(?a ?b)")
    check("a OR b AND c", "(?a ?(+b +c))")
    check("a AND b         AND c", "(+a +b +c)")
    check("a OR b aaa", "(?a ?b *aaa)")
    check("a AND b aaa", "(?(+a +b) *aaa)")
    check("aaa a OR b ", "(*aaa ?a ?b)")
    check("aaa ccc a OR b ", "(*aaa *ccc ?a ?b)")
    check("aaa a AND b ", "(*aaa ?(+a +b))")
    check("aaa ccc a AND b ", "(*aaa *ccc ?(+a +b))")
  }

  test("mixed bool occur") {
    check("+a OR +b", "(+a +b)")
    check("a AND -b", "(+a -b)")
    check("-a AND b", "(-a +b)")
    check("a AND NOT b", "(+a +(-b))")
    check("NOT a AND b", "(+(-a) +b)")
    check("a AND NOT b AND c", "(+a +(-b) +c)")
    check("a AND -b AND c", "(+a -b +c)")
    check("a OR -b", "(?a ?(-b))")
    check("-a OR b", "(?(-a) ?b)")
    check("a OR NOT b", "(?a ?(-b))")
    check("NOT a OR b", "(?(-a) ?b)")
    check("a OR NOT b OR c", "(?a ?(-b) ?c)")
    check("a OR -b OR c", "(?a ?(-b) ?c)")
    check("a OR b +aaa", "(?a ?b +aaa)")
    check("a AND b -aaa", "(?(+a +b) -aaa)")
    check("+a OR +b aaa", "(+a +b *aaa)")
    check("-a AND -b aaa", "(?(-a -b) *aaa)")
    check("-aaa +ccc -a OR b ", "(-aaa +ccc ?(-a) ?b)")
  }

  test("elastic ranges") {
    check("title: >a", "\"title\":{\"a\" TO \"*\"}")
    check("title:>=a", "\"title\":[\"a\" TO \"*\"}")
    check("title: <a", "\"title\":{\"*\" TO \"a\"}")
    check("title:<=a", "\"title\":{\"*\" TO \"a\"]")
    check("title:<=bsd", "\"title\":{\"*\" TO \"bsd\"]")
    check("weight: >70", "\"weight\":{\"70\" TO \"*\"}")
    check("weight:>=70", "\"weight\":[\"70\" TO \"*\"}")
    check("weight: <70", "\"weight\":{\"*\" TO \"70\"}")
    check("weight:<=70", "\"weight\":{\"*\" TO \"70\"]")
    check("weight: >60.7", "\"weight\":{\"60.7\" TO \"*\"}")
    check("weight: <= 70", "\"weight\":{\"*\" TO \"70\"]")
    check("weight: <= 70.5", "\"weight\":{\"*\" TO \"70.5\"]")
    check(">a", "{\"a\" TO \"*\"}")
    check(">=a", "[\"a\" TO \"*\"}")
    check("<a", "{\"*\" TO \"a\"}")
    check("<=a", "{\"*\" TO \"a\"]")
    check("<=bsd", "{\"*\" TO \"bsd\"]")
  }

  test("bracket ranges") {
    check("[1 TO 5]", "[\"1\" TO \"5\"]")
    check("foo:{a TO z}", "\"foo\":{\"a\" TO \"z\"}")
    check("foo:[1 TO toto}", "\"foo\":[\"1\" TO \"toto\"}")
    check("foo:[* TO toto}", "\"foo\":{\"*\" TO \"toto\"}")
    check("foo:[1 TO *}", "\"foo\":[\"1\" TO \"*\"}")
    check("1.2.foo.bar:[1.1 TO *}", "\"1.2.foo.bar\":[\"1.1\" TO \"*\"}")
    check("foo:[1 TO 5]", "\"foo\":[\"1\" TO \"5\"]")
  }

  test("trimming") {
    check("(  a OR abc)", "(?a ?abc)")
    check("(a  OR abc)", "(?a ?abc)")
    check("(a OR  abc)", "(?a ?abc)")
    check("a OR abc ", "(?a ?abc)")
    check("(a OR abc )", "(?a ?abc)")
    check("(a OR  abc) ", "(?a ?abc)")
    checkErr("(a OR  abc ")
  }

  test("term groups") {
    check("field:(abc)", "\"field\":abc")
    check("field:(+a -\"b c\")", "(+\"field\":a -\"field\":\"b c\")")
    check("field:(a AND \"b c\")", "(+\"field\":a +\"field\":\"b c\")")
    check("field:(a OR \"b c\")", "(?\"field\":a ?\"field\":\"b c\")")
    check("field:(a OR (b AND c))", "(?\"field\":a ?(+\"field\":b +\"field\":c))")
    check("field:(a [b TO c])", "(*\"field\":a *\"field\":[\"b\" TO \"c\"])")
    check("field:(abc AND b:cde)", "(+\"field\":abc +\"b\":cde)")
    checkErr("field:(+a -\"b c\"")
  }

  test("fields") {
    check("abc:toto", "\"abc\":toto")
    check("+abc:toto", "\"abc\":toto")
    check("+a\\+b\\+c:toto", "\"a+b+c\":toto")
    check("(+abc:toto -titi)", "(+\"abc\":toto -titi)")
    check("-abc:toto", "(-\"abc\":toto)")
    check("abc:a b", "(*\"abc\":a *b)")
    check("abc:\"a b\"", "\"abc\":\"a b\"")
    check("abc:\"happy tax payer\"", "\"abc\":\"happy tax payer\"")
    check("abc:'happy tax payer'", "\"abc\":'happy tax payer'")
    check("abc:1.1", "\"abc\":1.1")
    check("a.b.c:1.1", "\"a.b.c\":1.1")
    check("a\\ b\\ c:1.1", "\"a b c\":1.1")
    check("field : a", "\"field\":a")
    check("field:    a", "\"field\":a")
    check("field         :a", "\"field\":a")
    check("field : 'happy tax payer' AND other_field  : 1",
      "(+\"field\":'happy tax payer' +\"other_field\":1)")
    checkErr("!bc:def")
  }

  test("must clauses") {
    check("(+a +b)", "(+a +b)")
    check("+(a b) +d", "(+(*a *b) +d)")
    check("(+a +b) d", "(*(+a +b) *d)")
  }

  test("sets") {
    check("abc: IN [a b c]", "\"abc\": IN [\"a\" \"b\" \"c\"]")
    check("abc: IN [1]", "\"abc\": IN [\"1\"]")
    check("abc: IN []", "\"abc\": IN []")
    check("IN [1 2]", "IN [\"1\" \"2\"]")
    checkErr("IN [1 2")
  }

  test("slop and fuzzy-looking words") {
    checkErr("\"a b\"~")
    check("\"a b\"^2 ~4", "(*(\"a b\")^2 *~4)")
    check("\"a b\"~4^2", "(\"a b\"~4)^2")
    check("\"~Document\"", "\"~Document\"")
    check("~Document", "~Document")
    check("a~2", "a~2")
    check("\"a b\"~0", "\"a b\"")
    check("\"a b\"~1", "\"a b\"~1")
    check("\"a b\"~3", "\"a b\"~3")
    check("foo:\"a b\"~300", "\"foo\":\"a b\"~300")
    check("\"a b\"~300^2", "(\"a b\"~300)^2")
  }

  test("phrase prefix") {
    check("\"a b\"*", "\"a b\"*")
    check("\"a\"*", "\"a\"*")
    check("\"\"*", "\"\"*")
    check("foo:\"a b\"*", "\"foo\":\"a b\"*")
    check("foo:\"a\"*", "\"foo\":\"a\"*")
    check("foo:\"\"*", "\"foo\":\"\"*")
  }

  test("exists and wildcard-ish words") {
    check("a:*", "$exists(\"a\")")
    check("a: *", "$exists(\"a\")")
    check("(hello AND toto:*) OR happy", "(?(+hello +$exists(\"toto\")) ?happy)")
    check("(a:*)", "$exists(\"a\")")
    check("a:b*", "\"a\":b*")
    check("a:*b", "\"a\":*b")
    check("a:*def*", "\"a\":*def*")
  }

  test("escaping") {
    check("myfield:\"hello\\\"happy\\'tax\"", "\"myfield\":\"hello\"happy'tax\"")
    check("myfield:'hello\\\"happy\\'tax'", "\"myfield\":'hello\"happy'tax'")
    check("abc\\*", "abc\\*")
    check("\"abc:def\"", "\"abc:def\"")
    check("'abc:def'", "'abc:def'")
    check("abc\\:def", "abc:def")
    check("\"abc\\:def\"", "\"abc:def\"")
    check("'abc\\:def'", "'abc:def'")
  }

  test("regex literals") {
    check("a:/joh?n(ath[oa]n)/", "\"a\":/joh?n(ath[oa]n)/")
    check("a:/\\/cgi-bin\\/luci.*/", "\"a\":/\\/cgi-bin\\/luci.*/")
  }

  test("strict parse errors") {
    checkErr("abc +    ")
    checkErr("--abc:toto")
  }

  // ---------------- compile semantics (query_parser.rs) ----------------

  test("compile: occur algebra and literals") {
    assert(QueryParser.parse("+spark merge -join") == BoolQ(Seq(
      Occur.Must -> TermQ("spark"), Occur.Should -> TermQ("merge"),
      Occur.MustNot -> TermQ("join"))))
    assert(QueryParser.parse("spark AND merge") == BoolQ(Seq(
      Occur.Must -> TermQ("spark"), Occur.Must -> TermQ("merge"))))
    assert(QueryParser.parse("\"a b\"~2") == PhraseQ(Seq((0, "a"), (1, "b")), slop = 2))
    assert(QueryParser.parse("*") == AllQ)
    assert(QueryParser.parse("") == EmptyQ)
  }

  test("compile: field scoping, ranges, sets, boosts, regex") {
    val opts = Grammar.CompileOpts(fieldTokenizers =
      Map("content" -> "default", "lang" -> "raw"))
    assert(QueryParser.parse("lang:en AND spark", opts = opts) == BoolQ(Seq(
      Occur.Must -> FieldQ("lang", TermQ("en")),
      Occur.Must -> TermQ("spark"))))
    assert(QueryParser.parse("contentLen:[100 TO 200]") ==
      RangeQ("contentLen", Some((100.0, true)), Some((200.0, true))))
    assert(QueryParser.parse("contentLen:>100") ==
      RangeQ("contentLen", Some((100.0, false)), None))
    assert(QueryParser.parse("[aa TO ab]") ==
      TermRangeQ(Some(("aa", true)), Some(("ab", true))))
    assert(QueryParser.parse("lang: IN [en fr]", opts = opts) ==
      FieldQ("lang", TermSetQ(Set("en", "fr"))))
    assert(QueryParser.parse("spark^2") == BoostQ(TermQ("spark"), 2.0f))
    assert(QueryParser.parse("/s[a-z]*k/") == RegexQ("s[a-z]*k"))
    assert(QueryParser.parse("lang:*") == ExistsQ("lang"))
    assert(QueryParser.parse("\"order s\"*") ==
      PhrasePrefixQ(Seq((0, "order")), prefix = (1, "s")))
  }

  test("compile: multi-token unquoted literal becomes a phrase; empty drops") {
    assert(QueryParser.parse("\"batch batch\"") == PhraseQ(Seq((0, "batch"), (1, "batch"))))
    // '...' analyzes to zero tokens under the default chain -> clause dropped
    assert(QueryParser.parse("... spark") == TermQ("spark"))
  }
}
