package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query.{Snippet, SnippetGenerator}

/** Snippet generation vectors ported from the reference test module
  * (`src/snippet/mod.rs:760-905`).
  */
class SnippetSpec extends AnyFunSuite {

  private val TestText =
    """Rust is a systems programming language sponsored by
Mozilla which describes it as a "safe, concurrent, practical language", supporting functional and
imperative-procedural paradigms. Rust is syntactically similar to C++[according to whom?],
but its designers intend it to provide better memory safety while still maintaining
performance.

Rust is free and open-source software, released under an MIT License, or Apache License
2.0. Its designers have refined the language through the experiences of writing the Servo
web browser layout engine[14] and the Rust compiler. A large proportion of current commits
to the project are from community members.[15]

Rust won first place for "most loved programming language" in the Stack Overflow Developer
Survey in 2016, 2017, and 2018."""

  private def gen(terms: Map[String, Float], max: Int) =
    new SnippetGenerator(terms, "simple", max)

  test("test_snippet (mod.rs:791-817)") {
    val s = gen(Map("rust" -> 1.0f, "language" -> 0.9f), 100).snippet(TestText)
    assert(s.fragment ==
      "Rust is a systems programming language sponsored by\nMozilla which describes it as a \"safe")
    assert(s.toHtml ==
      "<b>Rust</b> is a systems programming <b>language</b> sponsored by\nMozilla which describes it as a &quot;safe")
  }

  test("test_snippet_scored_fragment (mod.rs:819-860)") {
    val s1 = gen(Map("rust" -> 1.0f, "language" -> 0.9f), 20).snippet(TestText)
    assert(s1.toHtml == "<b>Rust</b> is a systems")
    val s2 = gen(Map("rust" -> 0.9f, "language" -> 1.0f), 20).snippet(TestText)
    assert(s2.toHtml == "programming <b>language</b>")
  }

  test("test_snippet_in_second_fragment") {
    val s = gen(Map("c" -> 1.0f), 3).snippet("a b c d")
    assert(s.fragment == "c d")
    assert(s.toHtml == "<b>c</b> d")
  }

  test("test_snippet_with_term_at_the_end_of_fragment") {
    val s = gen(Map("f" -> 1.0f), 3).snippet("a b c d e f g")
    assert(s.fragment == "e f")
    assert(s.toHtml == "e <b>f</b>")
  }

  test("test_snippet_with_second_fragment_has_the_highest_score") {
    val s = gen(Map("f" -> 1.0f, "a" -> 0.9f), 7).snippet("a b c d e f g")
    assert(s.fragment == "e f g")
    assert(s.toHtml == "e <b>f</b> g")
  }

  test("test_snippet_with_term_not_in_text / no terms") {
    val s = gen(Map("z" -> 1.0f), 3).snippet("a b c d")
    assert(s.fragment == "" && s.toHtml == "" && s.isEmpty)
    val s2 = gen(Map.empty, 3).snippet("a b c d")
    assert(s2.isEmpty)
  }

  test("collapse_overlapped_ranges vectors (mod.rs:828-832)") {
    assert(Snippet.collapseOverlappedRanges(Seq((0, 1), (2, 3))) == Seq((0, 1), (2, 3)))
    assert(Snippet.collapseOverlappedRanges(Seq((0, 1), (1, 2))) == Seq((0, 1), (1, 2)))
    assert(Snippet.collapseOverlappedRanges(Seq((0, 2), (1, 2))) == Seq((0, 2)))
    assert(Snippet.collapseOverlappedRanges(Seq((0, 2), (1, 3))) == Seq((0, 3)))
    assert(Snippet.collapseOverlappedRanges(Seq((0, 3), (1, 2))) == Seq((0, 3)))
  }

  test("collapse_overlapped_ranges: remaining reference vectors (mod.rs:838-905)") {
    // test_no_overlap / test_adjacent_ranges
    assert(Snippet.collapseOverlappedRanges(Seq((0, 1), (2, 3), (4, 5)))
      == Seq((0, 1), (2, 3), (4, 5)))
    assert(Snippet.collapseOverlappedRanges(Seq((0, 1), (1, 2), (2, 3)))
      == Seq((0, 1), (1, 2), (2, 3)))
    // test_overlapping_ranges / test_contained_ranges
    assert(Snippet.collapseOverlappedRanges(Seq((0, 2), (1, 3), (2, 4))) == Seq((0, 4)))
    assert(Snippet.collapseOverlappedRanges(Seq((0, 5), (1, 2), (3, 4))) == Seq((0, 5)))
    // test_duplicate_ranges / test_unsorted_ranges
    assert(Snippet.collapseOverlappedRanges(Seq((0, 2), (2, 4), (0, 2), (2, 4)))
      == Seq((0, 2), (2, 4)))
    assert(Snippet.collapseOverlappedRanges(Seq((2, 4), (0, 2), (1, 3))) == Seq((0, 4)))
    // test_complex_scenario
    assert(Snippet.collapseOverlappedRanges(
      Seq((0, 2), (5, 7), (1, 3), (8, 9), (2, 4), (3, 6), (8, 10)))
      == Seq((0, 7), (8, 10)))
    // test_empty_input / test_single_range / test_zero_length_ranges
    assert(Snippet.collapseOverlappedRanges(Nil) == Nil)
    assert(Snippet.collapseOverlappedRanges(Seq((0, 5))) == Seq((0, 5)))
    assert(Snippet.collapseOverlappedRanges(Seq((0, 0), (1, 1), (2, 2), (3, 3)))
      == Seq((0, 0), (1, 1), (2, 2), (3, 3)))
  }

  test("test_snippet_generator_custom_highlighted_elements (mod.rs:812-830)") {
    val s = gen(Map("rust" -> 1.0f, "language" -> 0.9f), 100).snippet(TestText)
    assert(s.toHtml ==
      "<b>Rust</b> is a systems programming <b>language</b> sponsored by\nMozilla which describes it as a &quot;safe")
    val custom = s.copy(prefix = "<q class=\"super\">", postfix = "</q>")
    assert(custom.toHtml ==
      "<q class=\"super\">Rust</q> is a systems programming <q class=\"super\">language</q> sponsored by\nMozilla which describes it as a &quot;safe")
  }

  test("generator from a query: term weights are 1/(1+df)") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-snip").toString
    val docs = Seq(
      ("r0", "p0", "c0", "x", "rust is fast"),
      ("r0", "p1", "c0", "x", "rust is safe and fast"))
      .toDF("repo", "path", "commit", "lang", "content")
    graft.index.IndexBuilder.build(spark, docs, d,
      graft.index.IndexConfig(numSegments = 1))
    val sr = new graft.query.Searcher(spark, d)
    val g = SnippetGenerator.create(sr, graft.query.TermQ("rust"), "content")
    assert(g.termsText == Map("rust" -> 1.0f / 3.0f)) // df=2
    val s = g.snippet("Rust is fast")
    assert(s.toHtml == "<b>Rust</b> is fast")
  }
}
