package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query.PhraseMatcher

/** The reference's own phrase-slop vectors (`src/query/phrase_query/
  * mod.rs:182-256`) run directly against PhraseMatcher: slop is a carried
  * budget across gaps, and transposition costs the position distance.
  */
class PhraseSlopSpec extends AnyFunSuite {

  /** Tokenize a space-separated doc, return match count of `query` at slop. */
  private def count(doc: String, query: Seq[String], slop: Int): Int = {
    val toks = doc.split(" ").zipWithIndex
    val offsets = query.indices.toArray
    val positions = query.map(q => toks.filter(_._1 == q).map(_._2)).toArray
    if (positions.exists(_.isEmpty)) 0
    else PhraseMatcher.phraseCount(offsets, positions, slop)
  }

  test("slop 0: exact adjacency only") {
    assert(count("a b c", Seq("a", "b"), 0) == 1)
    assert(count("a x b", Seq("a", "b"), 0) == 0)
    assert(count("a b a b", Seq("a", "b"), 0) == 2)
  }

  test("test_phrase_slop: 'a x b c' matches [a,b,c] at slop 1 (mod.rs:238-242)") {
    assert(count("a x b c", Seq("a", "b", "c"), 1) == 1)
  }

  test("test_phrase_slop: 'a x b x c' needs slop 2 (mod.rs:244-246)") {
    assert(count("a x b x c", Seq("a", "b", "c"), 1) == 0)
    assert(count("a x b x c", Seq("a", "b", "c"), 2) == 1)
  }

  test("test_phrase_slop: transposition 'a b' vs [b,a] costs 2 (mod.rs:248-255)") {
    assert(count("a b", Seq("b", "a"), 1) == 0)
    assert(count("a b", Seq("b", "a"), 2) == 1)
  }

  test("test_phrase_score_with_slop_bug: 'asdf asdf captain subject wendy' ~1 [captain, wendy]") {
    // mod.rs:182-188 — captain@2, wendy@4: carried distance 2 needs... the
    // reference asserts exactly ONE doc matches at slop 1: shifted positions
    // captain+1=3, wendy@4, |3-4| = 1 <= 1
    assert(count("asdf asdf captain subject wendy", Seq("captain", "wendy"), 1) == 1)
  }

  test("test_phrase_score_with_slop_bug_2: 'a x b x c' ~2 [a,b,c] (mod.rs:190-201)") {
    assert(count("a x b x c", Seq("a", "b", "c"), 2) == 1)
    // the sibling docs in that test contain no 'b'/'a' -> no match
    assert(count("a a c", Seq("a", "b", "c"), 2) == 0)
    assert(count("b c c", Seq("a", "b", "c"), 2) == 0)
  }

  test("test_phrase_score_with_slop_repeating: repeated middle term (mod.rs:220-226)") {
    assert(count("wendy subject subject captain", Seq("wendy", "subject", "captain"), 1) == 1)
  }

  test("test_phrase_score_with_slop_size: 'a e e e c' matches [a,c] ~3; 4 gaps does not (mod.rs:228-236)") {
    assert(count("a b e c", Seq("a", "c"), 3) == 1)
    assert(count("a e e e c", Seq("a", "c"), 3) == 1)
    assert(count("a e e e e c", Seq("a", "c"), 3) == 0)
  }

  test("test_phrase_score_with_slop_ordering: 'a c b' matches [a,b,c] ~3 (mod.rs:259-271)") {
    assert(count("a e b e c", Seq("a", "b", "c"), 3) == 1)
    assert(count("a e e e e e b e e e e c", Seq("a", "b", "c"), 3) == 0)
    assert(count("a c b", Seq("a", "b", "c"), 3) == 1)
  }
}
