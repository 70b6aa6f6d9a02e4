package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.{Analysis, FieldNorm, Token}
import graft.score.Bm25

/** Golden vectors ported verbatim from the reference's own unit tests —
  * they pin the constants that create rank identity (FIXTURES.md §4).
  */
class AnalysisSpec extends AnyFunSuite {

  test("defaultTermCount == defaultAnalyze().length (fuzz, 2000 cases)") {
    val rng = new scala.util.Random(13)
    val alphabet = "ab cC1!.é世́ \n\t" + // ascii, accents, CJK, combining
      new String(Character.toChars(0x1F600)) // surrogate pair (emoji, non-alnum)
    for (_ <- 1 to 2000) {
      val len = rng.nextInt(120)
      val s = new StringBuilder
      (0 until len).foreach { _ =>
        if (rng.nextInt(20) == 0) s.append("x" * (35 + rng.nextInt(10))) // straddle the 40-byte limit
        else s.append(alphabet.charAt(rng.nextInt(alphabet.length)))
      }
      val text = s.toString
      assert(Analysis.defaultTermCount(text) == Analysis.defaultAnalyze(text).length,
        s"mismatch on: ${text.take(80)}")
    }
  }

  test("simple tokenizer golden vector (simple_tokenizer.rs:71-79)") {
    val toks = Analysis.simpleTokenize("Hello, happy tax payer!")
    assert(toks.map(_.text) == Seq("Hello", "happy", "tax", "payer"))
    assert(toks == Seq(
      Token("Hello", 0, 0, 5),
      Token("happy", 1, 7, 12),
      Token("tax", 2, 13, 16),
      Token("payer", 3, 17, 22)))
  }

  test("default chain lowercases (lower_caser.rs:84-91)") {
    assert(Analysis.defaultAnalyze("Tree").map(_.text) == Seq("tree"))
    val toks = Analysis.defaultAnalyze("Русский текст")
    assert(toks.map(_.text) == Seq("русский", "текст"))
    // byte offsets (UTF-8): русский is 14 bytes, space 1, текст 10
    assert(toks.map(t => (t.offsetFrom, t.offsetTo)) == Seq((0, 14), (15, 25)))
  }

  test("no final-sigma special case in lowercase") {
    // Rust: every Σ -> σ; Java String.toLowerCase on the full word would give ς
    assert(Analysis.lowercase("ΟΔΥΣΣΕΥΣ") == "οδυσσευσ")
  }

  test("remove-long drops tokens with utf8 length >= limit (remove_long.rs:1-14)") {
    val toks = Analysis.simpleTokenize("toolong nice")
      .filter(Analysis.keepUnderLimit(_, 5))
    assert(toks.map(_.text) == Seq("nice"))
    // default chain limit 40: a 40-byte token is dropped, 39 kept
    val t39 = "a" * 39; val t40 = "b" * 40
    assert(Analysis.defaultAnalyze(s"$t39 $t40").map(_.text) == Seq(t39))
    // multi-byte: 20 cyrillic chars = 40 utf8 bytes -> dropped
    val cyr20 = "ж" * 20
    assert(Analysis.defaultAnalyze(s"x $cyr20").map(_.text) == Seq("x"))
  }

  test("unicode alphanumeric parity: numbers Nl/No are token chars") {
    // Ⅷ (ROMAN NUMERAL, Nl), ½ (VULGAR FRACTION, No) are alphanumeric in Rust
    assert(Analysis.simpleTokenize("aⅧb").map(_.text) == Seq("aⅧb"))
    assert(Analysis.simpleTokenize("x½y").map(_.text) == Seq("x½y"))
    // punctuation/symbols split
    assert(Analysis.simpleTokenize("foo_bar").map(_.text) == Seq("foo", "bar"))
    assert(Analysis.simpleTokenize("a+b=c").map(_.text) == Seq("a", "b", "c"))
  }

  test("whitespace tokenizer") {
    assert(Analysis.whitespaceTokenize("Hello, tax payer!").map(_.text) ==
      Seq("Hello,", "tax", "payer!"))
  }

  test("ngram tokenizer (ngram_tokenizer.rs semantics)") {
    assert(Analysis.ngramTokenize("hello", 2, 3).map(_.text) ==
      Seq("he", "hel", "el", "ell", "ll", "llo", "lo"))
    assert(Analysis.ngramTokenize("hello", 2, 3, prefixOnly = true).map(_.text) ==
      Seq("he", "hel"))
  }

  test("facet tokenizer emits ancestor paths") {
    assert(Analysis.facetTokenize("/a/b/c") == Seq("/a", "/a/b", "/a/b/c"))
  }

  test("fieldnorm table: bijection, identity <= 40, exact reference entries (code.rs:277-328)") {
    assert(FieldNorm.Table.length == 256)
    for (i <- 0 until 41) assert(FieldNorm.fieldnormToId(i.toLong) == i)
    assert(FieldNorm.fieldnormToId(41) == 40)
    assert(FieldNorm.fieldnormToId(42) == 41)
    assert(FieldNorm.idToFieldnorm(255) == 2013265944L)
    for (id <- 43 until 256) {
      val fn = FieldNorm.Table(id)
      assert(FieldNorm.idToFieldnorm(id) == fn)
      assert(FieldNorm.fieldnormToId(fn) == id)
      assert(FieldNorm.fieldnormToId(fn - 1) == id - 1)
      assert(FieldNorm.fieldnormToId(fn + 1) == id)
    }
    // u32::MAX -> 255
    assert(FieldNorm.fieldnormToId(0xffffffffL) == 255)
    // spot-check values against the reference table constants
    assert(FieldNorm.Table(41) == 42L)
    assert(FieldNorm.Table(49) == 60L)
    assert(FieldNorm.Table(88) == 1048L)
  }

  test("idf(1,2) == ln 2 in f32 (bm25.rs:230-235)") {
    assert(Bm25.idf(1, 2) == math.log(2.0).toFloat)
  }

  test("bm25 score shape and max_score cap (bm25.rs:174-188,179-181)") {
    val w = Bm25.forOneTerm(1, 2, 10.0f)
    // weight = idf * (1+k1)
    assert(w.weight == math.log(2.0).toFloat * 2.2f)
    // tf factor monotone in tf, decreasing in fieldnorm id
    assert(w.tfFactor(0, 1) > 0f)
    assert(w.tfFactor(0, 2) > w.tfFactor(0, 1))
    assert(w.tfFactor(10, 3) > w.tfFactor(20, 3))
    // max_score = score(255, 2_013_265_944)
    assert(w.maxScore == w.score(255, 2013265944L))
    assert(w.boostBy(2.0f).weight == w.weight * 2.0f)
  }

  test("wand block-max tf cap encode/decode (skip.rs:24-35,296-311)") {
    def enc(tf: Long): Int = math.min(tf, 255L).toInt
    def dec(code: Int): Long = if (code == 255) 0xffffffffL else code.toLong
    assert(enc(3) == 3 && dec(3) == 3L)
    assert(enc(255) == 255 && enc(1000) == 255)
    assert(dec(255) == 0xffffffffL)
  }

  // reference vectors: split_compound_words.rs:195-270 test module + doc example
  test("split compound words reference vectors (split_compound_words.rs:195-270)") {
    def split(text: String, dict: Seq[String]): Seq[String] =
      Analysis.splitCompoundWords(Analysis.simpleTokenize(text), dict).map(_.text)
    val fb = Seq("foo", "bar")
    assert(split("", fb) == Seq.empty)
    assert(split("foo bar", fb) == Seq("foo", "bar"))
    assert(split("foobar", fb) == Seq("foo", "bar"))
    assert(split("foobarbaz", fb) == Seq("foobarbaz")) // uncovered tail: unsplit
    assert(split("baz foobar qux", fb) == Seq("baz", "foo", "bar", "qux"))
    assert(split("foobar foobar", fb) == Seq("foo", "bar", "foo", "bar"))
    assert(split("foobar foo bar foobar", fb) ==
      Seq("foo", "bar", "foo", "bar", "foo", "bar"))
    assert(split("foobazbar foo bar foobar", fb) ==
      Seq("foobazbar", "foo", "bar", "foo", "bar"))
    // doc-comment German example (split_compound_words.rs:21-41)
    val de = Seq("dampf", "schiff", "fahrt", "brot", "backen", "automat")
    assert(split("dampfschifffahrt", de) == Seq("dampf", "schiff", "fahrt"))
    assert(split("brotbackautomat", de) == Seq("brotbackautomat"))
    // split parts inherit the original token's position
    val toks = Analysis.splitCompoundWords(Analysis.simpleTokenize("baz foobar"), fb)
    assert(toks.map(t => (t.text, t.position)) ==
      Seq(("baz", 0), ("foo", 1), ("bar", 1)))
  }

  test("ip chain canonicalizes to IPv6 (ip_options.rs:9-21 into_ipv6_addr)") {
    def ip(s: String): Seq[String] = Analysis.analyzeChain("ip", s).map(_.text)
    assert(ip("192.168.0.1") == Seq("::ffff:192.168.0.1"))
    assert(ip("2001:0db8:0000:0000:0000:0000:0000:0001") == Seq("2001:db8::1"))
    assert(ip("::1") == Seq("::1"))
    assert(ip("not-an-ip") == Seq.empty)
    assert(Analysis.canonicalIpv6("10.0.0.255").contains("::ffff:10.0.0.255"))
  }

  // reference vectors: ascii_folding_filter.rs:1569-1651 test module
  test("ascii folding reference vectors (ascii_folding_filter.rs:1569-1651)") {
    def fold(text: String): Seq[String] =
      Analysis.analyzeChain("ascii", text).map(_.text)
    assert(fold("Ràmon") == Seq("Ramon"))
    assert(fold("accentué") == Seq("accentue"))
    assert(fold("âäàéè") == Seq("aaaee"))
    assert(fold("Usagi") == Seq("Usagi")) // test_no_change
    assert(Analysis.asciiFold("Rámon") == "Ramon") // test_to_ascii
    // test_unmodified_letters: unmapped non-ascii passes through
    assert(Analysis.asciiFold("§ ¦ ¤ END") == "§ ¦ ¤ END")
    // test_latin1_characters (the single-token portion)
    val latin = ("À Á Â Ã Ä Å Æ Ç È É Ê Ë Ì Í Î Ï Ĳ Ð Ñ Ò Ó Ô Õ Ö Ø Œ Þ " +
      "Ù Ú Û Ü Ý Ÿ à á â ã ä å æ ç è é ê ë ì í î ï ĳ ð ñ ò ó ô õ ö ø œ ß þ " +
      "ù ú û ü ý ÿ ﬁ ﬂ").split(' ').toSeq
    val expect = (Seq.fill(6)("A") ++ Seq("AE", "C") ++ Seq.fill(4)("E") ++
      Seq.fill(4)("I") ++ Seq("IJ", "D", "N") ++ Seq.fill(6)("O") ++
      Seq("OE", "TH") ++ Seq.fill(4)("U") ++ Seq.fill(2)("Y") ++
      Seq.fill(6)("a") ++ Seq("ae", "c") ++ Seq.fill(4)("e") ++
      Seq.fill(4)("i") ++ Seq("ij", "d", "n") ++ Seq.fill(6)("o") ++
      Seq("oe", "ss", "th") ++ Seq.fill(4)("u") ++ Seq.fill(2)("y") ++
      Seq("fi", "fl"))
    assert(latin.map(Analysis.asciiFold) == expect)
    assert(fold("Des mot clés À LA CHAÎNE") ==
      Seq("Des", "mot", "cles", "A", "LA", "CHAINE"))
    // table spot-checks across script groups
    assert(Analysis.asciiFold("⁓") == "~")
    assert(Analysis.asciiFold("ＦＵＬＬ") == "FULL")
    assert(Analysis.asciiFold("“quoted”") == "\"quoted\"")
  }
}
