package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.{Analysis, Stemmer}

/** Porter2 / Snowball-English vectors (the reference's `en_stem`,
  * `src/tokenizer/stemmer.rs:12-31`). Expected values derived from the
  * published Snowball English specification (step-by-step), including the
  * counter-intuitive step-4/5 interactions (agreed->agre, hesitancy->hesit,
  * troubling->troubl).
  */
class StemmerSpec extends AnyFunSuite {

  private val vectors = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "tie",
    "caress" -> "caress", "cats" -> "cat", "meetings" -> "meet",
    // step 1b incl. at/bl/iz + double + short-word handling
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubling" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "failing" -> "fail", "filing" -> "file",
    "running" -> "run", "stemming" -> "stem",
    // step 1c (y -> i) and vowel-y
    "happy" -> "happi", "crying" -> "cri", "flying" -> "fli",
    // exceptional forms
    "sky" -> "sky", "news" -> "news", "dying" -> "die",
    // steps 2-4 chains
    "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
    "valenci" -> "valenc", "hesitanci" -> "hesit", "digitizer" -> "digit",
    "formalize" -> "formal", "electriciti" -> "electr", "electrical" -> "electr",
    "adoption" -> "adopt", "adjustable" -> "adjust", "defensible" -> "defens",
    "irritant" -> "irrit", "replacement" -> "replac", "oscillators" -> "oscil",
    "sensational" -> "sensat", "traditional" -> "tradit",
    "generalization" -> "general", "university" -> "univers",
    "universities" -> "univers", "consistency" -> "consist",
    "generously" -> "generous", "knightly" -> "knight",
    // R1 prefix exceptions + non-actions
    "communism" -> "communism", "argument" -> "argument",
    "arguments" -> "argument", "runner" -> "runner", "stemmer" -> "stemmer",
    "quickly" -> "quick", "beautiful" -> "beauti",
    // step 5
    "cease" -> "ceas", "controll" -> "control", "roll" -> "roll")

  test("Porter2 vectors") {
    vectors.foreach { case (in, want) =>
      assert(Stemmer.stemEnglish(in) == want, s"stem($in)")
    }
  }

  test("short words and non-alpha input pass through") {
    assert(Stemmer.stemEnglish("a") == "a")
    assert(Stemmer.stemEnglish("by") == "by")
    assert(Stemmer.stemEnglish("x86") == "x86")
  }

  test("en_stem chain = default chain + stemming") {
    val toks = Analysis.analyzeChain("en_stem", "The Runners were Running quickly")
    assert(toks.map(_.text) == Seq("the", "runner", "were", "run", "quick"))
    // positions preserved from the default chain
    assert(toks.map(_.position) == Seq(0, 1, 2, 3, 4))
  }
}
