package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.{Analysis, Stemmers}

/** Multi-language Snowball vectors (the reference's per-language `Stemmer`
  * filter, `src/tokenizer/stemmer.rs:12-31`). Expected values derived
  * step-by-step from the published Snowball algorithm pages, including the
  * region-condition negatives (e.g. German `freundlich` keeps `lich` because
  * R2 is empty) that catch off-by-one region bugs.
  */
class StemmersSpec extends AnyFunSuite {

  test("German vectors") {
    val vs = Seq(
      "büchern" -> "buch",                       // step1 ern + umlaut strip
      "kinder" -> "kind",                        // step1 er
      "aufeinanderfolgende" -> "aufeinanderfolg", // step1 e, step3 end
      "freundlich" -> "freundlich",              // lich blocked: R2 empty
      "schönheit" -> "schonheit",                // heit blocked: R2 empty
      "aufgabe" -> "aufgab")                     // step1 e
    vs.foreach { case (in, want) => assert(Stemmers.stemGerman(in) == want, s"de($in)") }
  }

  test("Swedish vectors") {
    val vs = Seq(
      "jaktkarlens" -> "jaktkarl",               // step1 ens
      "klokast" -> "klok",                       // step1 ast
      "skrivningar" -> "skrivning",              // step1 ar
      "möjligheterna" -> "möj")                  // step1 heterna, step3 lig
    vs.foreach { case (in, want) => assert(Stemmers.stemSwedish(in) == want, s"sv($in)") }
  }

  test("Norwegian vectors") {
    val vs = Seq(
      "havnedistriktene" -> "havnedistrikt",     // step1 ene
      "forserte" -> "forser",                    // step1 erte -> er
      "forskerne" -> "forskern")                 // step1 e only
    vs.foreach { case (in, want) => assert(Stemmers.stemNorwegian(in) == want, s"no($in)") }
  }

  test("Danish vectors") {
    val vs = Seq(
      "indtagelsen" -> "indtag",                 // step1 en, step3 els
      "spændende" -> "spænd",                    // step1 ende
      "venligst" -> "ven")                       // step3 igst -> ig, then lig
    vs.foreach { case (in, want) => assert(Stemmers.stemDanish(in) == want, s"da($in)") }
  }

  test("Dutch vectors") {
    val vs = Seq(
      "lichamelijk" -> "licham",                 // step3b lijk + e-rule
      "gekken" -> "gek",                         // step1 en + undouble
      "lopen" -> "lop")                          // step1 en
    vs.foreach { case (in, want) => assert(Stemmers.stemDutch(in) == want, s"nl($in)") }
  }

  test("Russian vectors") {
    val vs = Seq(
      "книгами" -> "книг",                       // noun ами
      "красивый" -> "красив",                    // adjective ый
      "читавшие" -> "чита",                      // adjective ие + participle вш
      "делается" -> "дела")                      // reflexive ся + verb ет
    vs.foreach { case (in, want) => assert(Stemmers.stemRussian(in) == want, s"ru($in)") }
  }

  test("language chains = default chain + per-language stemming") {
    val de = Analysis.analyzeChain("de_stem", "Die Kinder und Bücher")
    assert(de.map(_.text) == Seq("die", "kind", "und", "buch"))
    val ru = Analysis.analyzeChain("ru_stem", "красивый дом")
    assert(ru.map(_.text) == Seq("красив", "дом"))
  }
}
