package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.{Analysis, StemmersRomance}

/** Romance Snowball vectors (the reference's per-language `Stemmer` filter,
  * `src/tokenizer/stemmer.rs:12-31`). Expected values derived step-by-step
  * from the published Snowball algorithm pages — each vector exercises a
  * distinct rule path (step-0 pronouns, R1/R2-gated standard suffixes, verb
  * suffixes, residuals, and the per-language postludes).
  */
class StemmersRomanceSpec extends AnyFunSuite {

  test("Spanish vectors") {
    val vs = Seq(
      "calculadora" -> "calcul",     // step1 adora (R2)
      "aplicaciones" -> "aplic",     // step1 aciones; ic kept (not in R2)
      "canciones" -> "cancion",      // step2b es (RV)
      "comiendo" -> "com",           // step2b iendo
      "baratos" -> "barat",          // step3 residual os
      "niñas" -> "niñ",              // step2b as
      "fácilmente" -> "facil",       // step1 mente (R2) + accent postlude
      "grandioso" -> "grandios",     // oso blocked (R2); step3 o
      "torno" -> "torn")             // step3 residual o
    vs.foreach { case (in, want) =>
      assert(StemmersRomance.stemSpanish(in) == want, s"es($in)") }
  }

  test("Italian vectors") {
    val vs = Seq(
      "abbandonata" -> "abbandon",       // step2 ata
      "caratteristiche" -> "caratterist", // step1 iche (R2)
      "felicità" -> "felic",             // step1 ità; ic kept (not in R2)
      "generazione" -> "gener",          // step1 azione (R2)
      "nazionale" -> "nazional",         // step3a final e
      "pronto" -> "pront")               // step3a final o
    vs.foreach { case (in, want) =>
      assert(StemmersRomance.stemItalian(in) == want, s"it($in)") }
  }

  test("Portuguese vectors") {
    val vs = Seq(
      "bonita" -> "bonit",           // step4 residual a
      "meninas" -> "menin",          // step2 as
      "grandes" -> "grand",          // step2 es
      "felicidade" -> "felic",       // step1 idade; ic kept
      "amoroso" -> "amor",           // step1 oso (R2)
      "importância" -> "import",     // step1 ância (R2)
      "corações" -> "coraçõ")        // nasal prelude + step2 es + postlude
    vs.foreach { case (in, want) =>
      assert(StemmersRomance.stemPortuguese(in) == want, s"pt($in)") }
  }

  test("French vectors") {
    val vs = Seq(
      "continuellement" -> "continuel", // step1 ement (RV) + step5 undouble
      "majestueux" -> "majestu",        // step1 eux (R2)
      "effectivement" -> "effect",      // step1 ement + iv (R2)
      "possibilité" -> "possibil",      // step1 ité (R2)
      "vraiment" -> "vrai",             // step1 ment after vowel (RV)
      "récemment" -> "récent")          // step1 emment -> ent
    vs.foreach { case (in, want) =>
      assert(StemmersRomance.stemFrench(in) == want, s"fr($in)") }
  }

  test("language chains = default chain + per-language stemming") {
    val es = Analysis.analyzeChain("es_stem", "Las Canciones Baratas")
    assert(es.map(_.text) == Seq("las", "cancion", "barat"))
    val fr = Analysis.analyzeChain("fr_stem", "effectivement vraiment")
    assert(fr.map(_.text) == Seq("effect", "vrai"))
    val it = Analysis.analyzeChain("it_stem", "generazione nazionale")
    assert(it.map(_.text) == Seq("gener", "nazional"))
    val pt = Analysis.analyzeChain("pt_stem", "meninas bonita")
    assert(pt.map(_.text) == Seq("menin", "bonit"))
  }
}
