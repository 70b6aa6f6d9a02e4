package graft.analysis

/** Snowball Tamil stemmer (algorithm by Damodharan Rangarajan published at
  * snowballstem.org; the reference's `Stemmer` filter dispatches it via
  * rust-stemmers, `src/tokenizer/stemmer.rs:12-31`). Pipeline:
  * fix_ending → has_min_length(>4) → remove_question_prefixes →
  * remove_pronoun_prefixes (each followed by fix_va_start) →
  * remove_question_suffixes → remove_um → remove_common_word_endings →
  * remove_vetrumai_urupukal (sets found_vetrumai_urupu, read by
  * fix_ending's த்த் rule) → remove_plural_suffix →
  * remove_command_suffixes → repeated remove_tense_suffix, with
  * fix_endings re-normalizing after each removal step. Validated against
  * golden vectors harvested from the published implementation
  * (tools/gen_stem_vectors.py, GoldenStemSpec). Pure function, used
  * identically at index and query time.
  *
  * All Tamil code points are BMP so `String` indexing is per glyph; the
  * published length conditions count code points.
  */
object StemmersTamil {

  private final val Pulli = '்' // ்  U+0BCD virama
  private final val VowelSigns = "ீுூெேைாி".toSet // dependent vowel signs
  private final val IndependentVowels = "அஆஇஈஉஊஎஏஐஒஓஔ".toSet
  private final val HardConsonants = "கசடதபற".toSet // vallinam
  private final val SoftOrNasal = "யரலளழவஙஞணநனம".toSet

  @inline private def endsAt(w: String, i: Int, s: String): Boolean =
    i >= s.length && w.regionMatches(i - s.length, s, 0, s.length)
  @inline private def ends(w: String, s: String): Boolean =
    endsAt(w, w.length, s)

  /** One application of fix_ending: an ordered or-chain of ending
    * normalizations (sandhi reversal, doubled-consonant and pulli
    * cleanup). Returns None when no rule applies.
    */
  private def fixEnding(w: String, foundVetrumai: Boolean): Option[String] = {
    val n = w.length
    if (n <= 3) return None
    // 1. ந்த் / ந்த / ந் → delete (longest match)
    for (s <- Seq("ந்த்", "ந்த", "ந்"))
      if (ends(w, s)) return Some(w.dropRight(s.length))
    // 2. ய் preceded by ி/ீ/ை → drop ய்
    if (ends(w, "ய்") && n >= 3 && "ிீை".indexOf(w(n - 3)) >= 0)
      return Some(w.dropRight(2))
    // 3. sandhi: ட்ப் / ட்க் → ள்
    if (ends(w, "ட்ப்") || ends(w, "ட்க்"))
      return Some(w.dropRight(4) + "ள்")
    // 4. sandhi: ன்ற் → ல்
    if (ends(w, "ன்ற்")) return Some(w.dropRight(4) + "ல்")
    // 5. sandhi: ற்க் → ல்
    if (ends(w, "ற்க்")) return Some(w.dropRight(4) + "ல்")
    // 6. ட்ட் → டு
    if (ends(w, "ட்ட்")) return Some(w.dropRight(4) + "டு")
    // 7. (only after a case marker was removed) த்த் not preceded by ை → ம்
    if (foundVetrumai && ends(w, "த்த்") &&
        !(n >= 5 && w(n - 5) == 'ை'))
      return Some(w.dropRight(4) + "ம்")
    // 8. ுக் / ுக்க் → ்
    if (ends(w, "ுக்")) return Some(w.dropRight(3) + Pulli)
    if (ends(w, "ுக்க்")) return Some(w.dropRight(5) + Pulli)
    // 9. <hard>்<hard>் → delete all four
    if (n >= 4 && w(n - 1) == Pulli && HardConsonants(w(n - 2)) &&
        w(n - 3) == Pulli && HardConsonants(w(n - 4)))
      return Some(w.dropRight(4))
    // 10. (duplicate of 8 in the published code — unreachable, kept for
    // fidelity of the chain shape)
    if (ends(w, "ுக்")) return Some(w.dropRight(3) + Pulli)
    // 11. final <hard>் → delete it
    if (n >= 2 && w(n - 1) == Pulli && HardConsonants(w(n - 2)))
      return Some(w.dropRight(2))
    // 12. ்<soft|nasal>் → ் (degemination)
    if (n >= 3 && w(n - 1) == Pulli && SoftOrNasal(w(n - 2)) &&
        w(n - 3) == Pulli)
      return Some(w.dropRight(2))
    // 13. final வ் / ய / வ → delete
    for (s <- Seq("வ்", "ய", "வ"))
      if (ends(w, s)) return Some(w.dropRight(s.length))
    // 14. னு not preceded by a vowel sign → delete
    if (ends(w, "னு") && !(n >= 3 && VowelSigns(w(n - 3))))
      return Some(w.dropRight(2))
    // 15. ங் not preceded by ை → ம்
    if (ends(w, "ங்") && !(n >= 3 && w(n - 3) == 'ை'))
      return Some(w.dropRight(2) + "ம்")
    // 16. ங் (after ை) → delete
    if (ends(w, "ங்")) return Some(w.dropRight(2))
    // 17. final ் preceded by a vowel sign or another ் → delete it
    if (w(n - 1) == Pulli && n >= 2 &&
        (VowelSigns(w(n - 2)) || w(n - 2) == Pulli))
      return Some(w.dropRight(1))
    None
  }

  private def fixEndings(w0: String, foundVetrumai: Boolean): String = {
    var w = w0
    var more = true
    while (more) fixEnding(w, foundVetrumai) match {
      case Some(x) => w = x
      case None => more = false
    }
    w
  }

  /** fix_va_start: வோ→ஓ, வொ→ஒ, வு→உ, வூ→ஊ at the word start. */
  private def fixVaStart(w: String): String =
    if (w.startsWith("வோ")) "ஓ" + w.substring(2)
    else if (w.startsWith("வொ")) "ஒ" + w.substring(2)
    else if (w.startsWith("வு")) "உ" + w.substring(2)
    else if (w.startsWith("வூ")) "ஊ" + w.substring(2)
    else w

  private final val PrefixConsonants = "கஙசஞதநபமயவ".toSet

  def stemTamil(input: String): String = {
    var w = input
    var foundVetrumai = false

    // do fix_ending (single application, before the length gate)
    fixEnding(w, foundVetrumai).foreach(w = _)
    if (w.length <= 4) return w

    // remove_question_prefixes: எ + C + ் → delete, then fix_va_start
    if (w.length >= 3 && w(0) == 'எ' && PrefixConsonants(w(1)) &&
        w(2) == Pulli) {
      w = fixVaStart(w.substring(3))
    }
    // remove_pronoun_prefixes: (அ|இ|உ) + C + ் → delete, then fix_va_start
    if (w.length >= 3 && "அஇஉ".indexOf(w(0)) >= 0 &&
        PrefixConsonants(w(1)) && w(2) == Pulli) {
      w = fixVaStart(w.substring(3))
    }

    // remove_question_suffixes: (ே|ோ|ா) → ், then fix_endings
    if (w.length > 4) {
      if ("ேோா".indexOf(w(w.length - 1)) >= 0)
        w = w.dropRight(1) + Pulli
      w = fixEndings(w, foundVetrumai)
    }

    // remove_um: ும் → ், then fix_ending once
    if (w.length > 4 && ends(w, "ும்")) {
      w = w.dropRight(3) + Pulli
      fixEnding(w, foundVetrumai).foreach(w = _)
    }

    // remove_common_word_endings
    if (w.length > 4) {
      val toPulli = Seq("ுடன்", "ில்லை", "ிடம்", "ின்றி", "ாகி", "ாகிய",
        "ென்று", "ுள்ள", "ுடைய", "ுடை", "ெனும்")
      var matched = toPulli.find(ends(w, _)) match {
        case Some(s) => w = w.dropRight(s.length) + Pulli; true
        case None =>
          if (ends(w, "ல்ல") &&
              !(w.length >= 4 && VowelSigns(w(w.length - 4)))) {
            w = w.dropRight(3) + Pulli; true
          } else if (ends(w, "ென") || ends(w, "ாகி")) {
            w = w.dropRight(if (ends(w, "ென")) 2 else 3) + Pulli; true
          } else false
      }
      if (!matched) {
        val del = Seq("பட்டு", "விட்டு", "படு", "விடு", "பட்டது",
          "ெல்லாம்", "பட்டண", "படிதான", "பட்ட", "தான", "குரிய", "படி",
          "பற்றி")
        del.filter(ends(w, _)).sortBy(-_.length).headOption.foreach { s =>
          w = w.dropRight(s.length); matched = true
        }
      }
      if (matched) w = fixEndings(w, foundVetrumai)
    }

    // remove_vetrumai_urupukal (case markers); sets found_vetrumai_urupu
    if (w.length > 4) {
      var matched = true
      if (ends(w, "னை")) w = w.dropRight(2)
      else if (ends(w, "ினை") &&
               !(w.length >= 4 && HardConsonants(w(w.length - 4))))
        w = w.dropRight(3) + Pulli
      else if (ends(w, "ை") && w.length >= 2 &&
               !HardConsonants(w(w.length - 2)))
        w = w.dropRight(1) + Pulli
      else if (ends(w, "ை") && w.length >= 3 &&
               HardConsonants(w(w.length - 2)) && w(w.length - 3) == Pulli)
        w = w.dropRight(1) + Pulli
      else {
        val toPulli = Seq("ொடு", "ோடு", "ில்", "ிற்", "ின்று", "ிருந்து",
          "விட", "ால்", "ுடை", "ாமல்", "ுள்")
        val inNotAfterMa = ends(w, "ின்") &&
          !(w.length >= 4 && w(w.length - 4) == 'ம')
        val idam7 = w.length > 6 && ends(w, "ிடம்")
        val lNotAfterSign = ends(w, "ல்") &&
          !(w.length >= 3 && VowelSigns(w(w.length - 3)))
        toPulli.find(ends(w, _)) match {
          case Some(s) if s != "ின்று" || !inNotAfterMa =>
            // ordered per the published chain: ின் (guarded) sits between
            // ிற் and ின்று, so try it in sequence
            val chain: Seq[(Boolean, Int)] = Seq(
              (ends(w, "ொடு"), 3), (ends(w, "ோடு"), 3),
              (ends(w, "ில்"), 3), (ends(w, "ிற்"), 3),
              (inNotAfterMa, 3), (ends(w, "ின்று"), 5),
              (ends(w, "ிருந்து"), 7), (ends(w, "விட"), 3),
              (idam7, 4), (ends(w, "ால்"), 3), (ends(w, "ுடை"), 3),
              (ends(w, "ாமல்"), 4), (lNotAfterSign, 2),
              (ends(w, "ுள்"), 3))
            chain.find(_._1) match {
              case Some((_, k)) => w = w.dropRight(k) + Pulli
              case None => matched = false
            }
          case _ =>
            val chain: Seq[(Boolean, Int)] = Seq(
              (inNotAfterMa, 3), (ends(w, "ின்று"), 5), (idam7, 4),
              (lNotAfterSign, 2))
            chain.find(_._1) match {
              case Some((_, k)) => w = w.dropRight(k) + Pulli
              case None =>
                val del = Seq("கண்", "முன்", "மேல்", "மேற்", "கீழ்",
                  "பின்")
                del.find(ends(w, _)) match {
                  case Some(s) => w = w.dropRight(s.length)
                  case None =>
                    if (ends(w, "து") &&
                        !(w.length >= 3 && VowelSigns(w(w.length - 3)))) {
                      w = w.dropRight(2)
                    } else if (ends(w, "ீ")) {
                      w = w.dropRight(1) + "ி" // long ீ → short ி
                    } else matched = false
                }
            }
        }
      }
      if (matched) {
        foundVetrumai = true
        if (ends(w, "ின்")) w = w.dropRight(3) + Pulli
        w = fixEndings(w, foundVetrumai)
      }
    }

    // remove_plural_suffix (no length gate)
    locally {
      if (ends(w, "ுங்கள்") &&
          !(w.length >= 7 && HardConsonants(w(w.length - 7))))
        w = w.dropRight(6) + Pulli
      else if (ends(w, "ற்கள்")) w = w.dropRight(5) + "ல்"
      else if (ends(w, "ட்கள்")) w = w.dropRight(5) + "ள்"
      else if (ends(w, "கள்")) w = w.dropRight(3)
    }

    // remove_command_suffixes: final பி / வி → delete
    if (w.length > 4 && (ends(w, "பி") || ends(w, "வி")))
      w = w.dropRight(2)

    // remove_tense_suffixes: repeat remove_tense_suffix while it matches
    var again = true
    while (again) {
      again = false
      if (w.length > 4) {
        val before = w
        var matched = true
        // participle markers first
        if (ends(w, "கொண்டிர்")) w = w.dropRight(8)
        else if (ends(w, "படு")) w = w.dropRight(3)
        else {
          val del = Seq("மார்", "மின்", "னன்", "னான்", "னாள்", "னார்")
          del.find(ends(w, _)) match {
            case Some(s) => w = w.dropRight(s.length)
            case None =>
              if (ends(w, "வன்") &&
                  !(w.length >= 4 && IndependentVowels(w(w.length - 4)))) {
                w = w.dropRight(3)
              } else {
                val del2 = Seq("னள்", "வள்", "னர்", "வர்", "ன", "ப", "க",
                  "த", "ய")
                del2.find(ends(w, _)) match {
                  case Some(s) => w = w.dropRight(s.length)
                  case None =>
                    val del3 = Seq("பன்", "பள்", "பர்")
                    del3.find(ends(w, _)) match {
                      case Some(s) => w = w.dropRight(s.length)
                      case None =>
                        if (ends(w, "து") &&
                            !(w.length >= 3 &&
                              VowelSigns(w(w.length - 3)))) {
                          w = w.dropRight(2)
                        } else {
                          val del4 = Seq("ிற்று", "பம்", "னம்", "தும்",
                            "றும்", "கும்", "னென்", "னை", "வை")
                          del4.find(ends(w, _)) match {
                            case Some(s) => w = w.dropRight(s.length)
                            case None => matched = false
                          }
                        }
                    }
                }
              }
          }
        }
        if (!matched) {
          matched = true
          if (ends(w, "ான்") &&
              !(w.length >= 4 && w(w.length - 4) == 'ச'))
            w = w.dropRight(3) + Pulli
          else {
            val toPulli = Seq("ாள்", "ார்", "ேன்", "ா", "ாம்", "ெம்",
              "ேம்", "ோம்", "கும்", "தும்", "டும்", "றும்", "ாய்",
              "னென்", "னிர்", "ீர்", "ீயர்")
            toPulli.find(ends(w, _)) match {
              case Some(s) => w = w.dropRight(s.length) + Pulli
              case None =>
                if (ends(w, "கு") && w.length >= 3 &&
                    w(w.length - 3) == Pulli)
                  w = w.dropRight(2)
                else if (ends(w, "து") && w.length >= 3 &&
                         w(w.length - 3) == Pulli)
                  w = w.dropRight(2)
                else matched = false
            }
          }
        }
        // aspect markers (கிற / கின்ற / ாநின்ற, with/without final ்)
        locally {
          val asp = Seq("கின்ற்", "ாநின்ற்", "கிற்", "கின்ற", "ாநின்ற",
            "கிற")
          asp.find(ends(w, _)).foreach { s =>
            w = w.dropRight(s.length); matched = true
          }
        }
        w = fixEndings(w, foundVetrumai)
        if (matched && w != before) again = true
      }
    }
    w
  }
}
