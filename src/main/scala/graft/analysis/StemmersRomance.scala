package graft.analysis

/** Romance-language Snowball stemmers — French, Spanish, Italian, Portuguese —
  * four of the languages the reference's `Stemmer` filter dispatches
  * (`src/tokenizer/stemmer.rs:12-31`). Implemented from the published Snowball
  * specifications (snowballstem.org algorithm pages) with the shared Snowball
  * machinery: longest-suffix "among" semantics (if the longest matching suffix
  * fails its region condition, NO shorter suffix is tried), fixed absolute
  * R1/R2/RV offsets computed once up front, and per-language preludes that
  * mark semivowels as consonants (U/I/Y).
  *
  * Pure functions; used identically at index and query time via
  * `Analysis.analyzeChain` (fr_stem / es_stem / it_stem / pt_stem).
  */
object StemmersRomance {

  /** Standard region start: after the first non-vowel following a vowel,
    * scanning from `from`.
    */
  private def regionStart(w: String, from: Int, isVowel: Char => Boolean): Int = {
    var i = from
    while (i < w.length && !isVowel(w(i))) i += 1
    while (i < w.length && isVowel(w(i))) i += 1
    if (i < w.length) i + 1 else w.length
  }

  /** Spanish/Italian/Portuguese RV: if the second letter is a consonant, RV is
    * after the next vowel; if the first two letters are vowels, after the next
    * consonant; otherwise (consonant-vowel) after the third letter.
    */
  private def romanceRV(w: String, isV: Char => Boolean): Int = {
    if (w.length < 3) w.length
    else if (!isV(w(1))) {
      var i = 2
      while (i < w.length && !isV(w(i))) i += 1
      if (i < w.length) i + 1 else w.length
    } else if (isV(w(0)) && isV(w(1))) {
      var i = 2
      while (i < w.length && isV(w(i))) i += 1
      if (i < w.length) i + 1 else w.length
    } else 3
  }

  // =========================================================================
  // Spanish (Snowball "spanish")
  // =========================================================================

  private val esVowels = "aeiouáéíóúü".toSet

  private val esG1 = Set("anza", "anzas", "ico", "ica", "icos", "icas", "ismo",
    "ismos", "able", "ables", "ible", "ibles", "ista", "istas", "oso", "osa",
    "osos", "osas", "amiento", "amientos", "imiento", "imientos")
  private val esG2 = Set("adora", "ador", "ación", "adoras", "adores",
    "aciones", "ante", "antes", "ancia", "ancias")
  private val esG3 = Set("logía", "logías")
  private val esG4 = Set("ución", "uciones")
  private val esG5 = Set("encia", "encias")
  private val esG7 = Set("mente")
  private val esG8 = Set("idad", "idades")
  private val esG9 = Set("iva", "ivo", "ivas", "ivos")
  private val esStep1All =
    (esG1 ++ esG2 ++ esG3 ++ esG4 ++ esG5 ++ Set("amente") ++ esG7 ++ esG8 ++ esG9)
      .toSeq.sortBy(s => (-s.length, s))

  private val esStep2aY = Seq("yamos", "yeron", "yendo", "yais", "yan", "yen",
    "yas", "yes", "ya", "ye", "yo", "yó").sortBy(s => (-s.length, s))
  private val esStep2bGu = Set("en", "es", "éis", "emos")
  private val esStep2bRest = Set(
    "arían", "arías", "arán", "arás", "aríais", "aría", "aréis", "aríamos",
    "aremos", "ará", "aré", "erían", "erías", "erán", "erás", "eríais", "ería",
    "eréis", "eríamos", "eremos", "erá", "eré", "irían", "irías", "irán",
    "irás", "iríais", "iría", "iréis", "iríamos", "iremos", "irá", "iré",
    "aba", "ada", "ida", "ía", "ara", "iera", "ad", "ed", "id", "ase", "iese",
    "aste", "iste", "an", "aban", "ían", "aran", "ieran", "asen", "iesen",
    "aron", "ieron", "ado", "ido", "ando", "iendo", "ió", "ar", "er", "ir",
    "as", "abas", "adas", "idas", "ías", "aras", "ieras", "ases", "ieses",
    "ís", "áis", "abais", "íais", "arais", "ierais", "aseis", "ieseis",
    "asteis", "isteis", "ados", "idos", "amos", "ábamos", "íamos", "imos",
    "áramos", "iéramos", "iésemos", "ásemos")
  private val esStep2bAll =
    (esStep2bGu ++ esStep2bRest).toSeq.sortBy(s => (-s.length, s))

  def stemSpanish(input: String): String = {
    if (input.isEmpty) return input
    var w = input
    @inline def isV(c: Char) = esVowels(c)
    val rv = romanceRV(w, isV)
    val r1 = regionStart(w, 0, isV)
    val r2 = regionStart(w, r1, isV)
    @inline def inRV(len: Int): Boolean = w.length - len >= rv
    @inline def inR1(len: Int): Boolean = w.length - len >= r1
    @inline def inR2(len: Int): Boolean = w.length - len >= r2

    // ---- step 0: attached pronoun (within RV), after gerund/infinitive
    locally {
      val pronouns = Seq("selas", "selos", "sela", "selo", "las", "les",
        "los", "nos", "me", "se", "la", "le", "lo").sortBy(s => (-s.length, s))
      pronouns.find(p => w.endsWith(p) && w.length - p.length >= rv).foreach { p =>
        val stem = w.dropRight(p.length)
        val accented = Seq("iéndo", "ándo", "ár", "ér", "ír")
          .find(g => stem.endsWith(g) && stem.length - g.length >= rv)
        accented match {
          case Some(g) =>
            val repl = g match {
              case "iéndo" => "iendo"; case "ándo" => "ando"
              case "ár" => "ar"; case "ér" => "er"; case _ => "ir"
            }
            w = stem.dropRight(g.length) + repl
          case None =>
            val plain = Seq("iendo", "ando", "ar", "er", "ir")
              .find(g => stem.endsWith(g) && stem.length - g.length >= rv)
            if (plain.isDefined) w = stem
            else if (stem.endsWith("yendo") && stem.length >= 6 &&
                     stem(stem.length - 6) == 'u' && stem.length - 6 >= rv)
              w = stem
        }
      }
    }

    // ---- step 1: standard suffix removal
    val before1 = w
    esStep1All.find(w.endsWith) match {
      case Some(s) if esG1(s) =>
        if (inR2(s.length)) w = w.dropRight(s.length)
      case Some(s) if esG2(s) =>
        if (inR2(s.length)) {
          w = w.dropRight(s.length)
          if (w.endsWith("ic") && inR2(2)) w = w.dropRight(2)
        }
      case Some(s) if esG3(s) =>
        if (inR2(s.length)) w = w.dropRight(s.length) + "log"
      case Some(s) if esG4(s) =>
        if (inR2(s.length)) w = w.dropRight(s.length) + "u"
      case Some(s) if esG5(s) =>
        if (inR2(s.length)) w = w.dropRight(s.length) + "ente"
      case Some("amente") =>
        if (inR1(6)) {
          w = w.dropRight(6)
          if (w.endsWith("iv") && inR2(2)) {
            w = w.dropRight(2)
            if (w.endsWith("at") && inR2(2)) w = w.dropRight(2)
          } else Seq("os", "ic", "ad").find(w.endsWith) match {
            case Some(_) if inR2(2) => w = w.dropRight(2)
            case _                  => ()
          }
        }
      case Some(s) if esG7(s) =>
        if (inR2(5)) {
          w = w.dropRight(5)
          Seq("ante", "able", "ible").find(w.endsWith) match {
            case Some(p) if inR2(p.length) => w = w.dropRight(p.length)
            case _                         => ()
          }
        }
      case Some(s) if esG8(s) =>
        if (inR2(s.length)) {
          w = w.dropRight(s.length)
          Seq("abil", "ic", "iv").find(w.endsWith) match {
            case Some(p) if inR2(p.length) => w = w.dropRight(p.length)
            case _                         => ()
          }
        }
      case Some(s) if esG9(s) =>
        if (inR2(s.length)) {
          w = w.dropRight(s.length)
          if (w.endsWith("at") && inR2(2)) w = w.dropRight(2)
        }
      case _ => ()
    }

    // ---- step 2a/2b: verb suffixes (only if step 1 removed nothing)
    if (w == before1) {
      val y = esStep2aY.find(s => w.endsWith(s) && inRV(s.length) &&
        w.length > s.length && w(w.length - s.length - 1) == 'u')
      y match {
        case Some(s) => w = w.dropRight(s.length)
        case None =>
          // among limited to RV: the longest suffix that FITS the region
          // matches (a longer one crossing RV does not shadow it)
          esStep2bAll.find(s => w.endsWith(s) && inRV(s.length)) match {
            case Some(s) =>
              w = w.dropRight(s.length)
              if (esStep2bGu(s) && w.endsWith("gu")) w = w.dropRight(1)
            case _ => ()
          }
      }
    }

    // ---- step 3: residual suffix
    Seq("os", "a", "o", "á", "í", "ó", "e", "é").find(w.endsWith) match {
      case Some(s @ ("e" | "é")) =>
        if (inRV(s.length)) {
          w = w.dropRight(s.length)
          if (w.endsWith("gu") && inRV(1)) w = w.dropRight(1)
        }
      case Some(s) => if (inRV(s.length)) w = w.dropRight(s.length)
      case None    => ()
    }

    // postlude: strip acute accents
    w.map {
      case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'
      case 'ó' => 'o'; case 'ú' => 'u'; case c => c
    }
  }

  // =========================================================================
  // Italian (Snowball "italian")
  // =========================================================================

  private val itVowels = "aeiouàèìòù".toSet

  private val itG1 = Set("anza", "anze", "ico", "ici", "ica", "ice", "iche",
    "ichi", "ismo", "ismi", "abile", "abili", "ibile", "ibili", "ista", "iste",
    "isti", "istà", "istè", "istì", "oso", "osi", "osa", "ose", "mente",
    "atrice", "atrici", "ante", "anti")
  private val itG2 = Set("azione", "azioni", "atore", "atori")
  private val itG3 = Set("logia", "logie")
  private val itG4 = Set("uzione", "uzioni", "usione", "usioni")
  private val itG5 = Set("enza", "enze")
  private val itG6 = Set("amento", "amenti", "imento", "imenti")
  private val itG8 = Set("ità")
  private val itG9 = Set("ivo", "ivi", "iva", "ive")
  private val itStep1All =
    (itG1 ++ itG2 ++ itG3 ++ itG4 ++ itG5 ++ itG6 ++ Set("amente") ++ itG8 ++ itG9)
      .toSeq.sortBy(s => (-s.length, s))

  private val itStep2 = Seq(
    "ammo", "ando", "ano", "are", "arono", "asse", "assi", "assimo", "ata",
    "ate", "ati", "ato", "ava", "avamo", "avano", "avate", "avi", "avo",
    "emmo", "enda", "ende", "endi", "endo", "erà", "erai", "eranno", "ere",
    "erebbe", "erebbero", "erei", "eremmo", "eremo", "ereste", "eresti",
    "erete", "erò", "erono", "essero", "ete", "eva", "evamo", "evano",
    "evate", "evi", "evo", "Yamo", "iamo", "immo", "irà", "irai", "iranno",
    "ire", "irebbe", "irebbero", "irei", "iremmo", "iremo", "ireste",
    "iresti", "irete", "irò", "irono", "isca", "iscano", "isce", "isci",
    "isco", "iscono", "issero", "ita", "ite", "iti", "ito", "iva", "ivamo",
    "ivano", "ivate", "ivi", "ivo", "ono", "uta", "ute", "uti", "uto",
    "ar", "ir").sortBy(s => (-s.length, s))

  def stemItalian(input: String): String = {
    if (input.isEmpty) return input
    // prelude: acute -> grave; u after q -> U; u/i between vowels -> U/I
    var w = input.map {
      case 'á' => 'à'; case 'é' => 'è'; case 'í' => 'ì'
      case 'ó' => 'ò'; case 'ú' => 'ù'; case c => c
    }
    locally {
      val sb = new StringBuilder(w)
      var i = 0
      while (i < sb.length) {
        val c = sb(i)
        if (c == 'u' && i > 0 && sb(i - 1) == 'q') sb(i) = 'U'
        else if ((c == 'u' || c == 'i') && i > 0 && i < sb.length - 1 &&
                 itVowels(sb(i - 1)) && itVowels(sb(i + 1)))
          sb(i) = (c - 32).toChar
        i += 1
      }
      w = sb.toString
    }
    @inline def isV(c: Char) = itVowels(c)
    val rv = romanceRV(w, isV)
    val r1 = regionStart(w, 0, isV)
    val r2 = regionStart(w, r1, isV)
    @inline def inRV(len: Int): Boolean = w.length - len >= rv
    @inline def inR1(len: Int): Boolean = w.length - len >= r1
    @inline def inR2(len: Int): Boolean = w.length - len >= r2

    // ---- step 0: attached pronoun (within RV)
    locally {
      val pronouns = Seq("gliela", "gliele", "glieli", "glielo", "gliene",
        "sene", "mela", "mele", "meli", "melo", "mene", "tela", "tele",
        "teli", "telo", "tene", "cela", "cele", "celi", "celo", "cene",
        "vela", "vele", "veli", "velo", "vene", "gli", "ci", "la", "le",
        "li", "lo", "mi", "ne", "si", "ti", "vi").sortBy(s => (-s.length, s))
      pronouns.find(p => w.endsWith(p) && w.length - p.length >= rv).foreach { p =>
        val stem = w.dropRight(p.length)
        val ger = Seq("ando", "endo")
          .find(g => stem.endsWith(g) && stem.length - g.length >= rv)
        ger match {
          case Some(_) => w = stem
          case None =>
            val inf = Seq("ar", "er", "ir")
              .find(g => stem.endsWith(g) && stem.length - g.length >= rv)
            if (inf.isDefined) w = stem + "e"
        }
      }
    }

    // ---- step 1: standard suffix removal
    val before1 = w
    itStep1All.find(w.endsWith) match {
      case Some(s) if itG1(s) =>
        if (inR2(s.length)) w = w.dropRight(s.length)
      case Some(s) if itG2(s) =>
        if (inR2(s.length)) {
          w = w.dropRight(s.length)
          if (w.endsWith("ic") && inR2(2)) w = w.dropRight(2)
        }
      case Some(s) if itG3(s) =>
        if (inR2(s.length)) w = w.dropRight(s.length) + "log"
      case Some(s) if itG4(s) =>
        if (inR2(s.length)) w = w.dropRight(s.length) + "u"
      case Some(s) if itG5(s) =>
        if (inR2(s.length)) w = w.dropRight(s.length) + "ente"
      case Some(s) if itG6(s) =>
        if (inRV(s.length)) w = w.dropRight(s.length)
      case Some("amente") =>
        if (inR1(6)) {
          w = w.dropRight(6)
          if (w.endsWith("iv") && inR2(2)) {
            w = w.dropRight(2)
            if (w.endsWith("at") && inR2(2)) w = w.dropRight(2)
          } else Seq("abil", "os", "ic").find(w.endsWith) match {
            case Some(p) if inR2(p.length) => w = w.dropRight(p.length)
            case _                         => ()
          }
        }
      case Some(s) if itG8(s) =>
        if (inR2(s.length)) {
          w = w.dropRight(s.length)
          Seq("abil", "ic", "iv").find(w.endsWith) match {
            case Some(p) if inR2(p.length) => w = w.dropRight(p.length)
            case _                         => ()
          }
        }
      case Some(s) if itG9(s) =>
        if (inR2(s.length)) {
          w = w.dropRight(s.length)
          if (w.endsWith("at") && inR2(2)) {
            w = w.dropRight(2)
            if (w.endsWith("ic") && inR2(2)) w = w.dropRight(2)
          }
        }
      case _ => ()
    }

    // ---- step 2: verb suffixes (only if step 1 removed nothing);
    // among limited to RV — longest suffix that fits the region
    if (w == before1) {
      itStep2.find(s => w.endsWith(s) && inRV(s.length)) match {
        case Some(s) => w = w.dropRight(s.length)
        case _       => ()
      }
    }

    // ---- step 3a: final vowel (and a preceding i) in RV
    if (w.nonEmpty && "aeioàèìò".contains(w.last) && inRV(1)) {
      w = w.dropRight(1)
      if (w.endsWith("i") && inRV(1)) w = w.dropRight(1)
    }
    // ---- step 3b: ch -> c, gh -> g in RV
    if ((w.endsWith("ch") || w.endsWith("gh")) && inRV(2)) w = w.dropRight(1)

    w.map { case 'U' => 'u'; case 'I' => 'i'; case c => c }
  }

  // =========================================================================
  // Portuguese (Snowball "portuguese")
  // =========================================================================

  private val ptVowels = "aeiouáéíóúâêô".toSet

  private val ptG1 = Set("eza", "ezas", "ico", "ica", "icos", "icas", "ismo",
    "ismos", "ável", "ível", "ista", "istas", "oso", "osa", "osos", "osas",
    "amento", "amentos", "imento", "imentos", "adora", "ador", "aça~o",
    "adoras", "adores", "aço~es", "ante", "antes", "ância")
  private val ptG3 = Set("logia", "logias")
  private val ptG4 = Set("uça~o", "uço~es")
  private val ptG5 = Set("ência", "ências")
  private val ptG7 = Set("mente")
  private val ptG8 = Set("idade", "idades")
  private val ptG9 = Set("iva", "ivo", "ivas", "ivos")
  private val ptGIra = Set("ira", "iras")
  private val ptStep1All =
    (ptG1 ++ ptG3 ++ ptG4 ++ ptG5 ++ Set("amente") ++ ptG7 ++ ptG8 ++ ptG9 ++ ptGIra)
      .toSeq.sortBy(s => (-s.length, s))

  private val ptStep2 = Seq(
    "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá", "era",
    "irá", "ava", "asse", "esse", "isse", "aste", "este", "iste", "ei",
    "arei", "erei", "irei", "am", "iam", "ariam", "eriam", "iriam", "aram",
    "eram", "iram", "avam", "em", "arem", "erem", "irem", "assem", "essem",
    "issem", "ado", "ido", "ando", "endo", "indo", "ara~o", "era~o", "ira~o",
    "ira", "iras",
    "ar", "er", "ir", "as", "adas", "idas", "ias", "arias", "erias", "irias",
    "arás", "aras", "erás", "eras", "irás", "avas", "es", "ardes", "erdes",
    "irdes", "ares", "eres", "ires", "asses", "esses", "isses", "astes",
    "estes", "istes", "is", "ais", "iais", "ariais", "eriais", "iriais",
    "áreis", "areis", "éreis", "ereis", "íreis", "ireis", "ásseis",
    "ésseis", "ísseis", "áveis", "ados", "idos", "ámos", "amos", "íamos",
    "iamos", "aríamos", "eríamos", "iríamos", "áramos", "éramos", "íramos",
    "ávamos", "emos", "aremos", "eremos", "iremos", "ássemos", "êssemos",
    "íssemos", "imos", "armos", "ermos", "irmos", "eu", "iu", "ou")
    .sortBy(s => (-s.length, s))

  def stemPortuguese(input: String): String = {
    if (input.isEmpty) return input
    // prelude: nasal vowels marked as two-char sequences a~ / o~
    var w = input.replace("ã", "a~").replace("õ", "o~")
    @inline def isV(c: Char) = ptVowels(c)
    val rv = romanceRV(w, isV)
    val r1 = regionStart(w, 0, isV)
    val r2 = regionStart(w, r1, isV)
    @inline def inRV(len: Int): Boolean = w.length - len >= rv
    @inline def inR1(len: Int): Boolean = w.length - len >= r1
    @inline def inR2(len: Int): Boolean = w.length - len >= r2

    // ---- step 1: standard suffix removal
    val before1 = w
    ptStep1All.find(w.endsWith) match {
      case Some(s) if ptG1(s) =>
        if (inR2(s.length)) w = w.dropRight(s.length)
      case Some(s) if ptG3(s) =>
        if (inR2(s.length)) w = w.dropRight(s.length) + "log"
      case Some(s) if ptG4(s) =>
        if (inR2(s.length)) w = w.dropRight(s.length) + "u"
      case Some(s) if ptG5(s) =>
        if (inR2(s.length)) w = w.dropRight(s.length) + "ente"
      case Some("amente") =>
        if (inR1(6)) {
          w = w.dropRight(6)
          if (w.endsWith("iv") && inR2(2)) {
            w = w.dropRight(2)
            if (w.endsWith("at") && inR2(2)) w = w.dropRight(2)
          } else Seq("os", "ic", "ad").find(w.endsWith) match {
            case Some(_) if inR2(2) => w = w.dropRight(2)
            case _                  => ()
          }
        }
      case Some(s) if ptG7(s) =>
        if (inR2(5)) {
          w = w.dropRight(5)
          Seq("ante", "avel", "ível").find(w.endsWith) match {
            case Some(p) if inR2(p.length) => w = w.dropRight(p.length)
            case _                         => ()
          }
        }
      case Some(s) if ptG8(s) =>
        if (inR2(s.length)) {
          w = w.dropRight(s.length)
          Seq("abil", "ic", "iv").find(w.endsWith) match {
            case Some(p) if inR2(p.length) => w = w.dropRight(p.length)
            case _                         => ()
          }
        }
      case Some(s) if ptG9(s) =>
        if (inR2(s.length)) {
          w = w.dropRight(s.length)
          if (w.endsWith("at") && inR2(2)) w = w.dropRight(2)
        }
      case Some(s) if ptGIra(s) =>
        if (inRV(s.length) && w.length > s.length &&
            w(w.length - s.length - 1) == 'e')
          w = w.dropRight(s.length) + "ir"
      case _ => ()
    }

    // ---- step 2: verb suffixes (only if step 1 removed nothing);
    // among limited to RV — longest suffix that fits the region
    if (w == before1) {
      ptStep2.find(s => w.endsWith(s) && inRV(s.length)) match {
        case Some(s) => w = w.dropRight(s.length)
        case _       => ()
      }
    }

    // ---- step 3 / step 4
    if (w != before1) {
      // altered: delete final i preceded by c, i in RV
      if (w.endsWith("ci") && inRV(1)) w = w.dropRight(1)
    } else {
      // unaltered: residual suffix
      Seq("os", "a", "i", "o", "á", "í", "ó").find(w.endsWith) match {
        case Some(s) if inRV(s.length) => w = w.dropRight(s.length)
        case _                         => ()
      }
    }

    // ---- step 5: final e/é/ê in RV (with gu/ci absorption); ç -> c
    if (w.nonEmpty && "eéê".contains(w.last) && inRV(1)) {
      w = w.dropRight(1)
      if (w.endsWith("gu") && inRV(1)) w = w.dropRight(1)
      else if (w.endsWith("ci") && inRV(1)) w = w.dropRight(1)
    } else if (w.endsWith("ç")) w = w.dropRight(1) + "c"

    // postlude: restore nasal vowels
    w.replace("a~", "ã").replace("o~", "õ")
  }

  // =========================================================================
  // French (Snowball "french")
  // =========================================================================

  private val frVowels = "aeiouyâàëéêèïîôûù".toSet

  private val frGA = Set("ance", "iqUe", "isme", "able", "iste", "eux",
    "ances", "iqUes", "ismes", "ables", "istes")
  private val frGB = Set("atrice", "ateur", "ation", "atrices", "ateurs",
    "ations")
  private val frGC = Set("logie", "logies")
  private val frGD = Set("usion", "ution", "usions", "utions")
  private val frGE = Set("ence", "ences")
  private val frGF = Set("ement", "ements")
  private val frGG = Set("ité", "ités")
  private val frGH = Set("if", "ive", "ifs", "ives")
  private val frGK = Set("euse", "euses")
  private val frGL = Set("issement", "issements")
  private val frGMent = Set("ment", "ments")
  private val frStep1All =
    (frGA ++ frGB ++ frGC ++ frGD ++ frGE ++ frGF ++ frGG ++ frGH ++
      Set("eaux", "aux") ++ frGK ++ frGL ++ Set("amment", "emment") ++ frGMent)
      .toSeq.sortBy(s => (-s.length, s))

  private val frStep2a = Seq("îmes", "ît", "îtes", "i", "ie", "ies", "ir",
    "ira", "irai", "iraIent", "irais", "irait", "iras", "irent", "irez",
    "iriez", "irions", "irons", "iront", "is", "issaIent", "issais",
    "issait", "issant", "issante", "issantes", "issants", "isse", "issent",
    "isses", "issez", "issiez", "issions", "issons", "it")
    .sortBy(s => (-s.length, s))

  private val frStep2bIons = Set("ions")
  private val frStep2bEr = Set("é", "ée", "ées", "és", "èrent", "er", "era",
    "erai", "eraIent", "erais", "erait", "eras", "erez", "eriez", "erions",
    "erons", "eront", "ez", "iez")
  private val frStep2bA = Set("â", "ât", "âtes", "a", "ai", "aIent", "ais",
    "ait", "ant", "ante", "antes", "ants", "as", "asse", "assent", "asses",
    "assiez", "assions")
  private val frStep2bAll =
    (frStep2bIons ++ frStep2bEr ++ frStep2bA).toSeq.sortBy(s => (-s.length, s))

  def stemFrench(input: String): String = {
    if (input.isEmpty) return input
    // prelude: y next to a vowel -> Y; u after q -> U; u/i between vowels -> U/I
    var w = input
    locally {
      val sb = new StringBuilder(w)
      var i = 0
      while (i < sb.length) {
        val c = sb(i)
        val prevV = i > 0 && frVowels(sb(i - 1))
        val nextV = i < sb.length - 1 && frVowels(sb(i + 1))
        if (c == 'y' && (prevV || nextV)) sb(i) = 'Y'
        else if (c == 'u' && i > 0 && sb(i - 1) == 'q') sb(i) = 'U'
        else if ((c == 'u' || c == 'i') && prevV && nextV)
          sb(i) = (c - 32).toChar
        i += 1
      }
      w = sb.toString
    }
    @inline def isV(c: Char) = frVowels(c)
    val rv =
      if (w.length >= 3 && ((isV(w(0)) && isV(w(1))) ||
          Set("par", "col", "tap").contains(w.take(3)))) 3
      else {
        var i = 1
        while (i < w.length && !isV(w(i))) i += 1
        if (i < w.length) i + 1 else w.length
      }
    val r1 = regionStart(w, 0, isV)
    val r2 = regionStart(w, r1, isV)
    @inline def inRV(len: Int): Boolean = w.length - len >= rv
    @inline def inR1(len: Int): Boolean = w.length - len >= r1
    @inline def inR2(len: Int): Boolean = w.length - len >= r2

    // ---- step 1: standard suffix removal
    val before1 = w
    var foundMentFamily = false
    frStep1All.find(w.endsWith) match {
      case Some(s) if frGA(s) =>
        if (inR2(s.length)) w = w.dropRight(s.length)
      case Some(s) if frGB(s) =>
        if (inR2(s.length)) {
          w = w.dropRight(s.length)
          if (w.endsWith("ic")) {
            if (inR2(2)) w = w.dropRight(2)
            else w = w.dropRight(2) + "iqU"
          }
        }
      case Some(s) if frGC(s) =>
        if (inR2(s.length)) w = w.dropRight(s.length) + "log"
      case Some(s) if frGD(s) =>
        if (inR2(s.length)) w = w.dropRight(s.length) + "u"
      case Some(s) if frGE(s) =>
        if (inR2(s.length)) w = w.dropRight(s.length) + "ent"
      case Some(s) if frGF(s) =>
        if (inRV(s.length)) {
          w = w.dropRight(s.length)
          if (w.endsWith("iv") && inR2(2)) {
            w = w.dropRight(2)
            if (w.endsWith("at") && inR2(2)) w = w.dropRight(2)
          } else if (w.endsWith("eus")) {
            if (inR2(3)) w = w.dropRight(3)
            else if (inR1(3)) w = w.dropRight(3) + "eux"
          } else if ((w.endsWith("abl") || w.endsWith("iqU")) && inR2(3))
            w = w.dropRight(3)
          else if ((w.endsWith("ièr") || w.endsWith("Ièr")) && inRV(3))
            w = w.dropRight(3) + "i"
        }
      case Some(s) if frGG(s) =>
        if (inR2(s.length)) {
          w = w.dropRight(s.length)
          if (w.endsWith("abil")) {
            if (inR2(4)) w = w.dropRight(4) else w = w.dropRight(4) + "abl"
          } else if (w.endsWith("ic")) {
            if (inR2(2)) w = w.dropRight(2) else w = w.dropRight(2) + "iqU"
          } else if (w.endsWith("iv") && inR2(2)) w = w.dropRight(2)
        }
      case Some(s) if frGH(s) =>
        if (inR2(s.length)) {
          w = w.dropRight(s.length)
          if (w.endsWith("at") && inR2(2)) {
            w = w.dropRight(2)
            if (w.endsWith("ic")) {
              if (inR2(2)) w = w.dropRight(2) else w = w.dropRight(2) + "iqU"
            }
          }
        }
      case Some("eaux") => w = w.dropRight(1)
      case Some("aux")  => if (inR1(3)) w = w.dropRight(3) + "al"
      case Some(s) if frGK(s) =>
        if (inR2(s.length)) w = w.dropRight(s.length)
        else if (inR1(s.length)) w = w.dropRight(s.length) + "eux"
      case Some(s) if frGL(s) =>
        if (inR1(s.length) && w.length > s.length &&
            !isV(w(w.length - s.length - 1)))
          w = w.dropRight(s.length)
      case Some("amment") =>
        foundMentFamily = true
        if (inRV(6)) w = w.dropRight(6) + "ant"
      case Some("emment") =>
        foundMentFamily = true
        if (inRV(6)) w = w.dropRight(6) + "ent"
      case Some(s) if frGMent(s) =>
        foundMentFamily = true
        if (inRV(s.length) && w.length > s.length && {
          val p = w(w.length - s.length - 1)
          isV(p) && w.length - s.length - 1 >= rv
        }) w = w.dropRight(s.length)
      case _ => ()
    }

    var altered = w != before1
    // ---- step 2a: verb suffixes beginning i (if step 1 removed nothing,
    // or a ment-family ending was found)
    if (!altered || foundMentFamily) {
      val before2a = w
      frStep2a.find(s => w.endsWith(s) && inRV(s.length) &&
        w.length > s.length && !isV(w(w.length - s.length - 1)) &&
        w.length - s.length - 1 >= rv) match {
        case Some(s) => w = w.dropRight(s.length)
        case None    => ()
      }
      if (w != before2a) altered = true
      else {
        // ---- step 2b: other verb suffixes — among limited to RV, with
        // backtracking to the next-longest fitting suffix when a
        // condition (ions: R2) fails
        val before2b = w
        frStep2bAll.filter(s => w.endsWith(s) && inRV(s.length))
          .sortBy(-_.length).exists {
            case "ions" =>
              if (inR2(4)) { w = w.dropRight(4); true } else false
            case s if frStep2bEr(s) => w = w.dropRight(s.length); true
            case s => // the `a` group: delete, then a preceding e in RV
              w = w.dropRight(s.length)
              if (w.endsWith("e") && inRV(1)) w = w.dropRight(1)
              true
          }
        altered = w != before2b
      }
    }

    if (altered) {
      // ---- step 3: final Y -> i, final ç -> c
      if (w.endsWith("Y")) w = w.dropRight(1) + "i"
      else if (w.endsWith("ç")) w = w.dropRight(1) + "c"
    } else {
      // ---- step 4: residual suffix
      if (w.endsWith("s") && w.length >= 2 &&
          !"aiouès".contains(w(w.length - 2)))
        w = w.dropRight(1)
      Seq("Ière", "ière", "Ier", "ier", "ion", "e").find(w.endsWith) match {
        case Some("ion") =>
          if (inRV(3) && inR2(3) && w.length > 3 && {
            val p = w(w.length - 4)
            (p == 's' || p == 't') && w.length - 4 >= rv
          }) w = w.dropRight(3)
        case Some(s @ ("Ière" | "ière" | "Ier" | "ier")) =>
          if (inRV(s.length)) w = w.dropRight(s.length) + "i"
        case Some("e") =>
          if (inRV(1)) w = w.dropRight(1)
        case _ => ()
      }
    }

    // ---- step 5: undouble enn/onn/ett/ell/eill
    if (Seq("enn", "onn", "ett", "ell", "eill").exists(w.endsWith))
      w = w.dropRight(1)
    // ---- step 6: un-accent é/è followed only by non-vowels
    locally {
      var i = w.length - 1
      var n = 0
      while (i >= 0 && !isV(w(i))) { i -= 1; n += 1 }
      if (n >= 1 && i >= 0 && (w(i) == 'é' || w(i) == 'è'))
        w = w.substring(0, i) + "e" + w.substring(i + 1)
    }

    w.map { case 'I' => 'i'; case 'U' => 'u'; case 'Y' => 'y'; case c => c }
  }
}
