package graft.analysis

/** Snowball stemmers for Romanian, Turkish, and Greek (the reference's
  * `Stemmer` filter languages, `src/tokenizer/stemmer.rs:12-31`; Arabic and
  * Tamil live in StemmersArabic / StemmersTamil). Implemented from the published Snowball
  * specifications (snowballstem.org) and validated against golden vectors
  * harvested from the published implementations (tools/gen_stem_vectors.py,
  * GoldenStemSpec). Pure functions — used identically at index and query
  * time.
  */
object StemmersEastern {

  /** Standard region start: after the first non-vowel following a vowel. */
  private def regionStart(w: String, from: Int, isVowel: Char => Boolean): Int = {
    var i = from
    while (i < w.length && !isVowel(w(i))) i += 1
    while (i < w.length && isVowel(w(i))) i += 1
    if (i < w.length) i + 1 else w.length
  }

  /** Romance RV: second letter consonant → after the next vowel; first two
    * letters vowels → after the next consonant; else after the third letter.
    */
  private def romanceRV(w: String, isV: Char => Boolean): Int = {
    if (w.length < 3) return w.length
    if (!isV(w(1))) {
      var i = 2
      while (i < w.length && !isV(w(i))) i += 1
      if (i < w.length) i + 1 else w.length
    } else if (isV(w(0))) {
      var i = 2
      while (i < w.length && isV(w(i))) i += 1
      if (i < w.length) i + 1 else w.length
    } else 3
  }

  // =========================================================================
  // Romanian (Snowball "romanian") — tables use the legacy cedilla forms
  // ş (U+015F) / ţ (U+0163), matching the published implementation.
  // =========================================================================

  private val roV = "aăâeiîou".toSet

  def stemRomanian(input: String): String = {
    if (input.length < 2) return input
    // prelude: i/u between vowels are consonants (marked upper-case)
    var w = {
      val sb = new StringBuilder(input)
      var i = 1
      while (i < sb.length - 1) {
        val c = sb(i)
        if ((c == 'i' || c == 'u') && roV(sb(i - 1)) && roV(sb(i + 1)))
          sb(i) = (c - 32).toChar
        i += 1
      }
      sb.toString
    }
    @inline def isV(c: Char) = roV(c)
    val rv = romanceRV(w, isV)
    val r1 = regionStart(w, 0, isV)
    val r2 = regionStart(w, r1, isV)
    @inline def fits(r: Int, s: String): Boolean =
      w.endsWith(s) && w.length - s.length >= r

    // ---- step 0: removal of plurals (in R1) — longest fitting suffix
    locally {
      val entries = Seq("iilor", "ului", "elor", "iile", "ilor", "atei",
        "aţie", "aţia", "aua", "ele", "ile", "iua", "iei", "ea", "ii", "ul")
      entries.filter(s => fits(r1, s)).sortBy(-_.length).headOption.foreach {
        case s @ ("ul" | "ului") => w = w.dropRight(s.length)
        case "aua" => w = w.dropRight(3) + "a"
        case s @ ("ea" | "ele" | "elor") => w = w.dropRight(s.length) + "e"
        case s @ ("ii" | "iua" | "iei" | "iile" | "iilor" | "ilor") =>
          w = w.dropRight(s.length) + "i"
        case "ile" =>
          if (!w.dropRight(3).endsWith("ab")) w = w.dropRight(3) + "i"
        case "atei" => w = w.dropRight(4) + "at"
        case s @ ("aţie" | "aţia") => w = w.dropRight(s.length) + "aţi"
        case _ => ()
      }
    }

    // ---- step 1: reduction of combining suffixes (in R1, repeated);
    // sets the continuation flag consumed by step 3
    var removedStandard = false
    var changed = true
    while (changed) {
      changed = false
      val groups: Seq[(Seq[String], String)] = Seq(
        (Seq("abilitate", "abilitati", "abilităi", "abilităţi"), "abil"),
        (Seq("ibilitate"), "ibil"),
        (Seq("ivitate", "ivitati", "ivităi", "ivităţi"), "iv"),
        (Seq("icitate", "icitati", "icităi", "icităţi", "icator",
          "icatori"), "ic"),
        (Seq("ativ", "ativa", "ative", "ativi", "ativă", "aţiune",
          "atoare", "ator", "atori", "ătoare", "ător", "ători"), "at"),
        (Seq("itiv", "itiva", "itive", "itivi", "itivă", "iţiune",
          "itoare", "itor", "itori"), "it"))
      val all = groups.flatMap { case (ss, rep) => ss.map(_ -> rep) }
      all.filter { case (s, _) => fits(r1, s) }
        .sortBy { case (s, _) => -s.length }.headOption.foreach {
          case (s, rep) =>
            w = w.dropRight(s.length) + rep
            changed = true; removedStandard = true
        }
    }

    // ---- step 2: standard suffixes — the longest matching suffix wins
    // outright and the R2 test is inside (a long match crossing R2 BLOCKS
    // shorter ones: carteitate keeps its `ate`)
    locally {
      val del = Seq("at", "ata", "ată", "ati", "ate", "abil", "abila",
        "abile", "abili", "abilă", "ibil", "ibila", "ibile", "ibili",
        "ibilă", "oasa", "oasă", "oase", "os", "osi", "oşi", "ut", "uta",
        "ută", "ute", "uti", "it", "ita", "ită", "ite", "iti",
        "iv", "iva", "ive", "ivi", "ivă",
        "ic", "ica", "ice", "ici", "ică", "itate", "itati", "ităi",
        "ităţi", "ant", "anta", "ante", "anti", "antă")
      val ist = Seq("ism", "isme", "ist", "ista", "iste", "isti", "istă",
        "işti")
      val iune = Seq("iune", "iuni")
      (del ++ ist ++ iune).filter(w.endsWith)
        .sortBy(-_.length).headOption.foreach {
          case s if iune.contains(s) =>
            if (fits(r2, s) && w.length > s.length &&
                w(w.length - s.length - 1) == 'ţ') {
              w = w.dropRight(s.length + 1) + "t"; removedStandard = true
            }
          case s if ist.contains(s) =>
            if (fits(r2, s)) {
              w = w.dropRight(s.length) + "ist"; removedStandard = true
            }
          case s =>
            if (fits(r2, s)) {
              w = w.dropRight(s.length); removedStandard = true
            }
        }
    }

    // ---- step 3: verb suffixes (in RV; only if steps 1-2 removed nothing).
    // ONE among (the published 94-entry table): group A entries additionally
    // need the preceding char to be a consonant or u, itself within RV; the
    // LONGEST match decides and a failed condition blocks — no backtracking
    // to a shorter entry (zdiirăm stays whole: irăm matches, i precedes).
    if (!removedStandard) {
      val groupA = Seq("ea", "ia", "esc", "ăsc", "ind", "ând", "are",
        "ere", "ire", "âre", "ase", "ise", "use", "âse", "eşte", "ăşte",
        "eze", "ai", "eai", "iai", "eşti", "ăşti", "ui", "ezi", "aşi",
        "aseşi", "iseşi", "useşi", "âseşi", "işi", "uşi", "âşi", "âi",
        "eaţi", "iaţi", "arăţi", "aserăţi", "iserăţi", "userăţi",
        "âserăţi", "irăţi", "urăţi", "ârăţi", "am", "eam", "iam", "asem",
        "isem", "usem", "âsem", "arăm", "aserăm", "iserăm", "userăm",
        "âserăm", "irăm", "urăm", "ârăm", "au", "eau", "iau", "indu",
        "ându", "ez", "ează", "ească", "ară", "aseră", "iseră", "useră",
        "âseră", "iră", "ură", "âră")
      val groupB = Seq("se", "sese", "sei", "seşi", "seseşi", "aţi",
        "eţi", "iţi", "âţi", "serăţi", "seserăţi", "em", "sesem", "im",
        "ăm", "âm", "serăm", "seserăm", "seră", "seseră")
      (groupA ++ groupB).filter(w.endsWith)
        .sortBy(-_.length).headOption.foreach { s =>
          if (fits(rv, s)) {
            if (groupB.contains(s)) w = w.dropRight(s.length)
            else {
              val p = w.length - s.length - 1 // preceding char, in RV
              if (p >= rv && (!isV(w(p)) || w(p) == 'u'))
                w = w.dropRight(s.length)
            }
          }
        }
    }

    // ---- step 4: vowel removal (in RV) — longest MATCH first, RV test
    // after (mdie keeps its e: ie matches outside RV and blocks)
    Seq("ie", "a", "e", "i", "ă").filter(w.endsWith)
      .sortBy(-_.length).headOption.foreach { s =>
        if (fits(rv, s)) w = w.dropRight(s.length)
      }

    w.map { case 'I' => 'i'; case 'U' => 'u'; case c => c }
  }

  // =========================================================================
  // Greek (Snowball "greek", the Ntais/Saroukos algorithm) — accent
  // stripping, exception-gated verb/noun suffix rules, a final
  // common-ending removal, and comparative/superlative truncation.
  // Validated against golden vectors from the published implementation.
  // =========================================================================

  private val elV = "αεηιουω".toSet // vowels (post accent-stripping)
  private val elV2 = "αεηιοω".toSet // vowels except υ

  private def elDeaccent(c: Char): Char = c match {
    case 'ά' => 'α'; case 'έ' => 'ε'; case 'ή' => 'η'
    case 'ί' | 'ϊ' | 'ΐ' => 'ι'; case 'ό' => 'ο'
    case 'ύ' | 'ϋ' | 'ΰ' => 'υ'; case 'ώ' => 'ω'; case 'ς' => 'σ'
    case other => other
  }

  def stemGreek(input: String): String = {
    var w = input.map(elDeaccent)
    // min length only — the published algorithm runs its suffix rules on
    // mixed-alphabet tokens too (non-Greek chars are ordinary consonants)
    if (w.length < 3) return w
    var test1 = true
    def ends(s: String): Boolean = w.endsWith(s)
    def drop(s: String): Unit = w = w.dropRight(s.length)
    /** Longest matching suffix from `sufs`, else null. */
    def longest(sufs: Seq[String]): String =
      sufs.filter(ends).sortBy(-_.length).headOption.orNull

    // step 1: irregular nouns (exception dictionary)
    locally {
      val exc = Map(
        "φαγια" -> "φα", "φαγιου" -> "φα", "φαγιων" -> "φα",
        "σκαγια" -> "σκα", "σκαγιου" -> "σκα", "σκαγιων" -> "σκα",
        "σογιου" -> "σο", "σογια" -> "σο", "σογιων" -> "σο",
        "ολογιου" -> "ολο", "ολογια" -> "ολο", "ολογιων" -> "ολο",
        "τατογια" -> "τατο", "τατογιου" -> "τατο", "τατογιων" -> "τατο",
        "κρεασ" -> "κρε", "κρεατοσ" -> "κρε", "κρεατα" -> "κρε",
        "κρεατων" -> "κρε", "περασ" -> "περ", "περατοσ" -> "περ",
        "περατα" -> "περ", "περατων" -> "περ", "τερασ" -> "τερ",
        "τερατοσ" -> "τερ", "τερατα" -> "τερ", "τερατων" -> "τερ",
        "φωσ" -> "φω", "φωτοσ" -> "φω", "φωτα" -> "φω", "φωτων" -> "φω",
        "καθεστωσ" -> "καθεστ", "καθεστωτοσ" -> "καθεστ",
        "καθεστωτα" -> "καθεστ", "καθεστωτων" -> "καθεστ",
        "γεγονοσ" -> "γεγον", "γεγονοτοσ" -> "γεγον",
        "γεγονοτα" -> "γεγον", "γεγονοτων" -> "γεγον")
      exc.get(w).foreach { s => w = s; return w }
    }

    // steps A: -ιζ- verb family
    locally {
      val s = longest(Seq("ιζα", "ιζεσ", "ιζε", "ιζαμε", "ιζατε", "ιζαν",
        "ιζανε", "ιζω", "ιζεισ", "ιζει", "ιζουμε", "ιζετε", "ιζουν",
        "ιζουνε"))
      if (s != null) {
        drop(s); test1 = false
        val app1 = Seq("αναμπα", "εμπα", "επα", "ξαναπα", "πα", "περιπα",
          "αθρο", "συναθρο", "δανε")
        val app2 = Seq("μαρκ", "κορν", "αμπαρ", "αρρ", "βαθυρι", "βαρκ",
          "β", "βολβορ", "γκρ", "γλυκορ", "γλυκυρ", "ιμπ", "λ", "λου",
          "μαρ", "μ", "πρ", "μπρ", "πολυρ", "π", "ρ", "πιπερορ")
        if (app1.contains(w)) w += "ι"
        else if (app2.contains(w)) w += "ιζ"
      }
    }
    // steps B: -ισ- verb family
    locally {
      val s = longest(Seq("ισα", "ισεσ", "ισε", "ισαμε", "ισατε", "ισαν",
        "ισανε", "ισω", "ισεισ", "ισει", "ισουμε", "ισετε", "ισουν",
        "ισουνε"))
      if (s != null) {
        drop(s); test1 = false
        val app1 = Seq("αναμπα", "αθρο", "εμπα", "εσε", "εσωκλε", "επα",
          "ξαναπα", "επε", "περιπα", "συναθρο", "δανε", "κλε", "χαρτοπα",
          "εξαρχα", "μεταπα", "απεκλε", "αποκλε", "ουλαμ", "ουρ", "π",
          "τρ", "μ")
        val app2 = Seq("οφ", "πελ", "χορτ", "λλ", "σφ", "ρπ", "φρ", "πρ",
          "λοχ", "σμην")
        if (w == "ισα") { w = "ισ"; }
        else if (app1.contains(w)) w += "ι"
        else if (app2.exists(ends) &&
          !Seq("ψοφ", "ναυλοχ").contains(w)) w += "ισ"
      }
    }
    // steps C: -ιστ- adjective/agent family
    locally {
      val s = longest(Seq("ιστοσ", "ιστου", "ιστο", "ιστη", "ιστησ",
        "ιστα", "ιστεσ", "ιστοι", "ιστων", "ιστουσ", "ιστε"))
      if (s != null) {
        drop(s); test1 = false
        val app1 = Seq("δανε", "συναθρο", "κλε", "σε", "εσωκλε",
          "ασε", "πλε")
        val app2 = Seq("μ", "π", "απ", "αρ", "ηδ", "κτ", "σκ", "σχ",
          "υψ", "φα", "χρ", "χτ", "ακτ", "αορ", "ασχ", "ατα", "αχν",
          "αχτ", "γεμ", "γυρ", "εμπ", "ευπ", "εχθ", "ηφα", "καθ", "κακ",
          "κυλ", "λυγ", "μακ", "μεγ", "ταχ", "φιλ", "χωρ")
        if (app1.contains(w)) w += "ι"
        else if (app2.contains(w)) w += "ιστ"
      }
    }
    // steps D: -ισμ- family
    locally {
      val s = longest(Seq("ισμοσ", "ισμου", "ισμο", "ισμα", "ισμων",
        "ισμοι", "ισμουσ", "ισμο", "ισμασ", "ισμε", "ισματα",
        "ισματων", "ισματοσ"))
      if (s != null) {
        drop(s); test1 = false
        val unIk = Seq("αγνωστικ", "ατομικ", "γνωστικ", "εθνικ",
          "εκλεκτικ", "σκεπτικ", "τοπικ")
        if (unIk.contains(w)) w = w.dropRight(2)
        else w match {
          case "σε" | "μεταλλ" => w += "ισμ"
          case _ => ()
        }
      }
    }
    // steps E: diminutives -αρακι/-ακι/-ιτσα family
    locally {
      val s = longest(Seq("αρακι", "αρακια", "ουδακι", "ουδακια",
        "ακι", "ακια", "ιτσα", "ιτσασ", "ιτσεσ", "ιτσων", "αρακ",
        "ιτσ"))
      if (s != null) {
        drop(s); test1 = false
        val app1 = Seq("ανθρακ") // rare appends discovered by oracle
        val appAk = Seq("β", "βαμβ", "βρ", "καιμ", "κον", "κορ", "λαβρ",
          "λουλ", "μερ", "μουστ", "ναγκασ", "πλ", "ρ", "ρυ", "σ", "σκ",
          "σοκ", "σπαν", "τζ", "φαρμ", "χ", "καπακ", "αλισφ", "αμβρ",
          "ανθρ", "κ", "φυλ", "κατραπ", "κλιμ", "μαλ", "σλοβ", "φ",
          "σφ", "τσεχοσλοβ")
        val appItsa = Seq("κορ")
        if (s.startsWith("ιτσ") && appItsa.contains(w)) w += "ιτσ"
        else if (!s.startsWith("ιτσ") && appAk.contains(w)) w += "ακ"
        else if (app1.contains(w)) w += "ακ"
      }
    }
    // step 2a: -αδεσ/-αδων — the αδ stays unless the stem is a listed
    // kinship/measure word (μαμάδες → μαμ, ψαράδες → ψαραδ)
    locally {
      val s = longest(Seq("αδεσ", "αδων"))
      if (s != null) {
        drop(s)
        val dropAd = Seq("οκ", "μαμ", "μαν", "μπαμπ", "πατερ", "γιαγι",
          "νταντ", "κυρ", "θει", "πεθερ")
        if (!dropAd.contains(w)) w += "αδ"
      }
    }
    // step 2b: -εδεσ/-εδων
    locally {
      val s = longest(Seq("εδεσ", "εδων"))
      if (s != null) {
        drop(s)
        val keep = Seq("οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ", "κρασπ",
          "μιλ")
        if (keep.exists(ends)) w += "εδ"
      }
    }
    // step 2c: -ουδεσ/-ουδων
    locally {
      val s = longest(Seq("ουδεσ", "ουδων"))
      if (s != null) {
        drop(s)
        val keep = Seq("αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ",
          "σ", "φλ", "φρ", "βελ", "λουλ", "χν", "σπ", "τραγ", "φε")
        if (keep.exists(ends)) w += "ουδ"
      }
    }
    // step 2d: -εωσ/-εων
    locally {
      val s = longest(Seq("εωσ", "εων"))
      if (s != null) {
        drop(s); test1 = false
        val keep = Seq("θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ")
        if (keep.contains(w)) w += "ε"
      }
    }
    // step 2e: -ιδια/-ιδιων (not -ιδιου); παιχνίδια keeps its ιδ
    locally {
      val s = longest(Seq("ιδια", "ιδιων"))
      if (s != null) {
        drop(s); test1 = false
        if (ends("παιχν")) w += "ιδ"
      }
    }
    // step 3: -ια/-ιου/-ιων after vowel
    locally {
      val s = longest(Seq("ια", "ιου", "ιων"))
      if (s != null) {
        drop(s); test1 = false
        if (w.nonEmpty && elV(w.last)) w += "ι"
      }
    }
    // step 4: -ικα/-ικο/-ικου/-ικων
    locally {
      val s = longest(Seq("ικα", "ικο", "ικου", "ικων"))
      if (s != null) {
        drop(s); test1 = false
        val keep = Seq("αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ",
          "ανηθ", "αντιδ", "φυσ", "βρωμ", "γερ", "εξωδ", "καλπ",
          "καλλιν", "καταδ", "μουλ", "μπαν", "μπαγιατ", "μπολ", "μποσ",
          "νιτ", "ξικ", "συνομηλ", "πετσ", "πιτσ", "πικαντ", "πλιατσ",
          "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ", "υποδ", "φιλον",
          "φυλοδ", "χασ")
        if ((w.nonEmpty && elV(w.last)) || keep.contains(w)) w += "ικ"
      }
    }
    // step 5a: -αγαμε/-ησαμε/-ουσαμε/-ηκαμε/-αμε
    if (w == "αγαμε") w = "αγαμ"
    locally {
      val s = longest(Seq("αγαμε", "ησαμε", "ουσαμε", "ηκαμε", "ηθηκαμε"))
      if (s != null) { drop(s); test1 = false }
      else if (ends("αμε")) {
        drop("αμε"); test1 = false
        val keep = Seq("αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ",
          "ουλ", "πεθ", "πικρ", "ποτ", "σιχ", "χ")
        if (keep.contains(w)) w += "αμ"
      }
    }
    // step 5b: -αγανε/-ησανε/-ουσανε/-ιοντανε/... and -ανε
    locally {
      val s = longest(Seq("αγανε", "ησανε", "ουσανε", "ιοντανε",
        "ιοτανε", "ιουντανε", "οντανε", "οτανε", "ουντανε", "ηκανε",
        "ηθηκανε"))
      if (s != null) {
        drop(s); test1 = false
        if (Seq("τρ", "τσ").contains(w)) w += "αγαν"
      } else if (ends("ανε")) {
        drop("ανε"); test1 = false
        val keep = Seq("βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ",
          "καλπουζ", "καστελ", "κορμορ", "λαοπλ", "μωαμεθ", "μ",
          "μουσουλμ", "ν", "ουλ", "π", "πελεκ", "πλ", "πολισ", "πορτολ",
          "σαρακατσ", "σουλτ", "τσαρλατ", "ορφ", "τσιγγ", "τσοπ",
          "φωτοστεφ", "χ", "ψυχοπλ", "αγ", "ορφ", "γαλ", "γερ", "δεκ",
          "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ", "ζωντ", "ικ",
          "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ", "σιγ", "σπ",
          "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ",
          "ανικ", "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ",
          "βαθυγαλ", "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ",
          "θυσ", "καπνοβιομηχ", "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ",
          "μεγλοβιομηχ", "μικροβιομηχ", "νταβ", "ξηροκλιβ", "ολιγοδαμ",
          "ολογαλ", "πενταρφ", "περηφ", "περιτρ", "πλατ", "πολυδαπ",
          "πολυμηχ", "στεφ", "ταβ", "τετ", "υπερηφ", "υποκοπ",
          "χαμηλοδαπ", "ψηλοταβ")
        if ((w.nonEmpty && elV2(w.last)) || keep.contains(w)) w += "αν"
      }
    }
    // step 5c: -ησετε / -ετε
    locally {
      if (ends("ησετε")) { drop("ησετε"); test1 = false }
      else if (ends("ετε")) {
        drop("ετε"); test1 = false
        val keepEnds = Seq("οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ",
          "ενδ", "ευρ", "τιθ", "υπερθ", "ραθ", "ενθ", "ροθ", "σθ",
          "πυρ", "αιν", "συνδ", "συν", "συνθ", "χωρ", "πον", "βρ",
          "καθ", "ευθ", "εκθ", "νετ", "ρον", "αρκ", "βαρ", "βολ", "ωφελ")
        val keep = Seq("αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν",
          "απλ", "βαρον", "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ",
          "πολ", "σερτ", "συνερ", "τσογλ", "χολ", "αρχοσ", "ολοπ",
          "σωσ", "αδαπ", "αθιγγ", "αμηχ", "ανικ", "ανοργ", "απηγ",
          "απιθ", "ατσιγγ", "βασ", "βασκ", "βαθυγαλ", "βιομηχ",
          "βραχυκ", "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ",
          "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ", "μεγλοβιομηχ",
          "μικροβιομηχ", "νταβ", "ξηροκλιβ", "ολιγοδαμ", "ολογαλ",
          "πενταρφ", "περηφ", "περιτρ", "πλατ", "πολυδαπ", "πολυμηχ",
          "στεφ", "ταβ", "τετ", "υπερηφ", "υποκοπ", "χαμηλοδαπ",
          "ψηλοταβ")
        if ((w.nonEmpty && elV2(w.last)) || keep.contains(w) ||
            keepEnds.exists(ends)) w += "ετ"
      }
    }
    // step 5d: -οντασ/-ωντασ
    locally {
      val s = longest(Seq("οντασ", "ωντασ"))
      if (s != null) {
        drop(s); test1 = false
        if (w == "αρχ") w += "οντ"
        if (ends("κρε")) w += "ωντ"
      }
    }
    // step 5e: -ομαστε/-ιομαστε
    locally {
      val s = longest(Seq("ιομαστε", "ομαστε"))
      if (s != null) {
        drop(s); test1 = false
        if (w == "ον") w += "ομαστ"
      }
    }
    // step 5f: -ιεστε / -εστε
    locally {
      if (ends("ιεστε")) {
        drop("ιεστε"); test1 = false
        if (Seq("π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ")
            .contains(w)) w += "ιεστ"
      } else if (ends("εστε")) {
        drop("εστε"); test1 = false
        val keep = Seq("αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ",
          "προ", "νισ")
        if (keep.contains(w)) w += "εστ"
      }
    }
    // step 5g: -ηθηκα/-ηθηκεσ/-ηθηκε and -ηκα/-ηκεσ/-ηκε
    locally {
      val s = longest(Seq("ηθηκα", "ηθηκεσ", "ηθηκε"))
      if (s != null) { drop(s); test1 = false }
      else {
        val s2 = longest(Seq("ηκα", "ηκεσ", "ηκε"))
        if (s2 != null) {
          drop(s2); test1 = false
          val keepEnds = Seq("σκωλ", "σκουλ", "ναρθ", "σφ", "οθ", "πιθ")
          val keep = Seq("διαθ", "θ", "παρακαταθ", "προσθ", "συνθ")
          if (keepEnds.exists(ends) || keep.contains(w)) w += "ηκ"
        }
      }
    }
    // step 5h: -ουσα/-ουσεσ/-ουσε
    locally {
      val s = longest(Seq("ουσα", "ουσεσ", "ουσε"))
      if (s != null) {
        drop(s); test1 = false
        val keepEnds = Seq("ποδαρ", "βλεπ", "πανταχ", "φρυδ", "μαντιλ",
          "μαλλ", "κυματ", "λαχ", "ληγ", "φαγ", "ομ", "πρωτ")
        val keep = Seq("φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ",
          "λαμπιδ", "λεχ", "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ",
          "υποτειν", "αμ", "αιθ", "ανηκ", "δεσποζ", "ενδιαφερ", "δε",
          "δευτερευ", "καθαρευ", "πλε", "τσα")
        if (keepEnds.exists(ends) || keep.contains(w)) w += "ουσ"
      }
    }
    // step 5i: -αγα/-αγεσ/-αγε
    locally {
      val s = longest(Seq("αγα", "αγεσ", "αγε"))
      if (s != null) {
        drop(s); test1 = false
        val keepEnds = Seq("τρ", "φε", "γλυκορ", "μουλ", "ομορφ", "τσεχ")
        val keep = Seq("φ", "χ", "ψαρ", "ξεφ", "αβαστ", "πολυφ", "αδηφ",
          "παμφ", "ρ", "ασπ", "αφ", "αμαλ", "αμαλλι", "ανυστ", "απερ",
          "ασπαρ", "αχαρ", "δερβεν", "δροσοπ", "ξεφ", "νεοπ", "νομοτ",
          "ολοπ", "ομοτ", "προστ", "προσωποπ", "συμπ", "συντ", "τ",
          "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ", "αποτ", "αρτιπ",
          "διατ", "εν", "επιτ", "κροκαλοπ", "σιδηροπ", "λ", "ναυ",
          "ουλαμ", "ουρ", "π", "τρ", "μ")
        val butNot = Seq("ψοφ", "ναυλοχ")
        if ((keepEnds.exists(ends) || keep.contains(w)) &&
            !(butNot.contains(w) || ends("κολλ"))) w += "αγ"
      }
    }
    // step 5j: -ησε/-ησου/-ησα
    locally {
      val s = longest(Seq("ησε", "ησου", "ησα"))
      if (s != null) {
        drop(s); test1 = false
        if (Seq("ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον",
          "επταν").contains(w)) w += "ησ"
      }
    }
    // step 5k: -ηστε
    locally {
      if (ends("ηστε")) {
        drop("ηστε"); test1 = false
        if (Seq("ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ",
          "ευχρ", "κοινοχρ", "παλιμψ").contains(w)) w += "ηστ"
      }
    }
    // step 5l: -ουνε/-ησουνε/-ηθουνε
    locally {
      val s = longest(Seq("ησουνε", "ηθουνε", "ουνε"))
      if (s != null) {
        drop(s); test1 = false
        if (Seq("ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων")
            .contains(w)) w += "ουν"
      }
    }
    // step 5m: -ουμε/-ησουμε/-ηθουμε
    locally {
      val s = longest(Seq("ησουμε", "ηθουμε", "ουμε"))
      if (s != null) {
        drop(s); test1 = false
        if (Seq("παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ",
          "ασουσ").contains(w)) w += "ουμ"
      }
    }
    // step 6: -ματα/-ματων/-ματοσ → μα, then the common-ending removal
    locally {
      val s = longest(Seq("ματα", "ματων", "ματοσ"))
      if (s != null) { drop(s); w += "μα" }
    }
    if (test1) {
      val endings = Seq("α", "αγατε", "αγαν", "αει", "αμαι", "αν", "ασ",
        "ασαι", "αται", "αω", "ε", "ει", "εισ", "ειτε", "εσαι", "εσ",
        "εται", "ι", "ιεμαι", "ιεμαστε", "ιεται", "ιεσαι", "ιεσαστε",
        "ιομασταν", "ιομουν", "ιομουνα", "ιονταν", "ιοντουσαν",
        "ιοσασταν", "ιοσαστε", "ιοσουν", "ιοσουνα", "ιοταν", "ιουμα",
        "ιουμαστε", "ιουνται", "ιουνταν", "η", "ηδεσ", "ηδων", "ηθει",
        "ηθεισ", "ηθειτε", "ηθηκατε", "ηθηκαν", "ηθουν", "ηθω",
        "ηκατε", "ηκαν", "ησ", "ησαν", "ησατε", "ησει", "ησεσ",
        "ησουν", "ησω", "ο", "οι", "ομαι", "ομασταν", "ομουν",
        "ομουνα", "ονται", "ονταν", "οντουσαν", "οσ", "οσασταν",
        "οσαστε", "οσουν", "οσουνα", "οταν", "ου", "ουμαι", "ουμαστε",
        "ουν", "ουνται", "ουνταν", "ουσ", "ουσαν", "ουσατε", "υ",
        "υσ", "ω", "ων")
      val s = longest(endings)
      if (s != null) drop(s)
    }
    // step 7: comparatives/superlatives
    locally {
      val s = longest(Seq("εστερ", "εστατ", "οτερ", "οτατ", "υτερ",
        "υτατ", "ωτερ", "ωτατ"))
      if (s != null) drop(s)
    }
    // a rule chain that consumed the whole word yields the PRISTINE input
    // back — accents included (probed: άει → άει, not αει)
    if (w.isEmpty) input else w
  }

  // =========================================================================
  // Turkish (Snowball "turkish") — nominal suffix stripping with vowel
  // harmony; buffer guards, continuation order, and the postlude gating
  // recovered from the shipped binary and probe-validated. Suffix marks compose via a cursor (person + tense compounds);
  // harmony is checked at the current cursor: the last vowel must have SOME
  // earlier vowel of its harmony class (4-way for high vowels ı/i/u/ü,
  // 2-way backness for a/e). Buffer consonants y/n/s are two-sided: present
  // → a vowel must precede them; absent → a non-vowel must precede the
  // suffix. All behaviors validated against the published implementation.
  // =========================================================================

  private val trV = "aeıioöuü".toSet

  private def trHarmonyAt(w: String, end: Int): Boolean = {
    var lv = end - 1
    while (lv >= 0 && !trV(w(lv))) lv -= 1
    if (lv < 0) return false
    val allowed: Char => Boolean = w(lv) match {
      case 'a' => c => c == 'a' || c == 'ı' || c == 'o' || c == 'u'
      case 'e' => c => c == 'e' || c == 'i' || c == 'ö' || c == 'ü'
      case 'ı' => c => c == 'a' || c == 'ı'
      case 'i' => c => c == 'e' || c == 'i'
      case 'u' => c => c == 'o' || c == 'u'
      case 'ü' => c => c == 'ö' || c == 'ü'
      case 'o' => c => c == 'a' || c == 'ı' || c == 'o' || c == 'u'
      case _   => c => c == 'e' || c == 'i' || c == 'ö' || c == 'ü' // ö
    }
    var j = lv - 1
    while (j >= 0) { if (allowed(w(j))) return true; j -= 1 }
    false
  }

  /** A mark consumes a suffix backwards from cursor `end` (exclusive),
    * returning the new cursor, or None.
    */
  private type TrMark = (String, Int) => Option[Int]

  /** Literal-core mark: longest core matching before `end`, optionally
    * wrapped by a buffer consonant, with optional harmony. Buffer present
    * → a vowel must precede it; buffer absent (only if not required) → the
    * suffix must sit after consonant-after-vowel (two-deep rule, verified:
    * kapısı strips its ı, kitapsı stays whole).
    */
  private def trMk(cores: Seq[String], harmony: Boolean = true,
      optC: Option[Char] = None, reqC: Boolean = false): TrMark =
    (w, end) => {
      if (harmony && !trHarmonyAt(w, end)) None
      else cores.filter(c => end >= c.length &&
          w.regionMatches(end - c.length, c, 0, c.length))
        .sortBy(-_.length).headOption.flatMap { core =>
          val ne = end - core.length
          optC match {
            case Some(b) =>
              // decompiled rule (mark_suffix_with_optional_*_consonant):
              // buffer present -> a vowel two back, consume the buffer;
              // absent -> STILL a vowel two back (the char directly before
              // the suffix is unconstrained), consume nothing
              if (ne - 1 >= 0 && w(ne - 1) == b) {
                if (ne - 2 >= 0 && trV(w(ne - 2))) Some(ne - 1) else None
              } else if (!reqC && ne - 2 >= 0 && trV(w(ne - 2))) Some(ne)
              else None
            case None => Some(ne)
          }
        }
    }

  /** Possessive-style mark: core + optional preceding high vowel. With the
    * vowel → a non-vowel must precede it; without → a vowel must precede
    * the core AND not start the word. No harmony (verified: evsun → evs).
    */
  private def trMkU(cores: Seq[String]): TrMark = (w, end) =>
    cores.filter(c => end >= c.length &&
        w.regionMatches(end - c.length, c, 0, c.length))
      .sortBy(-_.length).headOption.flatMap { core =>
        val ne = end - core.length
        // decompiled rule (mark_suffix_with_optional_U_vowel): U present
        // -> a non-vowel two back, consume the U; absent -> STILL a
        // non-vowel two back (the char directly before is unconstrained)
        if (ne - 1 >= 0 && "ıiuü".contains(w(ne - 1))) {
          if (ne - 2 >= 0 && !trV(w(ne - 2))) Some(ne - 1) else None
        } else if (ne - 2 >= 0 && !trV(w(ne - 2))) Some(ne)
        else None
      }

  // tense / predicate marks
  private val mkYmUs = trMk(Seq("mış", "miş", "muş", "müş"), optC = Some('y'))
  private val mkYDU = trMk(Seq("dı", "di", "du", "dü", "tı", "ti", "tu",
    "tü"), optC = Some('y'))
  private val mkYsA = trMk(Seq("sa", "se"), harmony = false, optC = Some('y'))
  private val mkYken = trMk(Seq("ken"), harmony = false, optC = Some('y'))
  private val mkCAsInA = trMk(Seq("casına", "cesine"))
  private val mkSUnUz = trMk(Seq("sınız", "siniz", "sunuz", "sünüz"),
    harmony = false)
  private val mkLAr = trMk(Seq("lar", "ler"))
  private val mkNUz = trMk(Seq("nız", "niz", "nuz", "nüz"))
  private val mkDUr = trMk(Seq("dır", "dir", "dur", "dür", "tır", "tir",
    "tur", "tür"))
  private val mkYUz = trMk(Seq("ız", "iz", "uz", "üz"), optC = Some('y'))
  private val mkSUn = trMk(Seq("sın", "sin", "sun", "sün"))
  private val mkYUm = trMk(Seq("ım", "im", "um", "üm"), optC = Some('y'))
  // bare past/conditional person marks (compose with yDU/ysA)
  private val mkPerson: TrMark = (w, end) =>
    if (end >= 1 && (w(end - 1) == 'm' || w(end - 1) == 'n' ||
        w(end - 1) == 'k')) Some(end - 1) else None
  // noun case marks
  private val mkLArI = trMk(Seq("ları", "leri"))
  private val mkKi = trMk(Seq("ki"), harmony = false)
  private val mkNcA = trMk(Seq("ca", "ce"), optC = Some('n'))
  private val mkNDA = trMk(Seq("da", "de"), optC = Some('n'), reqC = true)
  private val mkNA = trMk(Seq("a", "e"), optC = Some('n'), reqC = true)
  private val mkNDAn = trMk(Seq("dan", "den"), optC = Some('n'), reqC = true)
  private val mkNU = trMk(Seq("ı", "i", "u", "ü"), optC = Some('n'),
    reqC = true)
  private val mkDAn = trMk(Seq("dan", "den", "tan", "ten"))
  private val mkYlA = trMk(Seq("la", "le"), optC = Some('y'))
  private val mkNUn = trMk(Seq("ın", "in", "un", "ün"), optC = Some('n'))
  private val mkYU = trMk(Seq("ı", "i", "u", "ü"), optC = Some('y'))
  // continuation-position possessive U: its bare branch is one-deep
  // (sundan → s, aslında → asl), unlike the entry marks' two-deep rule
  private val mkSU: TrMark = (w, end) =>
    if (!trHarmonyAt(w, end)) None
    else if (end >= 1 && "ıiuü".contains(w(end - 1))) {
      val ne = end - 1
      if (ne - 1 >= 0 && w(ne - 1) == 's') {
        if (ne - 2 >= 0 && trV(w(ne - 2))) Some(ne - 1) else None
      } else if (ne - 1 >= 0 && !trV(w(ne - 1))) Some(ne)
      else None
    } else None
  private val mkDA = trMk(Seq("da", "de", "ta", "te"))
  private val mkYA = trMk(Seq("a", "e"), optC = Some('y'))
  private val mkPoss = trMkU(Seq("mız", "miz", "muz", "müz", "nız", "niz",
    "nuz", "nüz", "m", "n"))

  private def seq(ms: TrMark*)(w: String, end: Int): Option[Int] =
    ms.foldLeft(Option(end)) { (e, m) => e.flatMap(m(w, _)) }
  private def alt(ms: TrMark*)(w: String, end: Int): Option[Int] =
    ms.view.flatMap(m => m(w, end)).headOption

  def stemTurkish(input: String): String = {
    if (input.count(trV) < 2) return input // more than one syllable
    var w = input

    // ---- phase 1: nominal verb suffixes (one branch, tried in order)
    var continueNoun = true
    locally {
      val n = w.length
      val stripped: Option[Int] =
        alt(mkYmUs, mkYDU, mkYsA, mkYken)(w, n)
          .orElse(seq(mkCAsInA,
            (s, e) => alt(mkSUnUz, mkLAr, mkYUm, mkSUn, mkYUz)(s, e)
              .orElse(Some(e)),
            mkYmUs)(w, n))
          .orElse(mkLAr(w, n).map { e1 =>
            continueNoun = false
            val s1 = w.substring(0, e1)
            alt(mkDUr, mkYDU, mkYsA, mkYmUs)(s1, e1).getOrElse(e1)
          })
          .orElse(seq(mkPerson, (s, e) => alt(mkYDU, mkYsA)(s, e))(w, n))
          .orElse(seq(mkNUz, (s, e) => alt(mkYDU, mkYsA)(s, e))(w, n))
          .orElse(alt(mkSUnUz, mkYUz, mkSUn, mkYUm)(w, n).map { e1 =>
            val s1 = w.substring(0, e1)
            mkYmUs(s1, e1).getOrElse(e1)
          })
          .orElse(mkDUr(w, n).map { e1 =>
            val s1 = w.substring(0, e1)
            seq((s, e) => alt(mkSUnUz, mkLAr, mkYUm, mkSUn, mkYUz)(s, e)
              .orElse(Some(e)), mkYmUs)(s1, e1).getOrElse(e1)
          })
      stripped.foreach(e => w = w.substring(0, e))
    }

    // ---- phase 2: noun suffixes (one entry branch + its continuation)
    if (continueNoun) {
      def cut(e: Int): Unit = { w = w.substring(0, e) }
      // continuation helpers, each operating on the CURRENT w
      def contLArChain(): Unit =
        mkLAr(w, w.length).foreach { e => cut(e); contKi() }
      def contPossLAr(): Unit =
        mkPoss(w, w.length).foreach { e => cut(e); contLArChain() }
      def contSuLAr(): Unit =
        mkSU(w, w.length).foreach { e => cut(e); contLArChain() }
      // strips `ki` only when a case suffix (DA/nUn/nDA) follows beneath
      // it — bare ki stays (verified: evki/kitapki keep, evdeki strips)
      def contKi(): Boolean = mkKi(w, w.length).exists { e0 =>
        val s = w.substring(0, e0)
        mkDA(s, e0) match {
          case Some(e1) =>
            cut(e1)
            mkLAr(w, w.length) match {
              case Some(e2) => cut(e2); contKi()
              case None => mkPoss(w, w.length).foreach { e2 =>
                cut(e2); contLArChain()
              }
            }
            true
          case None => mkNUn(s, e0) match {
            case Some(e1) =>
              cut(e1)
              mkLArI(w, w.length) match {
                case Some(e2) => cut(e2)
                case None => contKi()
              }
              true
            case None => mkNDA(s, e0) match {
              case Some(e1) =>
                cut(e1)
                mkLArI(w, w.length) match {
                  case Some(e2) => cut(e2)
                  case None =>
                    mkSU(w, w.length) match {
                      case Some(e2) => cut(e2); contLArChain()
                      case None => contKi()
                    }
                }
                true
              case None => false // bare ki is not stripped
            }
          }
        }
      }
      // (nDA|nA) and (nDAn|nU) fire only when their continuation strips
      // something too; otherwise the deletion is undone and the chain
      // falls through (günde → gün via the plain DA branch)
      def nBranch(m: (String, Int) => Option[Int]): Boolean = {
        val saved = w
        m(w, w.length) match {
          case Some(e) =>
            cut(e)
            mkLArI(w, w.length) match {
              case Some(e2) => cut(e2); true
              case None =>
                mkSU(w, w.length) match {
                  case Some(e2) => cut(e2); contLArChain(); true
                  case None => w = saved; false
                }
            }
          case None => false
        }
      }
      val n = w.length
      mkLAr(w, n) match {
        case Some(e) => cut(e)
        case None => mkNcA(w, n) match {
          case Some(e) =>
            cut(e)
            mkLArI(w, w.length) match {
              case Some(e2) => cut(e2)
              case None =>
                if (mkSU(w, w.length).isDefined) contSuLAr()
                else mkLAr(w, w.length) match {
                  case Some(e2) => cut(e2); contKi()
                  case None => contPossLAr()
                }
            }
          case None => nBranch(alt(mkNDA, mkNA)) match {
            case true => ()
            case false => nBranch(alt(mkNDAn, mkNU)) match {
              case true => ()
              case false => mkDAn(w, n) match {
                case Some(e) =>
                  cut(e)
                  mkPoss(w, w.length) match {
                    case Some(e2) => cut(e2); contLArChain()
                    case None => contLArChain()
                  }
                case None => mkYlA(w, n) match {
                  case Some(e) =>
                    cut(e)
                    mkLArI(w, w.length) match {
                      case Some(e2) => cut(e2)
                      case None =>
                        if (mkSU(w, w.length).isDefined) contSuLAr()
                        else contPossLAr()
                    }
                  case None if contKi() => ()
                  case None => mkNUn(w, n) match {
                    case Some(e) =>
                      cut(e)
                      mkLArI(w, w.length) match {
                        case Some(e2) => cut(e2)
                        case None => contSuLAr()
                      }
                    case None => mkLArI(w, n) match {
                      case Some(e) => cut(e)
                      case None => mkPoss(w, n) match {
                        case Some(e) => cut(e); contLArChain()
                        case None => mkYU(w, n) match {
                          case Some(e) =>
                            cut(e)
                            // continuation order probed against the
                            // published implementation: a genitive nUn may
                            // follow the accusative strip (…oöınü → …oö)
                            mkNUn(w, w.length) match {
                              case Some(e2) => cut(e2); contLArChain()
                              case None => contPossLAr()
                            }
                          case None => mkDA(w, n) match {
                            case Some(e) => cut(e); contPossLAr()
                            case None => mkYA(w, n) match {
                              case Some(e) => cut(e); contPossLAr()
                              case None => ()
                            }
                          }
                        }
                      }
                    }
                  }
                }
              }
            }
          }
        }
      }
    }

    // ---- postlude: reserved words, d/g vowel re-append, consonant map.
    // Probed against the published implementation: BOTH normalizations run
    // only on the noun-suffix path — a phase-1 lar/ler strip (which clears
    // the continue flag) leaves the final consonant as-is (kitablar →
    // kitab, pakadlar → pakad), while kitabdı/kitab → kitap etc. devoice.
    if (w == "ad" || w == "soyad") return w
    if (!continueNoun) return w
    if (w.nonEmpty && (w.last == 'd' || w.last == 'g')) {
      var lv = w.length - 1
      while (lv >= 0 && !trV(w(lv))) lv -= 1
      if (lv >= 0) {
        val u = w(lv) match {
          case 'a' | 'ı' => 'ı'
          case 'e' | 'i' => 'i'
          case 'o' | 'u' => 'u'
          case _ => 'ü'
        }
        w = w + u
      }
    } else if (w.nonEmpty) {
      w.last match {
        case 'b' => w = w.dropRight(1) + "p"
        case 'c' => w = w.dropRight(1) + "ç"
        case 'ğ' => w = w.dropRight(1) + "k"
        case _ => ()
      }
    }
    w
  }
}
