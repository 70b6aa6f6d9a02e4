package graft.analysis

/** Snowball stemmers for the Uralic languages the reference's `Stemmer`
  * filter supports (`src/tokenizer/stemmer.rs:12-31`): Finnish and
  * Hungarian. Implemented from the published Snowball specifications
  * (snowballstem.org algorithm pages) with among semantics matching the
  * published implementations: candidate suffixes are matched longest-first
  * within the region limit, and a failed per-entry condition backtracks to
  * the next-longest fitting suffix. Validated against golden vectors
  * harvested from the published Snowball implementations (see
  * tools/gen_stem_vectors.py / StemmersUralicSpec). Pure functions — used
  * identically at index and query time.
  */
object StemmersUralic {

  /** Standard region start: after the first non-vowel following a vowel. */
  private def regionStart(w: String, from: Int, isVowel: Char => Boolean): Int = {
    var i = from
    while (i < w.length && !isVowel(w(i))) i += 1
    while (i < w.length && isVowel(w(i))) i += 1
    if (i < w.length) i + 1 else w.length
  }

  /** Snowball among with backtracking: suffixes of `w` lying entirely
    * within the region starting at `r`, tried longest-first; `act` returns
    * true when its condition passed and it performed its action.
    */
  private def among(w: String, r: Int, sufs: Seq[String])(
      act: String => Boolean): Boolean =
    sufs.filter(s => w.endsWith(s) && w.length - s.length >= r)
      .sortBy(-_.length).exists(act)

  // =========================================================================
  // Finnish (Snowball "finnish")
  // =========================================================================

  private val fiV = "aeiouyäö".toSet // vowel
  private val fiRestricted = "aeiouäö".toSet // restricted vowel V (no y)

  /** Word ends with a long vowel (aa ee ii oo uu ää öö). */
  private def fiEndsLV(w: String): Boolean =
    w.length >= 2 && w(w.length - 1) == w(w.length - 2) &&
      fiRestricted(w(w.length - 1))

  def stemFinnish(input: String): String = {
    if (input.length < 2) return input
    var w = input
    val r1 = regionStart(w, 0, fiV)
    val r2 = regionStart(w, r1, fiV)
    var removed = false // step-3 case-ending-removed flag for step 5

    // ---- step 1: particles etc
    among(w, r1, Seq("kaan", "kään", "kin", "han", "hän", "sti", "ko", "kö",
      "pa", "pä")) {
      case "sti" =>
        if (w.length - 3 >= r2) { w = w.dropRight(3); true } else false
      case s =>
        val p = w.length - s.length - 1
        if (p >= 0 && (w(p) == 'n' || w(p) == 't' || fiV(w(p)))) {
          w = w.dropRight(s.length); true
        } else false
    }

    // ---- step 2: possessives
    def precededBy(sufLen: Int, pres: Seq[String]): Boolean =
      pres.exists(p => w.length - sufLen - p.length >= 0 &&
        w.regionMatches(w.length - sufLen - p.length, p, 0, p.length))
    among(w, r1, Seq("nsa", "nsä", "mme", "nne", "si", "ni", "an", "än",
      "en")) {
      case "si" =>
        if (!(w.length >= 3 && w(w.length - 3) == 'k')) {
          w = w.dropRight(2); true
        } else false
      case "ni" =>
        w = w.dropRight(2)
        if (w.endsWith("kse")) w = w.dropRight(1) + "i"
        true
      case "an" =>
        if (precededBy(2, Seq("ta", "ssa", "sta", "lla", "lta", "na"))) {
          w = w.dropRight(2); true
        } else false
      case "än" =>
        if (precededBy(2, Seq("tä", "ssä", "stä", "llä", "ltä", "nä"))) {
          w = w.dropRight(2); true
        } else false
      case "en" =>
        if (precededBy(2, Seq("lle", "ine"))) { w = w.dropRight(2); true }
        else false
      case s => w = w.dropRight(s.length); true // nsa nsä mme nne
    }

    // ---- step 3: case endings (sets `removed` on deletion)
    val hForms = Map("han" -> 'a', "hen" -> 'e', "hin" -> 'i', "hon" -> 'o',
      "hän" -> 'ä', "hön" -> 'ö')
    among(w, r1, Seq("siin", "seen", "tten", "han", "hen", "hin", "hon",
      "hän", "hön", "den", "tta", "ttä", "ssa", "ssä", "sta", "stä", "lla",
      "llä", "lta", "ltä", "lle", "ksi", "ine", "na", "nä", "ta", "tä", "a",
      "ä", "n")) {
      case s if hForms.contains(s) =>
        // hXn is a BLOCKER: a matched hXn whose preceding vowel differs
        // stops the step (no fall-through to the bare `n` entry) — verified
        // against the published implementation (vaikeushan stays whole)
        if (w.length >= 4 && w(w.length - 4) == hForms(s)) {
          w = w.dropRight(3); removed = true
        }
        true
      case s @ ("siin" | "den" | "tten") =>
        // preceded by Vi: restricted vowel + i immediately before
        val p = w.length - s.length
        if (p >= 2 && w(p - 1) == 'i' && fiRestricted(w(p - 2))) {
          w = w.dropRight(s.length); removed = true; true
        } else false
      case "seen" =>
        if (fiEndsLV(w.dropRight(4))) {
          w = w.dropRight(4); removed = true; true
        } else false
      case "a" | "ä" =>
        // preceded by cv: consonant then vowel immediately before
        val p = w.length - 1
        if (p >= 2 && fiV(w(p - 1)) && !fiV(w(p - 2))) {
          w = w.dropRight(1); removed = true; true
        } else false
      case s @ ("tta" | "ttä") =>
        if (w.length >= 4 && w(w.length - 4) == 'e') {
          w = w.dropRight(3); removed = true; true
        } else false
      case "n" =>
        w = w.dropRight(1); removed = true
        if (fiEndsLV(w) || w.endsWith("ie")) w = w.dropRight(1)
        true
      case s => w = w.dropRight(s.length); removed = true; true
    }

    // ---- step 4: other endings (R2)
    among(w, r2, Seq("impi", "impa", "impä", "immi", "imma", "immä", "mpi",
      "mpa", "mpä", "mmi", "mma", "mmä", "eja", "ejä")) {
      case s @ ("mpi" | "mpa" | "mpä" | "mmi" | "mma" | "mmä") =>
        if (!(w.length >= s.length + 2 &&
            w.regionMatches(w.length - s.length - 2, "po", 0, 2))) {
          w = w.dropRight(s.length); true
        } else false
      case s => w = w.dropRight(s.length); true
    }

    // ---- step 5: plurals
    if (removed) {
      if ((w.endsWith("i") || w.endsWith("j")) && w.length - 1 >= r1)
        w = w.dropRight(1)
    } else if (w.endsWith("t") && w.length - 1 >= r1 &&
        w.length >= 2 && fiV(w(w.length - 2))) {
      w = w.dropRight(1)
      if (w.endsWith("imma") && w.length - 4 >= r2) w = w.dropRight(4)
      else if (w.endsWith("mma") && w.length - 3 >= r2 &&
          !(w.length >= 5 && w.regionMatches(w.length - 5, "po", 0, 2)))
        w = w.dropRight(3)
    }

    // ---- step 6: tidy
    if (w.length - 2 >= r1 && fiEndsLV(w)) w = w.dropRight(1)
    if (w.length - 2 >= r1 && w.length >= 2 && !fiV(w(w.length - 2)) &&
        "aäei".contains(w(w.length - 1))) w = w.dropRight(1)
    if (w.length - 2 >= r1 && (w.endsWith("oj") || w.endsWith("uj")))
      w = w.dropRight(1)
    if (w.length - 2 >= r1 && w.endsWith("jo")) w = w.dropRight(1)
    // undouble a final double consonant followed by zero or more vowels
    locally {
      var i = w.length - 1
      while (i >= 0 && fiV(w(i))) i -= 1
      if (i >= 1 && !fiV(w(i)) && w(i) == w(i - 1))
        w = w.substring(0, i) + w.substring(i + 1)
    }
    w
  }

  // =========================================================================
  // Hungarian (Snowball "hungarian")
  // =========================================================================

  private val huV = "aáeéiíoóöőuúüű".toSet
  private val huDigraphs = Seq("dzs", "dz", "cs", "gy", "ly", "ny", "sz",
    "ty", "zs")
  private val huDoubles = Seq("ccs", "ggy", "lly", "nny", "ssz", "tty",
    "zzs", "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn",
    "pp", "rr", "ss", "tt", "vv", "zz")

  /** R1: vowel-initial word — after the first consonant-or-digraph
    * (cs/dz/dzs/gy/ly/ny/sz/ty/zs count as one consonant);
    * consonant-initial word — after the first vowel.
    */
  private def huR1(w: String): Int = {
    if (w.isEmpty) return 0
    if (huV(w(0))) {
      var i = 1
      while (i < w.length && huV(w(i))) i += 1
      if (i >= w.length) w.length
      else huDigraphs.find(d => w.startsWith(d, i)) match {
        case Some(d) => math.min(i + d.length, w.length)
        case None => i + 1
      }
    } else {
      var i = 0
      while (i < w.length && !huV(w(i))) i += 1
      if (i >= w.length) w.length else i + 1
    }
  }

  /** Hungarian among: NO region limit on matching — the longest matching
    * suffix wins outright and its action tests R1 itself; a failed test
    * makes the whole among a no-op (a long suffix crossing R1 BLOCKS
    * shorter ones — verified: csak/nem stay whole, széké → széke).
    */
  private def amongBlock(w: String, sufs: Seq[String])(
      act: String => Unit): Unit =
    sufs.filter(w.endsWith).sortBy(-_.length).headOption.foreach(act)

  /** Word minus `drop` trailing chars ends with a double consonant. */
  private def huEndsDouble(w: String, drop: Int): Boolean =
    huDoubles.exists(w.substring(0, w.length - drop).endsWith)

  /** Remove one letter of a final double consonant (ccs→cs, bb→b, …). */
  private def huUndouble(w: String): String =
    huDoubles.find(w.endsWith) match {
      case Some(d) if d.length == 3 => w.dropRight(3) + d.substring(1)
      case Some(_) => w.dropRight(1)
      case None => w
    }

  /** Post-delete tidy: final á → a, final é → e. */
  /** v_ending: final á→a / é→e, but ONLY when the vowel itself lies in R1
    * (probed: hmán → hmá, the á before R1 survives the n-removal intact).
    */
  private def huVEnding(w: String, r1: Int): String =
    if (w.endsWith("á") && w.length - 1 >= r1) w.dropRight(1) + "a"
    else if (w.endsWith("é") && w.length - 1 >= r1) w.dropRight(1) + "e"
    else w

  def stemHungarian(input: String): String = {
    if (input.length < 2) return input
    var w = input
    val r1 = huR1(w)
    def fit(s: String): Boolean = w.length - s.length >= r1

    // ---- step 1: instrumental (assimilated -val/-vel: al/el after a
    // double consonant, then undouble)
    amongBlock(w, Seq("al", "el")) { s =>
      if (fit(s) && huEndsDouble(w, 2)) w = huUndouble(w.dropRight(2))
    }

    // ---- step 2: frequent cases
    amongBlock(w, Seq("önként", "onként", "enként", "anként", "képpen",
      "ként", "képp", "ban", "ben", "nak", "nek", "val", "vel", "tól",
      "től", "ról", "ről", "ból", "ből", "hoz", "hez", "höz", "nál", "nél",
      "ért", "kor", "ba", "be", "ra", "re", "ul", "ül", "vá", "vé", "at",
      "et", "ot", "öt", "ig", "en", "on", "an", "ön", "n", "t")) { s =>
      if (fit(s)) w = huVEnding(w.dropRight(s.length), r1)
    }

    // ---- step 3: special cases
    amongBlock(w, Seq("ánként", "án", "én")) {
      case s @ ("ánként" | "án") =>
        if (fit(s)) w = w.dropRight(s.length) + "a"
      case s => if (fit(s)) w = w.dropRight(2) + "e" // én
    }

    // ---- step 4: other cases
    amongBlock(w, Seq("astul", "estül", "ástul", "éstül", "stul",
      "stül")) {
      case s @ "ástul" => if (fit(s)) w = w.dropRight(5) + "a"
      case s @ "éstül" => if (fit(s)) w = w.dropRight(5) + "e"
      case s => if (fit(s)) w = w.dropRight(s.length)
    }

    // ---- step 5: factive (assimilated -vá/-vé after a double consonant)
    amongBlock(w, Seq("á", "é")) { s =>
      if (fit(s) && huEndsDouble(w, 1)) w = huUndouble(w.dropRight(1))
    }

    // ---- step 6: owned
    amongBlock(w, Seq("áké", "áéi", "éké", "ééi", "oké", "öké", "aké",
      "eké", "éé", "ké", "éi", "é")) {
      case s @ ("áké" | "áéi") =>
        if (fit(s)) w = w.dropRight(s.length) + "a"
      case s @ ("éké" | "ééi" | "éé") =>
        if (fit(s)) w = w.dropRight(s.length) + "e"
      case s => if (fit(s)) w = w.dropRight(s.length)
    }

    // ---- step 7: singular owner suffixes
    amongBlock(w, Seq("ájuk", "éjük", "ánk", "énk", "juk", "jük", "unk",
      "ünk", "nk", "ám", "ád", "ém", "éd", "em", "om", "am", "od", "ed",
      "ad", "öd", "ja", "je", "uk", "ük", "á", "é", "m", "d", "a", "e",
      "o")) {
      case s @ ("ánk" | "ájuk" | "ám" | "ád" | "á") =>
        if (fit(s)) w = w.dropRight(s.length) + "a"
      case s @ ("énk" | "éjük" | "ém" | "éd" | "é") =>
        if (fit(s)) w = w.dropRight(s.length) + "e"
      case s => if (fit(s)) w = w.dropRight(s.length)
    }

    // ---- step 8: plural owner suffixes
    amongBlock(w, Seq("jaitok", "jeitek", "jaink", "jeink", "aitok",
      "eitek", "áitok", "éitek", "jaim", "jeim", "jaid", "jeid", "eink",
      "aink", "itek", "jeik", "jaik", "áink", "éink", "aim", "eim", "aid",
      "eid", "jai", "jei", "ink", "aik", "eik", "áim", "áid", "áik", "éim",
      "éid", "éik", "im", "id", "ai", "ei", "ik", "ái", "éi", "i")) {
      case s if s.startsWith("á") =>
        if (fit(s)) w = w.dropRight(s.length) + "a"
      case s if s.startsWith("é") =>
        if (fit(s)) w = w.dropRight(s.length) + "e"
      case s => if (fit(s)) w = w.dropRight(s.length)
    }

    // ---- step 9: plural
    amongBlock(w, Seq("ák", "ék", "ök", "ok", "ek", "ak", "k")) {
      case s @ "ák" => if (fit(s)) w = w.dropRight(2) + "a"
      case s @ "ék" => if (fit(s)) w = w.dropRight(2) + "e"
      case s => if (fit(s)) w = w.dropRight(s.length)
    }
    w
  }
}
