package graft.analysis

/** Snowball stemmers beyond English — the reference's `Stemmer` token filter
  * dispatches per-language Snowball algorithms (`src/tokenizer/stemmer.rs:12-31`,
  * languages at `stemmer.rs:12-31`). Each is implemented from the published
  * Snowball specification (snowballstem.org algorithm pages), with the same
  * longest-suffix ("among") semantics, fixed R1/R2/RV region offsets and
  * per-language letter classes. Pure functions — used identically at index
  * and query time via `Analysis.analyzeChain`.
  */
object Stemmers {

  // ---------- shared region helpers ----------

  /** Standard region start: after the first non-vowel following a vowel. */
  private def regionStart(w: String, from: Int, isVowel: Char => Boolean): Int = {
    var i = from
    while (i < w.length && !isVowel(w(i))) i += 1
    while (i < w.length && isVowel(w(i))) i += 1
    if (i < w.length) i + 1 else w.length
  }

  /** R1 with the Scandinavian/German/Dutch adjustment: at least 3 letters
    * before R1.
    */
  private def r1Min3(w: String, isVowel: Char => Boolean): Int =
    math.max(regionStart(w, 0, isVowel), math.min(3, w.length))

  // =========================================================================
  // German (Snowball "german")
  // =========================================================================

  private val deVowels = "aeiouyäöü".toSet
  private val deSEnding = "bdfghklmnrt".toSet
  private val deStEnding = "bdfghklmnt".toSet

  def stemGerman(input: String): String = {
    if (input.isEmpty) return input
    // preprocess: ß -> ss; mark u/y between vowels as consonants (U/Y)
    var w = input.replace("ß", "ss")
    locally {
      val sb = new StringBuilder(w)
      var i = 1
      while (i < sb.length - 1) {
        val c = sb(i)
        if ((c == 'u' || c == 'y') && deVowels(sb(i - 1)) && deVowels(sb(i + 1)))
          sb(i) = (c - 32).toChar // 'U' / 'Y'
        i += 1
      }
      w = sb.toString
    }
    @inline def isV(c: Char) = deVowels(c)
    val r1 = r1Min3(w, isV)
    val r2 = regionStart(w, regionStart(w, 0, isV), isV)
    @inline def inR1(len: Int, word: String): Boolean = word.length - len >= r1
    @inline def inR2(len: Int, word: String): Boolean = word.length - len >= r2

    // ---- step 1: longest among (a) em ern er (b) e en es (c) s
    locally {
      val sufs = Seq("ern", "em", "er", "en", "es", "e", "s")
      sufs.find(w.endsWith) match {
        case Some("s") =>
          if (inR1(1, w) && w.length >= 2 && deSEnding(w(w.length - 2)))
            w = w.dropRight(1)
        case Some(s @ ("e" | "en" | "es")) =>
          if (inR1(s.length, w)) {
            w = w.dropRight(s.length)
            if (w.endsWith("niss")) w = w.dropRight(1)
          }
        case Some(s) => if (inR1(s.length, w)) w = w.dropRight(s.length)
        case None    => ()
      }
    }

    // ---- step 2: longest among (a) en er est (b) st
    locally {
      val sufs = Seq("est", "en", "er", "st")
      sufs.find(w.endsWith) match {
        case Some("st") =>
          if (inR1(2, w) && w.length >= 6 && deStEnding(w(w.length - 3)))
            w = w.dropRight(2)
        case Some(s) => if (inR1(s.length, w)) w = w.dropRight(s.length)
        case None    => ()
      }
    }

    // ---- step 3: d-suffixes
    locally {
      val sufs = Seq("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik")
      sufs.find(w.endsWith) match {
        case Some(s @ ("end" | "ung")) =>
          if (inR2(s.length, w)) {
            w = w.dropRight(s.length)
            if (w.endsWith("ig") && inR2(2, w) &&
                !(w.length >= 3 && w(w.length - 3) == 'e'))
              w = w.dropRight(2)
          }
        case Some(s @ ("ig" | "ik" | "isch")) =>
          if (inR2(s.length, w) &&
              !(w.length > s.length && w(w.length - s.length - 1) == 'e'))
            w = w.dropRight(s.length)
        case Some(s @ ("lich" | "heit")) =>
          if (inR2(s.length, w)) {
            w = w.dropRight(s.length)
            if ((w.endsWith("er") || w.endsWith("en")) && inR1(2, w))
              w = w.dropRight(2)
          }
        case Some("keit") =>
          if (inR2(4, w)) {
            w = w.dropRight(4)
            if (w.endsWith("lich") && inR2(4, w)) w = w.dropRight(4)
            else if (w.endsWith("ig") && inR2(2, w)) w = w.dropRight(2)
          }
        case _ => ()
      }
    }

    // postprocess: unmark U/Y, strip umlauts
    w.map {
      case 'U' => 'u'; case 'Y' => 'y'
      case 'ä' => 'a'; case 'ö' => 'o'; case 'ü' => 'u'
      case c   => c
    }
  }

  // =========================================================================
  // Swedish (Snowball "swedish")
  // =========================================================================

  private val svVowels = "aeiouyäåö".toSet
  private val svSEnding = "bcdfghjklmnoprtvy".toSet
  private val svStep1 = Seq(
    "heterna", "hetens", "heter", "heten", "anden", "arnas", "ernas", "ornas",
    "andes", "andet", "arens", "arna", "erna", "orna", "ande", "arne", "aste",
    "aren", "ades", "erns", "ade", "are", "ern", "ens", "het", "ast", "ad",
    "en", "ar", "er", "or", "as", "es", "at", "a", "e"
  ).sortBy(-_.length)

  def stemSwedish(input: String): String = {
    if (input.length < 3) return input
    var w = input
    @inline def isV(c: Char) = svVowels(c)
    val r1 = r1Min3(w, isV)
    @inline def inR1(len: Int): Boolean = w.length - len >= r1

    // step 1 — among limited to R1: longest suffix that FITS the region
    // (a longer one crossing R1 does not shadow it); `s` needs a valid
    // s-ending before it
    (svStep1 :+ "s").filter(s => w.endsWith(s) && inR1(s.length))
      .sortBy(-_.length).exists {
        case "s" =>
          if (w.length >= 2 && svSEnding(w(w.length - 2))) {
            w = w.dropRight(1); true
          } else false
        case s => w = w.dropRight(s.length); true
      }
    // step 2: shorten dd gd nn dt gt kt tt
    if (inR1(2) && Set("dd", "gd", "nn", "dt", "gt", "kt", "tt")(w.takeRight(2)))
      w = w.dropRight(1)
    // step 3 — among limited to R1 (Swedish has only lig/ig/els, no elig)
    if (w.endsWith("fullt") && inR1(5)) w = w.dropRight(1)
    else if (w.endsWith("löst") && inR1(4)) w = w.dropRight(1)
    else Seq("lig", "els", "ig").find(s => w.endsWith(s) && inR1(s.length)) match {
      case Some(s) => w = w.dropRight(s.length)
      case _       => ()
    }
    w
  }

  // =========================================================================
  // Norwegian (Snowball "norwegian")
  // =========================================================================

  private val noVowels = "aeiouyæåø".toSet
  private val noSEnding = "bcdfghjlmnoprtvy".toSet
  private val noStep1 = Seq(
    "hetenes", "hetene", "hetens", "heten", "heter", "endes", "enes", "edes",
    "ende", "ande", "ene", "ane", "ede", "ers", "ets", "het", "ast", "ens",
    "en", "ar", "er", "as", "es", "et", "a", "e"
  ).sortBy(-_.length)

  def stemNorwegian(input: String): String = {
    if (input.length < 3) return input
    var w = input
    @inline def isV(c: Char) = noVowels(c)
    val r1 = r1Min3(w, isV)
    @inline def inR1(len: Int): Boolean = w.length - len >= r1

    // step 1 — among limited to R1 (longest FITTING suffix wins):
    // d-suffixes delete, erte|ert -> er, `s` needs a valid s-ending
    (noStep1 ++ Seq("erte", "ert", "s"))
      .filter(s => w.endsWith(s) && inR1(s.length))
      .sortBy(-_.length).headOption match {
      case Some(s @ ("erte" | "ert")) => w = w.dropRight(s.length) + "er"
      case Some("s") =>
        if (w.length >= 2 && {
          val p = w(w.length - 2)
          noSEnding(p) || (p == 'k' && (w.length < 3 || !isV(w(w.length - 3))))
        }) w = w.dropRight(1)
      case Some(s) => w = w.dropRight(s.length)
      case None    => ()
    }
    // step 2: shorten dt / vt
    if (inR1(2) && (w.endsWith("dt") || w.endsWith("vt"))) w = w.dropRight(1)
    // step 3 — among limited to R1: longest suffix that FITS the region
    Seq("hetslov", "eleg", "elig", "elov", "slov", "leg", "eig", "lig",
        "els", "lov", "ig").find(s => w.endsWith(s) && inR1(s.length)) match {
      case Some(s) => w = w.dropRight(s.length)
      case _       => ()
    }
    w
  }

  // =========================================================================
  // Danish (Snowball "danish")
  // =========================================================================

  private val daVowels = "aeiouyæåø".toSet
  private val daSEnding = "abcdfghjklmnoprtvyzå".toSet
  private val daStep1 = Seq(
    "erendes", "erende", "hedens", "ethed", "erede", "heden", "heder", "endes",
    "ernes", "erens", "erets", "ered", "ende", "erne", "eren", "erer", "heds",
    "enes", "eres", "eret", "hed", "ene", "ere", "ens", "ers", "ets", "en",
    "er", "es", "et", "e"
  ).sortBy(-_.length)

  def stemDanish(input: String): String = {
    if (input.length < 3) return input
    var w = input
    @inline def isV(c: Char) = daVowels(c)
    val r1 = r1Min3(w, isV)
    @inline def inR1(len: Int): Boolean = w.length - len >= r1
    def step2(): Unit =
      if (inR1(2) && Set("gd", "dt", "gt", "kt")(w.takeRight(2))) w = w.dropRight(1)

    // step 1 — among: longest suffix fitting R1; the `s` entry's condition
    // failing does not block shorter entries (there are none after `s`)
    (daStep1 :+ "s").filter(s => w.endsWith(s) && inR1(s.length))
      .sortBy(-_.length).exists {
        case "s" =>
          if (w.length >= 2 && daSEnding(w(w.length - 2))) {
            w = w.dropRight(1); true
          } else false
        case s => w = w.dropRight(s.length); true
      }
    // step 2
    step2()
    // step 3 — among limited to R1: longest suffix that FITS the region
    if (w.endsWith("igst")) w = w.dropRight(2)
    if (w.endsWith("løst") && inR1(4)) w = w.dropRight(1)
    else Seq("elig", "lig", "els", "ig")
      .find(s => w.endsWith(s) && inR1(s.length)) match {
      case Some(s) => w = w.dropRight(s.length); step2()
      case _       => ()
    }
    // step 4: undouble — final double consonant in R1 loses one letter
    if (inR1(1) && w.length >= 2 && w(w.length - 1) == w(w.length - 2) &&
        !isV(w.last)) w = w.dropRight(1)
    w
  }

  // =========================================================================
  // Dutch (Snowball "dutch")
  // =========================================================================

  private val nlVowels = "aeiouyè".toSet

  def stemDutch(input: String): String = {
    if (input.length < 3) return input
    // preprocess: strip umlauts/acutes, then mark consonant i/y as I/Y
    var w = input.map {
      case 'ä' | 'á' => 'a'; case 'ë' | 'é' => 'e'; case 'ï' | 'í' => 'i'
      case 'ö' | 'ó' => 'o'; case 'ü' | 'ú' => 'u'; case c => c
    }
    locally {
      val sb = new StringBuilder(w)
      var i = 0
      while (i < sb.length) {
        if (sb(i) == 'y' && (i == 0 || nlVowels(sb(i - 1)))) sb(i) = 'Y'
        else if (sb(i) == 'i' && i > 0 && i < sb.length - 1 &&
                 nlVowels(sb(i - 1)) && nlVowels(sb(i + 1))) sb(i) = 'I'
        i += 1
      }
      w = sb.toString
    }
    @inline def isV(c: Char) = nlVowels(c) // I/Y are consonants now
    val r1 = r1Min3(w, isV)
    val r2 = regionStart(w, regionStart(w, 0, isV), isV)
    @inline def inR1(len: Int): Boolean = w.length - len >= r1
    @inline def inR2(len: Int): Boolean = w.length - len >= r2
    def undouble(): Unit =
      if (Set("kk", "dd", "tt")(w.takeRight(2))) w = w.dropRight(1)
    def enRule(): Unit = {
      val s = if (w.endsWith("ene")) 3 else if (w.endsWith("en")) 2 else 0
      if (s > 0 && inR1(s) && w.length > s) {
        val p = w(w.length - s - 1)
        if (!isV(p) && !w.dropRight(s).endsWith("gem")) {
          w = w.dropRight(s); undouble()
        }
      }
    }

    // step 1: heden -> heid | en/ene | s/se
    if (w.endsWith("heden") && inR1(5)) w = w.dropRight(5) + "heid"
    else if (w.endsWith("ene") || w.endsWith("en")) enRule()
    else {
      val s = if (w.endsWith("se")) 2 else if (w.endsWith("s")) 1 else 0
      if (s > 0 && inR1(s) && w.length > s) {
        val p = w(w.length - s - 1)
        if (!isV(p) && p != 'j') w = w.dropRight(s)
      }
    }
    // step 2: delete e if in R1 and preceded by a non-vowel
    var eFound = false
    if (w.endsWith("e") && inR1(1) && w.length >= 2 && !isV(w(w.length - 2))) {
      eFound = true; w = w.dropRight(1); undouble()
    }
    // step 3a: heid
    if (w.endsWith("heid") && inR2(4) && !(w.length > 4 && w(w.length - 5) == 'c')) {
      w = w.dropRight(4); enRule()
    }
    // step 3b: d-suffixes
    locally {
      val sufs = Seq("lijk", "baar", "end", "ing", "bar", "ig")
      sufs.find(w.endsWith) match {
        case Some(s @ ("end" | "ing")) if inR2(s.length) =>
          w = w.dropRight(s.length)
          if (w.endsWith("ig") && inR2(2) && !(w.length > 2 && w(w.length - 3) == 'e'))
            w = w.dropRight(2)
          else undouble()
        case Some("ig") if inR2(2) && !(w.length > 2 && w(w.length - 3) == 'e') =>
          w = w.dropRight(2)
        case Some("lijk") if inR2(4) =>
          w = w.dropRight(4)
          if (w.endsWith("e") && inR1(1) && w.length >= 2 && !isV(w(w.length - 2))) {
            w = w.dropRight(1); undouble()
          }
        case Some("baar") if inR2(4) => w = w.dropRight(4)
        case Some("bar") if inR2(3) && eFound => w = w.dropRight(3)
        case _ => ()
      }
    }
    // step 4: undouble vowel — C vv D with D a non-vowel other than I
    if (w.length >= 4) {
      val n = w.length
      val c = w(n - 4); val v1 = w(n - 3); val v2 = w(n - 2); val d = w(n - 1)
      if (!isV(c) && v1 == v2 && "aeou".contains(v1) && !isV(d) && d != 'I')
        w = w.substring(0, n - 2) + d
    }
    w.map { case 'I' => 'i'; case 'Y' => 'y'; case c => c }
  }

  // =========================================================================
  // Russian (Snowball "russian") — Cyrillic input (lowercased upstream)
  // =========================================================================

  private val ruVowels = "аеиоуыэюя".toSet

  private val ruPerfGerund1 = Seq("вшись", "вши", "в")
  private val ruPerfGerund2 = Seq("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
  private val ruAdjective = Seq(
    "ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые", "ое", "ей",
    "ий", "ый", "ой", "ем", "им", "ым", "ом", "их", "ых", "ую", "юю", "ая",
    "яя", "ою", "ею").sortBy(-_.length)
  private val ruParticiple1 = Seq("ем", "нн", "вш", "ющ", "щ").sortBy(-_.length)
  private val ruParticiple2 = Seq("ивш", "ывш", "ующ").sortBy(-_.length)
  private val ruVerb1 = Seq(
    "ете", "йте", "ешь", "нно", "ла", "на", "ли", "ем", "ло", "но", "ет",
    "ют", "ны", "ть", "й", "л", "н").sortBy(-_.length)
  private val ruVerb2 = Seq(
    "ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли", "ило", "ыло",
    "ено", "ует", "уют", "ены", "ить", "ыть", "ишь", "ей", "уй", "ил", "ыл",
    "им", "ым", "ен", "ят", "ит", "ыт", "ую", "ю").sortBy(-_.length)
  private val ruNoun = Seq(
    "иями", "ями", "ами", "ией", "иям", "ием", "иях", "ев", "ов", "ие", "ье",
    "еи", "ии", "ей", "ой", "ий", "ям", "ем", "ам", "ом", "ах", "ях", "ию",
    "ью", "ия", "ья", "а", "е", "и", "й", "о", "у", "ы", "ь", "ю", "я")
    .sortBy(-_.length)

  def stemRussian(input: String): String = {
    var w = input.replace('ё', 'е')
    if (!w.exists(ruVowels)) return w
    @inline def isV(c: Char) = ruVowels(c)
    val rv = { var i = 0; while (i < w.length && !isV(w(i))) i += 1
               if (i < w.length) i + 1 else w.length }
    val r1 = regionStart(w, 0, isV)
    val r2 = regionStart(w, r1, isV)
    @inline def inRV(len: Int): Boolean = w.length - len >= rv
    @inline def inR2(len: Int): Boolean = w.length - len >= r2
    // group-1 endings require a preceding а/я (itself in RV)
    def g1Match(s: String): Boolean =
      w.endsWith(s) && inRV(s.length) && w.length > s.length && {
        val p = w(w.length - s.length - 1)
        (p == 'а' || p == 'я') && w.length - s.length - 1 >= rv
      }
    def tryRemove(g1: Seq[String], g2: Seq[String]): Boolean = {
      // longest match across both groups wins (among semantics)
      val cands =
        g2.filter(s => w.endsWith(s) && inRV(s.length)).map(s => (s.length, s, false)) ++
        g1.filter(g1Match).map(s => (s.length, s, true))
      if (cands.isEmpty) false
      else { val (_, s, _) = cands.maxBy(_._1); w = w.dropRight(s.length); true }
    }

    // step 1
    if (!tryRemove(ruPerfGerund1, ruPerfGerund2)) {
      if ((w.endsWith("ся") || w.endsWith("сь")) && inRV(2)) w = w.dropRight(2)
      val adj = ruAdjective.find(s => w.endsWith(s) && inRV(s.length))
      adj match {
        case Some(a) =>
          w = w.dropRight(a.length)
          tryRemove(ruParticiple1, ruParticiple2)
        case None =>
          if (!tryRemove(ruVerb1, ruVerb2))
            ruNoun.find(s => w.endsWith(s) && inRV(s.length))
              .foreach(s => w = w.dropRight(s.length))
      }
    }
    // step 2: final и in RV
    if (w.endsWith("и") && inRV(1)) w = w.dropRight(1)
    // step 3: derivational ост/ость in R2
    Seq("ость", "ост").find(s => w.endsWith(s) && inR2(s.length))
      .foreach(s => w = w.dropRight(s.length))
    // step 4
    if (w.endsWith("нн") && inRV(1)) w = w.dropRight(1)
    else {
      val sup = Seq("ейше", "ейш").find(s => w.endsWith(s) && inRV(s.length))
      sup match {
        case Some(s) =>
          w = w.dropRight(s.length)
          if (w.endsWith("нн") && inRV(1)) w = w.dropRight(1)
        case None =>
          if (w.endsWith("ь") && inRV(1)) w = w.dropRight(1)
      }
    }
    w
  }
}
