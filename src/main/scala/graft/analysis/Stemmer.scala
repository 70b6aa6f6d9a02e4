package graft.analysis

/** Snowball English (Porter2) stemmer — the reference's `en_stem` token
  * filter (`src/tokenizer/stemmer.rs:12-31` dispatches to the Snowball
  * "english" algorithm). Implemented from the published Snowball English
  * specification; longest-suffix ("among") semantics per step, fixed R1/R2
  * region start offsets, Y-marking for consonant y.
  */
object Stemmer {

  private val exceptions: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  /** Words left untouched after step 1a. */
  private val step1aStop: Set[String] = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  private val doubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val liEnding = "cdeghkmnrt".toSet

  @inline private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'
  // after Y-marking, 'Y' is a consonant and 'y' a vowel

  /** Short syllable ending at position `end` (exclusive) of w:
    * (a) non-vowel, vowel, non-vowel(not w/x/Y) — the last three letters; or
    * (b) the word is exactly vowel + non-vowel (at the beginning).
    */
  private def endsShortSyllable(w: String): Boolean = {
    val n = w.length
    if (n == 2) isVowel(w(0)) && !isVowel(w(1))
    else if (n >= 3) {
      val c = w(n - 1); val v = w(n - 2); val p = w(n - 3)
      !isVowel(p) && isVowel(v) && !isVowel(c) && c != 'w' && c != 'x' && c != 'Y'
    } else false
  }

  /** R1 start: after the first non-vowel following a vowel (special-cased
    * prefixes gener/commun/arsen per the spec).
    */
  private def r1Start(w: String): Int = {
    if (w.startsWith("gener")) return 5
    if (w.startsWith("commun")) return 6
    if (w.startsWith("arsen")) return 5
    regionStart(w, 0)
  }

  private def regionStart(w: String, from: Int): Int = {
    var i = from
    while (i < w.length && !isVowel(w(i))) i += 1   // to first vowel
    while (i < w.length && isVowel(w(i))) i += 1    // to first non-vowel after it
    if (i < w.length) i + 1 else w.length
  }

  def stemEnglish(input: String): String = {
    if (input.length <= 2) return input
    var w = input
    if (!w.forall(c => c >= 'a' && c <= 'z' || c == '\'')) return w // non-ASCII-alpha: leave
    exceptions.get(w).foreach(return _)
    if (w.startsWith("'")) w = w.substring(1)
    // mark consonant y as Y: initial y, or y after a vowel
    locally {
      val sb = new StringBuilder(w)
      var i = 0
      while (i < sb.length) {
        if (sb(i) == 'y' && (i == 0 || isVowel(sb(i - 1)))) sb(i) = 'Y'
        i += 1
      }
      w = sb.toString
    }
    val r1 = r1Start(w)
    val r2 = regionStart(w, r1)
    @inline def inR1(suffixLen: Int): Boolean = w.length - suffixLen >= r1
    @inline def inR2(suffixLen: Int): Boolean = w.length - suffixLen >= r2

    // ---- step 0: longest of ' 's 's'
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)

    // ---- step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies"))
      w = if (w.length > 4) w.dropRight(2) else w.dropRight(1)
    else if (w.endsWith("us") || w.endsWith("ss")) ()
    else if (w.endsWith("s")) {
      // delete if the preceding word part contains a vowel NOT immediately
      // before the s
      val body = w.dropRight(1)
      if (body.length >= 2 && body.dropRight(1).exists(isVowel)) w = body
    }
    if (step1aStop.contains(w)) return unmark(w)

    // ---- step 1b
    if (w.endsWith("eedly")) { if (inR1(5)) w = w.dropRight(3) }
    else if (w.endsWith("eed")) { if (inR1(3)) w = w.dropRight(1) }
    else {
      val suf =
        if (w.endsWith("ingly")) 5
        else if (w.endsWith("edly")) 4
        else if (w.endsWith("ing")) 3
        else if (w.endsWith("ed")) 2
        else 0
      if (suf > 0 && w.dropRight(suf).exists(isVowel)) {
        w = w.dropRight(suf)
        if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
        else if (w.length >= 2 && doubles.contains(w.takeRight(2))) w = w.dropRight(1)
        // "short word" = ends in a short syllable AND R1 is null
        else if (r1 >= w.length && endsShortSyllable(w)) w += "e"
      }
    }

    // ---- step 1c: y/Y -> i if preceded by a non-vowel which is not the
    // first letter
    if (w.length > 2 && (w.last == 'y' || w.last == 'Y') && !isVowel(w(w.length - 2)))
      w = w.dropRight(1) + "i"

    // ---- step 2 (longest among, act if in R1)
    locally {
      val rules: Seq[(String, String)] = Seq(
        "ization" -> "ize", "ational" -> "ate", "fulness" -> "ful",
        "ousness" -> "ous", "iveness" -> "ive", "tional" -> "tion",
        "biliti" -> "ble", "lessli" -> "less", "entli" -> "ent",
        "ation" -> "ate", "alism" -> "al", "aliti" -> "al", "ousli" -> "ous",
        "iviti" -> "ive", "fulli" -> "ful", "enci" -> "ence", "anci" -> "ance",
        "abli" -> "able", "izer" -> "ize", "ator" -> "ate", "alli" -> "al",
        "bli" -> "ble", "ogi" -> "og", "li" -> "")
      rules.find { case (s, _) => w.endsWith(s) } match {
        case Some((s, r)) if inR1(s.length) =>
          if (s == "ogi") { if (w.length > 3 && w(w.length - 4) == 'l') w = w.dropRight(3) + r }
          else if (s == "li") { if (w.length > 2 && liEnding.contains(w(w.length - 3))) w = w.dropRight(2) }
          else w = w.dropRight(s.length) + r
        case _ => ()
      }
    }

    // ---- step 3 (longest among, act if in R1)
    locally {
      val rules: Seq[(String, String)] = Seq(
        "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
        "icate" -> "ic", "iciti" -> "ic", "ative" -> "", "ical" -> "ic",
        "ness" -> "", "ful" -> "")
      rules.find { case (s, _) => w.endsWith(s) } match {
        case Some((s, r)) if inR1(s.length) =>
          if (s == "ative") { if (inR2(5)) w = w.dropRight(5) }
          else w = w.dropRight(s.length) + r
        case _ => ()
      }
    }

    // ---- step 4 (longest among, delete if in R2)
    locally {
      val sufs = Seq("ement", "ance", "ence", "able", "ible", "ment",
        "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
        "al", "er", "ic")
      sufs.find(w.endsWith) match {
        case Some("ion") =>
          if (inR2(3) && w.length > 3 && (w(w.length - 4) == 's' || w(w.length - 4) == 't'))
            w = w.dropRight(3)
        case Some(s) if inR2(s.length) => w = w.dropRight(s.length)
        case _ => ()
      }
    }

    // ---- step 5
    if (w.endsWith("e")) {
      if (inR2(1)) w = w.dropRight(1)
      else if (inR1(1) && !endsShortSyllable(w.dropRight(1))) w = w.dropRight(1)
    } else if (w.endsWith("l")) {
      if (inR2(1) && w.length > 1 && w(w.length - 2) == 'l') w = w.dropRight(1)
    }

    unmark(w)
  }

  @inline private def unmark(w: String): String =
    if (w.indexOf('Y') >= 0) w.replace('Y', 'y') else w
}
