package graft.analysis

/** Snowball Arabic stemmer (the algorithm by Assem Chelli published at
  * snowballstem.org; the reference's `Stemmer` filter dispatches it via
  * rust-stemmers, `src/tokenizer/stemmer.rs:12-31`). Implemented from the
  * published algorithm structure — Checks1 → Normalize_pre → suffix steps
  * (verb/noun/alef-maqsura, driven by is_noun/is_verb/is_defined flags) →
  * prefix steps → Normalize_post — and validated against golden vectors
  * harvested from the published implementation (tools/gen_stem_vectors.py,
  * GoldenStemSpec). Pure function, used identically at index and query time.
  *
  * Snowball `among` semantics are replicated exactly: the LONGEST matching
  * entry is selected and if its length condition fails the whole among
  * fails (no fallback to a shorter entry); string mutations made before a
  * failing step persist (Snowball `or` restores only the cursor).
  */
object StemmersArabic {

  private final val Hamza = 'ء' // ء
  private final val AlefMadda = 'آ' // آ
  private final val AlefHamzaAbove = 'أ' // أ
  private final val WawHamza = 'ؤ' // ؤ
  private final val AlefHamzaBelow = 'إ' // إ
  private final val YehHamza = 'ئ' // ئ
  private final val Alef = 'ا' // ا
  private final val TehMarbuta = 'ة' // ة
  private final val Waw = 'و' // و
  private final val AlefMaqsura = 'ى' // ى
  private final val Yeh = 'ي' // ي

  def stemArabic(input: String): String = {
    var w = input
    var isNoun = true
    var isVerb = true
    var isDefined = false

    // ---- Checks1 (runs on the un-normalized string): a definite-article
    // prefix marks the word as a defined noun; no deletion here.
    locally {
      if ((w.startsWith("بال") || // بال
           w.startsWith("كال"))   // كال
          && w.length > 4) {
        isNoun = true; isVerb = false; isDefined = true
      } else if ((w.startsWith("ال") || // ال
                  w.startsWith("لل"))   // لل
                 && w.length > 3) {
        isNoun = true; isVerb = false; isDefined = true
      }
    }

    // ---- Normalize_pre: strip vocalization + kasheeda, fold Arabic-Indic
    // digits to ASCII, decompose lam-alef ligatures.
    locally {
      val sb = new StringBuilder(w.length)
      var i = 0
      while (i < w.length) {
        val c = w.charAt(i)
        c match {
          case 'ً' | 'ٌ' | 'ٍ' | 'َ' | 'ُ' |
               'ِ' | 'ّ' | 'ْ' | 'ـ' => () // delete
          case d if d >= '٠' && d <= '٩' =>
            sb.append(('0' + (d - '٠')).toChar)
          case 'ﻻ' => sb.append(Alef4Lig); sb.append(Alef)
          case 'ﻷ' => sb.append(Alef4Lig); sb.append(AlefHamzaAbove)
          case 'ﻹ' => sb.append(Alef4Lig); sb.append(AlefHamzaBelow)
          case 'ﻵ' => sb.append(Alef4Lig); sb.append(AlefMadda)
          case other => sb.append(other)
        }
        i += 1
      }
      w = sb.toString
    }

    // longest-match suffix among: entries (suffix, minLen, replacement);
    // cond = current length >= minLen (inclusive bound precomputed).
    def amongSuffix(entries: Seq[(String, Int, String)]): Option[Boolean] = {
      val m = entries.filter(e => w.endsWith(e._1))
      if (m.isEmpty) return None
      val e = m.maxBy(_._1.length)
      if (w.length >= e._2) {
        w = w.substring(0, w.length - e._1.length) + e._3
        Some(true)
      } else Some(false)
    }
    def suffixStep(entries: (String, Int, String)*): Boolean =
      amongSuffix(entries).contains(true)

    // Prefix-phase cursor: Snowball runs the prefix routines forward from
    // wherever the previous routine left the cursor (after a `<-`
    // replacement), so e.g. أأبمؽ → Step1 rewrites أأ→أ and Step3b then
    // strips the ب AFTER it (probed). Deletions leave the cursor in place;
    // replacements advance it past the replacement text.
    var cur = 0
    def amongPrefix(entries: Seq[(String, Int, String)]): Boolean = {
      val m = entries.filter(e => w.startsWith(e._1, cur))
      if (m.isEmpty) return false
      val e = m.maxBy(_._1.length)
      if (w.length >= e._2) {
        w = w.substring(0, cur) + e._3 + w.substring(cur + e._1.length)
        cur += e._3.length
        true
      } else false
    }

    // ---- Suffix steps (backwards mode). len conditions are evaluated on
    // the current string BEFORE deletion.
    def suffixNounStep1a(): Boolean = suffixStep(
      ("ي", 4, ""), ("ك", 4, ""), ("ه", 4, ""), // ي ك ه
      ("نا", 5, ""), ("كم", 5, ""), // نا كم
      ("ها", 5, ""), ("هن", 5, ""), // ها هن
      ("هم", 5, ""), // هم
      ("كما", 6, ""), ("هما", 6, "")) // كما هما
    def suffixNounStep1b(): Boolean = suffixStep(("ن", 6, "")) // ن
    def suffixNounStep2a(): Boolean = suffixStep(
      ("ا", 5, ""), ("ي", 5, ""), ("و", 5, "")) // ا ي و
    def suffixNounStep2b(): Boolean =
      suffixStep(("ات", 5, "")) // ات
    def suffixNounStep2c1(): Boolean = suffixStep(("ت", 4, "")) // ت
    def suffixNounStep2c2(): Boolean =
      suffixStep((TehMarbuta.toString, 4, "")) // ة
    def suffixNounStep3(): Boolean = suffixStep(("ي", 3, "")) // ي

    def suffixVerbStep1(): Boolean = suffixStep(
      ("ه", 4, ""), ("ك", 4, ""), // ه ك
      ("ني", 5, ""), ("نا", 5, ""), // ني نا
      ("ها", 5, ""), ("هم", 5, ""), // ها هم
      ("هن", 5, ""), ("كم", 5, ""), // هن كم
      ("كن", 5, ""), // كن
      ("هما", 6, ""), ("كما", 6, ""), // هما كما
      ("كمو", 6, "")) // كمو
    def suffixVerbStep2a(): Boolean = suffixStep(
      ("ت", 4, ""), ("ا", 4, ""), // ت ا
      ("ن", 4, ""), ("ي", 4, ""), // ن ي
      ("نا", 5, ""), ("تا", 5, ""), // نا تا
      ("تن", 5, ""), // تن
      ("ان", 6, ""), ("ون", 6, ""), // ان ون
      ("ين", 6, ""), // ين
      ("تما", 6, "")) // تما
    def suffixVerbStep2b(): Boolean = suffixStep(
      ("وا", 5, ""), ("تم", 5, "")) // وا تم
    def suffixVerbStep2c(): Boolean = suffixStep(
      ("و", 4, ""), ("تمو", 6, "")) // و تمو
    def suffixAlefMaqsura(): Boolean =
      suffixStep((AlefMaqsura.toString, 0, Yeh.toString)) // ى → ي

    locally {
      val _ =
        (isVerb && {
          // Suffix_Verb_Step1 applies repeatedly (object pronouns can stack,
          // e.g. استفهمكمو strips كمو then retries)
          def verbStep1Repeated(): Boolean = {
            var n = 0
            while (suffixVerbStep1()) n += 1
            n > 0
          }
          (verbStep1Repeated() && { suffixVerbStep2a() || suffixVerbStep2c(); true }) ||
            suffixVerbStep2b() ||
            suffixVerbStep2a()
        }) ||
        (isNoun && {
          locally { // try(...)
            val _ = suffixNounStep2c2() ||
              (!isDefined && suffixNounStep1a() && {
                suffixNounStep2a() || suffixNounStep2b() || suffixNounStep2c1(); true
              }) ||
              (suffixNounStep1b() &&
                (suffixNounStep2a() || suffixNounStep2b() || suffixNounStep2c1())) ||
              (!isDefined && suffixNounStep2a()) ||
              suffixNounStep2b()
          }
          suffixNounStep3()
        }) ||
        suffixAlefMaqsura()
    }

    // ---- Prefix steps.
    def prefixStep1(): Boolean = amongPrefix(Seq(
      (s"$AlefHamzaAbove$AlefHamzaAbove", 4, AlefHamzaAbove.toString),
      (s"$AlefHamzaAbove$AlefMadda", 4, AlefMadda.toString),
      (s"$AlefHamzaAbove$WawHamza", 4, AlefHamzaAbove.toString),
      (s"$AlefHamzaAbove$Alef", 4, Alef.toString),
      (s"$AlefHamzaAbove$AlefHamzaBelow", 4, AlefHamzaBelow.toString)))
    def prefixStep2(): Boolean = {
      // guard: never strip from words beginning فا / وا
      if (w.startsWith("فا", cur) || w.startsWith("وا", cur)) false
      else amongPrefix(Seq(("ف", 4, ""), ("و", 4, ""))) // ف و
    }
    def prefixStep3aNoun(): Boolean = amongPrefix(Seq(
      ("بال", 6, ""), ("كال", 6, ""), // بال كال
      ("ال", 5, ""), ("لل", 5, ""))) // ال لل
    def prefixStep3bNoun(): Boolean = {
      // guard: never strip from words beginning با
      if (w.startsWith("با", cur)) false
      else amongPrefix(Seq(
        ("ب", 4, ""), // ب
        ("بب", 4, "ب"), // بب → ب
        ("كك", 4, "ك"))) // كك → ك
    }
    def prefixStep3Verb(): Boolean = amongPrefix(Seq(
      ("سي", 5, "ي"), ("ست", 5, "ت"), // سي ست
      ("سن", 5, "ن"), // سن
      (s"س$AlefHamzaAbove", 5, AlefHamzaAbove.toString))) // سأ
    def prefixStep4Verb(): Boolean = {
      val r = amongPrefix(Seq(
        ("يست", 5, "است"), // يست → است
        ("نست", 5, "است"), // نست → است
        ("تست", 5, "است"))) // تست → است
      if (r) { isVerb = true; isNoun = false }
      r
    }

    locally {
      prefixStep1() // try
      prefixStep2() // try
      val _ = prefixStep3aNoun() ||
        (isNoun && prefixStep3bNoun()) ||
        (isVerb && { prefixStep3Verb(); prefixStep4Verb() })
    }

    // ---- Normalize_post: the last hamza-carrier becomes a bare hamza;
    // remaining carriers fold to their seat letter.
    if (w.nonEmpty) {
      val last = w.charAt(w.length - 1)
      if (last == AlefMadda || last == AlefHamzaAbove ||
          last == AlefHamzaBelow || last == WawHamza || last == YehHamza)
        w = w.substring(0, w.length - 1) + Hamza
    }
    locally {
      val sb = new StringBuilder(w.length)
      var i = 0
      while (i < w.length) {
        w.charAt(i) match {
          case AlefMadda | AlefHamzaAbove | AlefHamzaBelow => sb.append(Alef)
          case WawHamza => sb.append(Waw)
          case YehHamza => sb.append(Yeh)
          case other => sb.append(other)
        }
        i += 1
      }
      w = sb.toString
    }
    // An all-diacritic input normalizes to nothing; the published
    // implementation (as shipped, dict_snowball) yields the original word
    // rather than an empty lexeme — replicate that (also keeps the
    // analyzer chain free of empty terms).
    if (w.isEmpty) input else w
  }

  private final val Alef4Lig = 'ل' // ل, the lam of a decomposed ligature
}
