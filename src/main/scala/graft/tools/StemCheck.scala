package graft.tools

import graft.analysis.{Stemmer, Stemmers, StemmersRomance, StemmersUralic, StemmersEastern, StemmersArabic, StemmersTamil}
import scala.io.Source

/** Diff our Snowball implementations against golden vectors harvested from
  * the published Snowball implementations (tools/gen_stem_vectors.py).
  * Usage: runMain graft.tools.StemCheck /tmp/stemvec [lang ...]
  */
object StemCheck {
  val fns: Map[String, String => String] = Map(
    "english" -> Stemmer.stemEnglish,
    "german" -> Stemmers.stemGerman,
    "swedish" -> Stemmers.stemSwedish,
    "norwegian" -> Stemmers.stemNorwegian,
    "danish" -> Stemmers.stemDanish,
    "dutch" -> Stemmers.stemDutch,
    "russian" -> Stemmers.stemRussian,
    "french" -> StemmersRomance.stemFrench,
    "spanish" -> StemmersRomance.stemSpanish,
    "italian" -> StemmersRomance.stemItalian,
    "portuguese" -> StemmersRomance.stemPortuguese,
    "finnish" -> StemmersUralic.stemFinnish,
    "hungarian" -> StemmersUralic.stemHungarian,
    "romanian" -> StemmersEastern.stemRomanian,
    "turkish" -> StemmersEastern.stemTurkish,
    "greek" -> StemmersEastern.stemGreek,
    "arabic" -> StemmersArabic.stemArabic,
    "tamil" -> StemmersTamil.stemTamil
  )

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val langs = if (args.length > 1) args.drop(1).toSeq else fns.keys.toSeq.sorted
    var anyFail = false
    val report = new java.io.PrintWriter(
      new java.io.OutputStreamWriter(
        new java.io.FileOutputStream("/tmp/stemdiff.txt"), "UTF-8"))
    // a vector file may be named <lang>_<variant>.tsv
    for (lang <- langs; fn <- fns.get(lang.split('_')(0))) {
      val src = Source.fromFile(s"$dir/$lang.tsv", "UTF-8")
      val pairs = try src.getLines().toVector.map { l =>
        val t = l.split('\t'); (t(0), if (t.length > 1) t(1) else "")
      } finally src.close()
      val bad = pairs.flatMap { case (w, want) =>
        val got = fn(w)
        if (got != want) Some((w, want, got)) else None
      }
      println(f"$lang%-12s ${pairs.size - bad.size}%5d/${pairs.size}%-5d ok")
      bad.foreach { case (w, want, got) =>
        report.println(s"$lang\t$w\twant=$want\tgot=$got")
      }
      if (bad.nonEmpty) anyFail = true
    }
    report.close()
    if (anyFail) sys.exit(1)
  }
}
