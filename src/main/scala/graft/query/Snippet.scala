package graft.query

import graft.analysis.Analysis

/** Snippet generation (`src/snippet/mod.rs`): given a query and a stored
  * text, pick the best `max_num_chars`-bounded fragment containing query
  * terms and render it with the matches highlighted.
  *
  * `fragment` is the selected slice of the original text; `highlighted`
  * holds (from, to) char ranges RELATIVE to the fragment.
  */
final case class Snippet(
    fragment: String,
    highlighted: Seq[(Int, Int)],
    prefix: String = "<b>",
    postfix: String = "</b>") {

  def isEmpty: Boolean = highlighted.isEmpty

  /** Lucene-style highlighted HTML (`mod.rs:150-165`): escaped text with
    * each collapsed highlight range wrapped in prefix/postfix.
    */
  def toHtml: String = {
    val sb = new StringBuilder
    var from = 0
    Snippet.collapseOverlappedRanges(highlighted).foreach { case (s, e) =>
      sb.append(Snippet.escape(fragment.substring(from, s)))
      sb.append(prefix).append(Snippet.escape(fragment.substring(s, e))).append(postfix)
      from = e
    }
    sb.append(Snippet.escape(fragment.substring(from)))
    sb.toString
  }
}

object Snippet {
  val empty: Snippet = Snippet("", Nil)

  /** htmlescape `encode_minimal` equivalence. */
  private[query] def escape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case '\'' => sb.append("&#x27;")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** `mod.rs:318-322` + `merge_overlapping_ranges`: sort, dedup, then merge
    * only TRUE overlaps (`last.end > range.start`); adjacent ranges stay
    * separate.
    */
  def collapseOverlappedRanges(ranges: Seq[(Int, Int)]): Seq[(Int, Int)] = {
    val sorted = ranges.distinct.sorted
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    sorted.foreach { r =>
      out.lastOption match {
        case Some(last) if last._2 > r._1 =>
          out(out.length - 1) = (last._1, math.max(last._2, r._2))
        case _ => out += r
      }
    }
    out.toSeq
  }
}

/** `SnippetGenerator` (`mod.rs:377-470`): term weights are `1 / (1 + df)`
  * from the searcher, fragments scored by summed weights of contained
  * terms, best fragment wins (ties: earliest).
  */
final class SnippetGenerator(
    val termsText: Map[String, Float],
    tokenizerChain: String,
    var maxNumChars: Int = 150) extends Serializable {

  private final class Frag(val startOffset: Int) {
    var score = 0.0f
    var stopOffset = startOffset
    val highlighted = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
  }

  /** `search_fragments` (`mod.rs:205-231`): cut a new fragment whenever the
    * next token would overflow `maxNumChars` from the fragment start; keep
    * only fragments that contain at least one query term.
    */
  private def searchFragments(text: String): Seq[Frag] = {
    val frags = scala.collection.mutable.ArrayBuffer.empty[Frag]
    var frag = new Frag(0)
    Analysis.analyzeChain(tokenizerChain, text).foreach { tok =>
      if (tok.offsetTo - frag.startOffset > maxNumChars) {
        if (frag.score > 0.0f) frags += frag
        frag = new Frag(tok.offsetFrom)
      }
      // try_add_token (mod.rs:102-110)
      frag.stopOffset = tok.offsetTo
      termsText.get(tok.text.toLowerCase).foreach { w =>
        frag.score += w
        frag.highlighted += ((tok.offsetFrom, tok.offsetTo))
      }
    }
    if (frag.score > 0.0f) frags += frag
    frags.toSeq
  }

  /** `select_best_fragment_combination` (`mod.rs:234-263`): max score,
    * ties broken by the earliest (start, stop).
    */
  def snippet(text: String): Snippet = {
    val frags = searchFragments(text)
    if (frags.isEmpty) Snippet.empty
    else {
      import scala.math.Ordering.Implicits._
      val best = frags.reduceLeft { (b, c) =>
        if (c.score > b.score ||
            (c.score == b.score &&
              Ordering[(Int, Int)].lt((c.startOffset, c.stopOffset),
                (b.startOffset, b.stopOffset)))) c
        else b
      }
      Snippet(text.substring(best.startOffset, best.stopOffset),
        best.highlighted.map { case (s, e) => (s - best.startOffset, e - best.startOffset) }.toSeq)
    }
  }
}

object SnippetGenerator {

  /** `SnippetGenerator::create` (`mod.rs:400-433`): collect the query's
    * terms for `fld`, weight each by `1 / (1 + doc_freq)`, and tokenize
    * snippets with the field's analyzer chain.
    */
  def create(sr: Searcher, q: Query, fld: String = "content",
             chain: String = "simple", maxNumChars: Int = 150): SnippetGenerator = {
    val terms = queryTerms(q, fld, sr.field).distinct.sorted
    val dfs = if (terms.isEmpty) Map.empty[String, Long] else sr.docFreqs(terms, fld)
    val weighted = terms.flatMap { t =>
      dfs.get(t).filter(_ > 0).map(df => t -> (1.0f / (1.0f + df.toFloat)))
    }.toMap
    new SnippetGenerator(weighted, chain, maxNumChars)
  }

  /** `Query::query_terms` analog: every term the query matches against the
    * requested field (FieldQ rescopes; phrase/set/prefix terms included).
    */
  private[query] def queryTerms(q: Query, want: String, cur: String): Seq[String] = q match {
    case TermQ(t) => if (cur == want) Seq(t) else Nil
    case TermSetQ(ts) => if (cur == want) ts.toSeq else Nil
    case PhraseQ(ts, _) => if (cur == want) ts.map(_._2) else Nil
    case PhrasePrefixQ(ts, p, _) => if (cur == want) ts.map(_._2) :+ p._2 else Nil
    case FieldQ(f, inner) => queryTerms(inner, want, f)
    case BoolQ(cs, _) => cs.flatMap(c => queryTerms(c._2, want, cur))
    case BoostQ(inner, _) => queryTerms(inner, want, cur)
    case ConstScoreQ(inner, _) => queryTerms(inner, want, cur)
    case DisMaxQ(qs, _) => qs.flatMap(queryTerms(_, want, cur))
    case _ => Nil
  }
}
